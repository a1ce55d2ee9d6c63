"""LDraw (.ldr) model import — the asset-conversion path.

Analog of the reference's LDraw-to-URDF converters
(`assets/urdf/blender/ldr2urdf.py`, `assets/urdf/blender/leoCAD/ldr2urdf.py`):
those walk LeoCAD-exported models and emit one URDF per part. Here the
converter targets the framework's own asset pipeline instead of mesh URDFs:
a `.ldr` file parses into `LdrPart` placements which map onto the procedural
LEGO `BodySpec` builders (`core/builders.py:lego_brick`), so a LeoCAD model
drops straight into a compiled scene. `to_urdf` still emits URDF text for
interchange parity.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

# 1 LDU = 0.4 mm; LDraw is y-down, we are z-up
LDU_TO_M = 0.0004
_LDR_TO_ZUP = np.array(
    [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], dtype=np.float64
)

# LDraw part number -> framework brick kind (`builders.lego_brick` kinds,
# reference types at `..._search.py:610`)
PART_TO_KIND = {
    "3005": "1x1",
    "3004": "1x2",
    "3622": "1x3",
    "3010": "1x4",
    "3003": "2x2",
    "6091": "1x2_curve",
    "6191": "1x3_curve",
    "3063": "1x3_curve_soft",
    "6093": "2x2_curve_soft",
}


@dataclasses.dataclass
class LdrPart:
    part: str  # LDraw part id (file stem)
    color: int
    pos: np.ndarray  # (3,) meters, z-up
    rot: np.ndarray  # (3, 3) z-up

    @property
    def kind(self) -> Optional[str]:
        return PART_TO_KIND.get(self.part)


def parse_ldr(text: str) -> List[LdrPart]:
    """Parse LDraw type-1 (sub-file reference) lines:
    `1 <color> x y z a b c d e f g h i <part>.dat`."""
    parts = []
    for raw in text.splitlines():
        tok = raw.split()
        if len(tok) < 15 or tok[0] != "1":
            continue
        color = int(tok[1])
        vals = np.array([float(v) for v in tok[2:14]], dtype=np.float64)
        xyz = vals[:3] * LDU_TO_M
        R = vals[3:].reshape(3, 3)
        name = tok[14]
        for suffix in (".dat", ".DAT", ".ldr"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        parts.append(
            LdrPart(
                part=name,
                color=color,
                pos=_LDR_TO_ZUP @ xyz,
                rot=_LDR_TO_ZUP @ R @ _LDR_TO_ZUP.T,
            )
        )
    return parts


def load_ldr(path: str) -> List[LdrPart]:
    with open(path) as f:
        return parse_ldr(f.read())


def to_body_specs(parts: List[LdrPart], with_studs: bool = True):
    """Map parsed placements to `(BodySpec, pos, quat_xyzw)` triples via the
    procedural brick builders; unknown part ids are skipped (the reference
    converter likewise only handles its exported part set)."""
    from . import builders
    from .math import matrix_to_quat

    out = []
    for i, p in enumerate(parts):
        if p.kind is None:
            continue
        spec = builders.lego_brick(p.kind, with_studs=with_studs,
                                   name=f"ldr_{i}_{p.kind}")
        quat = np.asarray(matrix_to_quat(p.rot.astype(np.float32)))
        out.append((spec, p.pos.astype(np.float32), quat.astype(np.float32)))
    return out


def _part_urdf(spec, kind: str, pos, rpy, name: str) -> str:
    """One standalone single-link URDF for one part (the reference converter
    emits one URDF file per part, `assets/urdf/blender/ldr2urdf.py`). The
    part pose is applied to inertial, visual AND collision origins so
    standard parsers (pybullet, urdfpy) place the whole body."""
    half = spec.geoms[0].size
    origin = (
        f'<origin xyz="{pos[0]:.6f} {pos[1]:.6f} {pos[2]:.6f}" '
        f'rpy="{rpy[0]:.6f} {rpy[1]:.6f} {rpy[2]:.6f}"/>'
    )
    box = (f'<geometry><box size="{2*half[0]:.6f} {2*half[1]:.6f} '
           f'{2*half[2]:.6f}"/></geometry>')
    return "\n".join([
        '<?xml version="1.0" ?>',
        f'<robot name="{name}">',
        f'  <link name="{name}">',
        "    <inertial>",
        f"      {origin}",
        f'      <mass value="{spec.mass:.6f}"/>',
        '      <inertia ixx="1e-6" iyy="1e-6" izz="1e-6" ixy="0" ixz="0" iyz="0"/>',
        "    </inertial>",
        f"    <visual>\n      {origin}\n      {box}\n    </visual>",
        f"    <collision>\n      {origin}\n      {box}\n    </collision>",
        "  </link>",
        "</robot>",
    ])


def to_urdf(parts: List[LdrPart], name: str = "ldr_model") -> List[str]:
    """Emit one single-root URDF string PER PART (box collision from the
    brick footprint) — matching the reference converter, which writes one
    URDF file per placed part (`assets/urdf/blender/ldr2urdf.py`). URDF
    requires a single-root kinematic tree, so a multi-part model is a list
    of independent documents, not one multi-link file."""
    from . import builders

    docs = []
    for i, p in enumerate(parts):
        kind = p.kind
        if kind is None:
            continue
        spec = builders.lego_brick(kind, with_studs=False, name=f"part_{i}")
        rpy = _matrix_to_rpy(p.rot)
        docs.append(_part_urdf(spec, kind, p.pos, rpy, f"{name}_part_{i}_{kind}"))
    return docs


def _matrix_to_rpy(R: np.ndarray):
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-6:
        return (
            float(np.arctan2(R[2, 1], R[2, 2])),
            float(np.arctan2(-R[2, 0], sy)),
            float(np.arctan2(R[1, 0], R[0, 0])),
        )
    return (
        float(np.arctan2(-R[1, 2], R[1, 1])),
        float(np.arctan2(-R[2, 0], sy)),
        0.0,
    )
