"""Static scene/articulation model for the TPU-native SeqDex simulator.

This is the TPU-first replacement for IsaacGym's asset + actor machinery
(reference: `gym.load_asset` / `create_actor` usage in
`tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py:523+`).

Everything here is **host-side, static** (plain Python / numpy). The specs are
compiled once into flat numpy tables; the simulator factory closes over them so
they become XLA constants. Nothing in this module is traced.

Design notes (TPU-first):
* Collision geometry is canonicalised into two primitive roles:
    - **contact points**: sample points (with optional radius) attached to a
      body — box corners, stud tips, fingertip spheres.
    - **colliders**: signed-distance providers — boxes, planes, spheres.
  Contact generation is then a dense (points × colliders) SDF evaluation with
  a static mask: fixed shapes, no data-dependent control flow, fully
  vectorisable. This replaces PhysX narrowphase + the 8M-contact-pair GPU
  buffer (`utils/config.py:204`) with a statically bounded formulation.
* Fixed joints are kept as zero-dof links (IsaacGym instead collapses them,
  `asset_options.collapse_fixed_joints`); the dynamics recursions handle them
  naturally and named frames ("sites": palm, fingertips, camera) stay
  addressable for observations.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

# Geometry / joint enums (static ints)
GEOM_BOX = 0
GEOM_SPHERE = 1
GEOM_PLANE = 2

JOINT_FIXED = 0
JOINT_REVOLUTE = 1
JOINT_PRISMATIC = 2


def rpy_to_quat_np(rpy) -> np.ndarray:
    """URDF rpy -> quaternion xyzw (numpy, host-side)."""
    r, p, y = rpy
    cr, sr = np.cos(r * 0.5), np.sin(r * 0.5)
    cp, sp = np.cos(p * 0.5), np.sin(p * 0.5)
    cy, sy = np.cos(y * 0.5), np.sin(y * 0.5)
    return np.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        dtype=np.float64,
    )


def quat_mul_np(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ]
    )


def quat_apply_np(q, v):
    u, w = np.asarray(q[:3]), q[3]
    uv = np.cross(u, v)
    return np.asarray(v) + 2.0 * (w * uv + np.cross(u, uv))


@dataclass
class GeomSpec:
    """One collision primitive attached to a link or body frame."""

    gtype: int  # GEOM_BOX | GEOM_SPHERE | GEOM_PLANE
    size: Sequence[float]  # box: half extents (3,); sphere: (r,0,0); plane: unused
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    rpy: Sequence[float] = (0.0, 0.0, 0.0)
    friction: float = 1.0
    # roles: a geom can emit contact points, act as a collider, or both
    emit_points: bool = True
    is_collider: bool = True
    # point sampling detail for boxes: 0 = corners only, 1 = +edge midpoints,
    # 2 = +face centers
    point_detail: int = 0
    # collision group: pairs are skipped when both geoms share a group >= 0
    group: int = -1


@dataclass
class JointSpec:
    jtype: int = JOINT_FIXED
    axis: Sequence[float] = (0.0, 0.0, 1.0)
    lower: float = 0.0
    upper: float = 0.0
    effort: float = 0.0
    max_velocity: float = 1e9
    damping: float = 0.0  # passive joint damping
    armature: float = 0.0


@dataclass
class LinkSpec:
    name: str
    parent: Optional[str]  # None for root
    joint: JointSpec = field(default_factory=JointSpec)
    # joint-frame origin in parent link frame
    origin_pos: Sequence[float] = (0.0, 0.0, 0.0)
    origin_rpy: Sequence[float] = (0.0, 0.0, 0.0)
    mass: float = 0.0
    com: Sequence[float] = (0.0, 0.0, 0.0)
    # inertia about com, link frame: [ixx, iyy, izz, ixy, ixz, iyz]
    inertia: Sequence[float] = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    geoms: Sequence[GeomSpec] = ()


@dataclass
class ArticulationSpec:
    """Kinematic tree with a fixed base (the only articulation kind SeqDex
    needs — the Franka+Allegro is fixed to the world,
    `asset_options.fix_base_link = True` in `..._grasp_sim.py:543`)."""

    name: str
    links: Sequence[LinkSpec]
    # world pose of the root link
    base_pos: Sequence[float] = (0.0, 0.0, 0.0)
    base_rpy: Sequence[float] = (0.0, 0.0, 0.0)

    def link_names(self):
        return [l.name for l in self.links]


@dataclass
class BodySpec:
    """A free 6-dof rigid body (LEGO brick, goal marker, tool...)."""

    name: str
    mass: float
    # inertia about com in body frame [ixx, iyy, izz, ixy, ixz, iyz]
    inertia: Sequence[float]
    com: Sequence[float] = (0.0, 0.0, 0.0)
    geoms: Sequence[GeomSpec] = ()
    # kinematic bodies follow their state but receive no forces (goal markers,
    # disabled-gravity fixed objects)
    kinematic: bool = False


@dataclass
class StaticGeomSpec:
    """World-fixed collision geometry (ground plane, table, bin walls)."""

    name: str
    geom: GeomSpec
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    rpy: Sequence[float] = (0.0, 0.0, 0.0)


# ---------------------------------------------------------------------------
# Compiled articulation (flat numpy tables)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Articulation:
    """Topologically sorted flat arrays describing one kinematic tree."""

    name: str
    link_names: tuple
    nlinks: int
    ndof: int
    parent: np.ndarray  # (L,) int, -1 for root
    joint_type: np.ndarray  # (L,) int
    origin_pos: np.ndarray  # (L, 3) joint origin in parent frame
    origin_quat: np.ndarray  # (L, 4)
    axis: np.ndarray  # (L, 3)
    dof_index: np.ndarray  # (L,) int, -1 if fixed
    dof_link: np.ndarray  # (D,) link index of each dof
    # ancestor mask: anc[l, d] = 1 if dof d is on the path root->link l
    ancestor_mask: np.ndarray  # (L, D) float
    mass: np.ndarray  # (L,)
    com: np.ndarray  # (L, 3)
    inertia: np.ndarray  # (L, 3, 3) about com, link frame
    lower: np.ndarray  # (D,)
    upper: np.ndarray  # (D,)
    effort: np.ndarray  # (D,)
    max_velocity: np.ndarray  # (D,)
    joint_damping: np.ndarray  # (D,)
    armature: np.ndarray  # (D,)
    base_pos: np.ndarray  # (3,)
    base_quat: np.ndarray  # (4,)

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)


def _inertia_matrix(i6) -> np.ndarray:
    ixx, iyy, izz, ixy, ixz, iyz = i6
    return np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])


def compile_articulation(spec: ArticulationSpec) -> Articulation:
    name_to_idx = {}
    # topological order: repeatedly take links whose parent is placed
    remaining = list(spec.links)
    ordered: list[LinkSpec] = []
    placed = set()
    guard = 0
    while remaining:
        guard += 1
        if guard > 10000:
            raise ValueError(f"articulation '{spec.name}' has a cycle or orphan links")
        for l in list(remaining):
            if l.parent is None or l.parent in placed:
                ordered.append(l)
                placed.add(l.name)
                remaining.remove(l)
    L = len(ordered)
    for i, l in enumerate(ordered):
        name_to_idx[l.name] = i

    parent = np.full(L, -1, dtype=np.int32)
    joint_type = np.zeros(L, dtype=np.int32)
    origin_pos = np.zeros((L, 3))
    origin_quat = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (L, 1))
    axis = np.zeros((L, 3))
    dof_index = np.full(L, -1, dtype=np.int32)
    mass = np.zeros(L)
    com = np.zeros((L, 3))
    inertia = np.zeros((L, 3, 3))

    dof_link = []
    lower, upper, effort, max_vel, jdamp, arma = [], [], [], [], [], []

    for i, l in enumerate(ordered):
        if l.parent is not None:
            parent[i] = name_to_idx[l.parent]
        joint_type[i] = l.joint.jtype
        origin_pos[i] = l.origin_pos
        origin_quat[i] = rpy_to_quat_np(l.origin_rpy)
        ax = np.asarray(l.joint.axis, dtype=np.float64)
        n = np.linalg.norm(ax)
        axis[i] = ax / n if n > 0 else ax
        mass[i] = l.mass
        com[i] = l.com
        inertia[i] = _inertia_matrix(l.inertia)
        if l.joint.jtype != JOINT_FIXED:
            dof_index[i] = len(dof_link)
            dof_link.append(i)
            lower.append(l.joint.lower)
            upper.append(l.joint.upper)
            effort.append(l.joint.effort)
            max_vel.append(l.joint.max_velocity)
            jdamp.append(l.joint.damping)
            arma.append(l.joint.armature)

    D = len(dof_link)
    anc = np.zeros((L, D), dtype=np.float64)
    for i in range(L):
        j = i
        while j >= 0:
            if dof_index[j] >= 0:
                anc[i, dof_index[j]] = 1.0
            j = parent[j]

    return Articulation(
        name=spec.name,
        link_names=tuple(l.name for l in ordered),
        nlinks=L,
        ndof=D,
        parent=parent,
        joint_type=joint_type,
        origin_pos=origin_pos,
        origin_quat=origin_quat,
        axis=axis,
        dof_index=dof_index,
        dof_link=np.array(dof_link, dtype=np.int32),
        ancestor_mask=anc,
        mass=mass,
        com=com,
        inertia=inertia,
        lower=np.array(lower),
        upper=np.array(upper),
        effort=np.array(effort),
        max_velocity=np.array(max_vel),
        joint_damping=np.array(jdamp),
        armature=np.array(arma),
        base_pos=np.asarray(spec.base_pos, dtype=np.float64),
        base_quat=rpy_to_quat_np(spec.base_rpy),
    )


# Convenience: geoms of the compiled articulation in link order
def articulation_geoms(spec: ArticulationSpec, art: Articulation):
    by_name = {l.name: l for l in spec.links}
    out = []
    for li, lname in enumerate(art.link_names):
        for g in by_name[lname].geoms:
            out.append((li, g))
    return out
