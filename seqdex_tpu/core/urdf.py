"""URDF / MJCF asset loading -> ArticulationSpec / BodySpec.

TPU-native replacement for `gym.load_asset`
(`tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py:558`,
`..._search.py:465`): parses robot/object description files into the static
spec dataclasses the scene compiler consumes. Mesh collision geometry is
approximated by its bounding box (the simulator's collision primitives are
boxes/spheres/planes — mirroring how the reference's LEGO URDFs are plain
mesh boxes, `assets/urdf/blender/urdf/1x2.urdf`), with an optional
user-supplied override table for finer primitive decompositions.

Supports:
  * URDF: links (inertial, box/sphere/cylinder/mesh collision), revolute /
    continuous / prismatic / fixed joints, limits, damping, density-only
    inertials (computed from collision volume like IsaacGym does).
  * MJCF (minimal): worldbody box/sphere geoms of simple object files.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, Optional, Sequence

import numpy as np

from .model import (
    GEOM_BOX,
    GEOM_SPHERE,
    JOINT_FIXED,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ArticulationSpec,
    BodySpec,
    GeomSpec,
    JointSpec,
    LinkSpec,
)

_JTYPES = {
    "revolute": JOINT_REVOLUTE,
    "continuous": JOINT_REVOLUTE,
    "prismatic": JOINT_PRISMATIC,
    "fixed": JOINT_FIXED,
}


def _f3(s, default="0 0 0"):
    return tuple(float(x) for x in (s if s else default).split())


def _mesh_bounds(path: str):
    """Bounding half-extents + center of an STL/OBJ mesh (binary STL, ascii
    STL, or OBJ vertices)."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    import struct

    verts = None
    if path.lower().endswith(".stl") and len(data) > 84:
        n = struct.unpack("<I", data[80:84])[0]
        if 84 + n * 50 == len(data):
            arr = np.frombuffer(data[84:84 + n * 50], dtype=np.uint8).reshape(n, 50)
            verts = arr[:, 12:48].copy().view("<f4").reshape(-1, 3)
    if verts is None:
        import re

        found = re.findall(
            rb"(?:vertex|v)\s+([-\d.eE+]+)\s+([-\d.eE+]+)\s+([-\d.eE+]+)", data
        )
        if found:
            verts = np.array(found, dtype=float)
    if verts is None or len(verts) == 0:
        return None
    lo, hi = verts.min(0), verts.max(0)
    return (hi - lo) / 2, (hi + lo) / 2


def _parse_geom(geom_el, origin_el, friction: float, mesh_root: str,
                scale_default=1.0) -> Optional[GeomSpec]:
    xyz = _f3(origin_el.get("xyz") if origin_el is not None else None)
    rpy = _f3(origin_el.get("rpy") if origin_el is not None else None)
    box = geom_el.find("box")
    sph = geom_el.find("sphere")
    cyl = geom_el.find("cylinder")
    mesh = geom_el.find("mesh")
    if box is not None:
        size = _f3(box.get("size"))
        return GeomSpec(GEOM_BOX, tuple(s / 2 for s in size), pos=xyz, rpy=rpy,
                        friction=friction)
    if sph is not None:
        return GeomSpec(GEOM_SPHERE, (float(sph.get("radius")), 0, 0), pos=xyz,
                        rpy=rpy, friction=friction)
    if cyl is not None:
        # cylinder -> box proxy (len along z)
        r = float(cyl.get("radius"))
        l = float(cyl.get("length"))
        return GeomSpec(GEOM_BOX, (r, r, l / 2), pos=xyz, rpy=rpy, friction=friction)
    if mesh is not None:
        fname = mesh.get("filename", "")
        scale = _f3(mesh.get("scale"), "1 1 1")
        mpath = os.path.normpath(os.path.join(mesh_root, fname))
        bounds = _mesh_bounds(mpath)
        if bounds is None:
            return None
        half, center = bounds
        half = half * np.asarray(scale)
        center = center * np.asarray(scale)
        pos = tuple(np.asarray(xyz) + center)
        return GeomSpec(GEOM_BOX, tuple(half), pos=pos, rpy=rpy, friction=friction)
    return None


def load_urdf(
    path: str,
    fix_base: bool = True,
    friction: float = 1.0,
    default_density: float = 1000.0,
    geom_overrides: Optional[Dict[str, Sequence[GeomSpec]]] = None,
):
    """Parse a URDF into an ArticulationSpec (articulated, fix_base) or a
    BodySpec (single-link free body, fix_base=False)."""
    tree = ET.parse(path)
    root = tree.getroot()
    mesh_root = os.path.dirname(os.path.abspath(path))
    overrides = geom_overrides or {}

    links = {}
    for link_el in root.findall("link"):
        name = link_el.get("name")
        geoms = []
        if name in overrides:
            geoms = list(overrides[name])
        else:
            for col in link_el.findall("collision"):
                g = _parse_geom(col.find("geometry"), col.find("origin"),
                                friction, mesh_root)
                if g is not None:
                    geoms.append(g)
        inertial = link_el.find("inertial")
        mass, com, i6 = 0.0, (0, 0, 0), (0, 0, 0, 0, 0, 0)
        if inertial is not None:
            origin = inertial.find("origin")
            com = _f3(origin.get("xyz") if origin is not None else None)
            mass_el = inertial.find("mass")
            inertia_el = inertial.find("inertia")
            density_el = inertial.find("density")
            if mass_el is not None:
                mass = float(mass_el.get("value", "0"))
            if inertia_el is not None:
                i6 = tuple(
                    float(inertia_el.get(k, "0"))
                    for k in ("ixx", "iyy", "izz", "ixy", "ixz", "iyz")
                )
            elif density_el is not None and geoms:
                # density-only inertial (reference LEGO URDFs): box inertia of
                # the first collision geom
                rho = float(density_el.get("value", str(default_density)))
                g0 = geoms[0]
                ex, ey, ez = (2 * s for s in g0.size)
                mass = rho * ex * ey * ez
                i6 = (
                    mass / 12 * (ey**2 + ez**2),
                    mass / 12 * (ex**2 + ez**2),
                    mass / 12 * (ex**2 + ey**2),
                    0, 0, 0,
                )
                com = g0.pos
        if mass == 0.0 and geoms:
            g0 = geoms[0]
            ex, ey, ez = (2 * s for s in g0.size)
            mass = default_density * ex * ey * ez
            i6 = (
                mass / 12 * (ey**2 + ez**2),
                mass / 12 * (ex**2 + ez**2),
                mass / 12 * (ex**2 + ey**2),
                0, 0, 0,
            )
            com = g0.pos
        links[name] = dict(geoms=geoms, mass=mass, com=com, inertia=i6)

    joints = []
    children = set()
    for j in root.findall("joint"):
        jtype = _JTYPES.get(j.get("type"), JOINT_FIXED)
        origin = j.find("origin")
        axis_el = j.find("axis")
        limit = j.find("limit")
        dyn = j.find("dynamics")
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        children.add(child)
        lower = upper = 0.0
        effort, max_vel = 0.0, 1e9
        if limit is not None:
            lower = float(limit.get("lower", "0"))
            upper = float(limit.get("upper", "0"))
            effort = float(limit.get("effort", "0"))
            max_vel = float(limit.get("velocity", "1e9")) or 1e9
        if j.get("type") == "continuous":
            lower, upper = -np.pi * 4, np.pi * 4
        joints.append(
            dict(
                name=j.get("name"), jtype=jtype, parent=parent, child=child,
                xyz=_f3(origin.get("xyz") if origin is not None else None),
                rpy=_f3(origin.get("rpy") if origin is not None else None),
                axis=_f3(axis_el.get("xyz") if axis_el is not None else None, "1 0 0"),
                lower=lower, upper=upper, effort=effort, max_velocity=max_vel,
                damping=float(dyn.get("damping", "0")) if dyn is not None else 0.0,
            )
        )

    roots = [n for n in links if n not in children]
    name = root.get("name", os.path.basename(path))

    if not joints or (not fix_base and len(links) == 1):
        # single-link free body
        lname = roots[0] if roots else next(iter(links))
        l = links[lname]
        return BodySpec(
            name=name, mass=l["mass"], com=l["com"], inertia=l["inertia"],
            geoms=l["geoms"], kinematic=fix_base,
        )

    spec_links = []
    for lname in links:
        l = links[lname]
        if lname in {j["child"] for j in joints}:
            j = next(jj for jj in joints if jj["child"] == lname)
            spec_links.append(
                LinkSpec(
                    name=lname, parent=j["parent"],
                    joint=JointSpec(
                        jtype=j["jtype"], axis=j["axis"], lower=j["lower"],
                        upper=j["upper"], effort=j["effort"],
                        max_velocity=j["max_velocity"], damping=j["damping"],
                    ),
                    origin_pos=j["xyz"], origin_rpy=j["rpy"],
                    mass=l["mass"], com=l["com"], inertia=l["inertia"],
                    geoms=l["geoms"],
                )
            )
        else:
            spec_links.append(
                LinkSpec(name=lname, parent=None, mass=l["mass"], com=l["com"],
                         inertia=l["inertia"], geoms=l["geoms"])
            )
    return ArticulationSpec(name=name, links=spec_links)


def load_mjcf_object(path: str, friction: float = 1.0,
                     default_density: float = 1000.0) -> BodySpec:
    """Minimal MJCF: first body's box/sphere geoms -> free BodySpec
    (covers the reference's `mjcf/box/mobility.urdf`-style object files)."""
    tree = ET.parse(path)
    root = tree.getroot()
    geoms = []
    mass = 0.0
    for geom_el in root.iter("geom"):
        gtype = geom_el.get("type", "sphere")
        size = _f3(geom_el.get("size"), "0.01")
        pos = _f3(geom_el.get("pos"))
        if gtype == "box":
            geoms.append(GeomSpec(GEOM_BOX, size, pos=pos, friction=friction))
            vol = 8 * size[0] * size[1] * size[2]
        else:
            geoms.append(GeomSpec(GEOM_SPHERE, (size[0], 0, 0), pos=pos, friction=friction))
            vol = 4 / 3 * np.pi * size[0] ** 3
        mass += default_density * vol
    if not geoms:
        raise ValueError(f"no geoms in {path}")
    s0 = geoms[0].size
    i = mass * (s0[0] ** 2) * 0.4
    return BodySpec(
        name=root.get("model", os.path.basename(path)),
        mass=mass, inertia=(i, i, i, 0, 0, 0), geoms=geoms,
    )
