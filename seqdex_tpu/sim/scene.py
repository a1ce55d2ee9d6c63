"""Scene compiler: specs -> flat contact/dynamics tables.

TPU-native replacement for IsaacGym scene construction
(`_create_envs` + `gym.prepare_sim`, reference
`tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py:523-1040`,
`tasks/hand_base/base_task.py:83-84`): instead of instantiating N_env copies
of every actor, we compile ONE static scene description; per-env state lives
in a `SimState` pytree that is vmapped/sharded over the env axis.

Collision model: every geom contributes
  * contact sample points (box corners/edges, sphere centers), and/or
  * a collider (box / sphere / plane signed-distance provider).
Contact candidates are the dense (points x colliders) grid with a static
pair mask — fixed shapes, no data-dependent control flow.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

from ..core.model import (
    GEOM_BOX,
    GEOM_PLANE,
    GEOM_SPHERE,
    Articulation,
    ArticulationSpec,
    BodySpec,
    GeomSpec,
    StaticGeomSpec,
    articulation_geoms,
    compile_articulation,
    quat_apply_np,
    quat_mul_np,
    rpy_to_quat_np,
)

OWNER_STATIC = 0
OWNER_LINK = 1
OWNER_BODY = 2


def _box_points(half, detail: int) -> np.ndarray:
    hx, hy, hz = half
    corners = np.array(
        [[sx * hx, sy * hy, sz * hz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    pts = [corners]
    if detail >= 1:
        # edge midpoints (12)
        edges = []
        for axis_zero in range(3):
            for s1 in (-1, 1):
                for s2 in (-1, 1):
                    p = np.zeros(3)
                    others = [a for a in range(3) if a != axis_zero]
                    p[others[0]] = s1 * half[others[0]]
                    p[others[1]] = s2 * half[others[1]]
                    edges.append(p)
        pts.append(np.array(edges))
    if detail >= 2:
        faces = []
        for a in range(3):
            for s in (-1, 1):
                p = np.zeros(3)
                p[a] = s * half[a]
                faces.append(p)
        pts.append(np.array(faces))
    return np.concatenate(pts, axis=0)


@dataclass(frozen=True)
class CompiledScene:
    art: Articulation
    body_names: tuple
    nbodies: int
    body_mass: np.ndarray  # (B,)
    body_inv_mass: np.ndarray  # (B,) 0 for kinematic
    body_inertia: np.ndarray  # (B, 3, 3) about com, body frame
    body_inv_inertia: np.ndarray  # (B, 3, 3) body frame, 0 for kinematic
    body_com: np.ndarray  # (B, 3)
    body_kinematic: np.ndarray  # (B,) bool
    # contact points
    npoints: int
    pt_owner_kind: np.ndarray  # (P,)
    pt_owner: np.ndarray  # (P,)
    pt_offset: np.ndarray  # (P, 3)
    pt_radius: np.ndarray  # (P,)
    pt_friction: np.ndarray  # (P,)
    # colliders
    ncolliders: int
    col_kind: np.ndarray  # (C,) GEOM_*
    col_owner_kind: np.ndarray  # (C,)
    col_owner: np.ndarray  # (C,)
    col_pos: np.ndarray  # (C, 3) in owner frame (world for static)
    col_quat: np.ndarray  # (C, 4)
    col_size: np.ndarray  # (C, 3)
    col_friction: np.ndarray  # (C,)
    pair_mask: np.ndarray  # (P, C) bool
    # geom identity ids (for arithmetic pair-legality re-derivation in the
    # neighbor-list narrowphase): geom entry index + collision group
    pt_entry: np.ndarray = None  # (P,)
    pt_group_id: np.ndarray = None  # (P,)
    col_entry: np.ndarray = None  # (C,)
    col_group_id: np.ndarray = None  # (C,)

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)


def compile_scene(
    art_spec: ArticulationSpec,
    bodies: Sequence[BodySpec] = (),
    statics: Sequence[StaticGeomSpec] = (),
) -> CompiledScene:
    art = compile_articulation(art_spec)

    # --- bodies ---
    B = len(bodies)
    body_mass = np.zeros(B)
    body_inertia = np.zeros((B, 3, 3))
    body_com = np.zeros((B, 3))
    body_kin = np.zeros(B, dtype=bool)
    for bi, b in enumerate(bodies):
        body_mass[bi] = b.mass
        ixx, iyy, izz, ixy, ixz, iyz = b.inertia
        body_inertia[bi] = [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]]
        body_com[bi] = b.com
        body_kin[bi] = b.kinematic
    inv_mass = np.where(body_kin | (body_mass <= 0), 0.0, 1.0 / np.maximum(body_mass, 1e-9))
    inv_inertia = np.zeros_like(body_inertia)
    for bi in range(B):
        if not body_kin[bi] and body_mass[bi] > 0:
            inv_inertia[bi] = np.linalg.inv(
                body_inertia[bi] + 1e-9 * np.eye(3)
            )

    # --- gather geoms with owners ---
    # entries: (owner_kind, owner_idx, geom, world_pos, world_quat) — world
    # pose only used for statics
    entries = []
    for li, g in articulation_geoms(art_spec, art):
        entries.append((OWNER_LINK, li, g, None, None))
    for bi, b in enumerate(bodies):
        for g in b.geoms:
            entries.append((OWNER_BODY, bi, g, None, None))
    for s in statics:
        entries.append((OWNER_STATIC, -1, s.geom, np.asarray(s.pos, dtype=float),
                        rpy_to_quat_np(s.rpy)))

    # --- points table ---
    pt_owner_kind, pt_owner, pt_offset, pt_radius, pt_friction, pt_group = [], [], [], [], [], []
    pt_owner_entry = []
    # --- collider table ---
    col_kind, col_owner_kind, col_owner = [], [], []
    col_pos, col_quat, col_size, col_friction, col_group = [], [], [], [], []
    col_owner_entry = []

    for ei, (okind, oidx, g, wpos, wquat) in enumerate(entries):
        gq = rpy_to_quat_np(g.rpy)
        gp = np.asarray(g.pos, dtype=float)
        if okind == OWNER_STATIC:
            # fold static geom pose into world
            gq = quat_mul_np(wquat, gq)
            gp = wpos + quat_apply_np(wquat, np.asarray(g.pos, dtype=float))
        if g.emit_points and okind != OWNER_STATIC:
            if g.gtype == GEOM_BOX:
                local = _box_points(np.asarray(g.size, dtype=float), g.point_detail)
                for p in local:
                    pt_owner_kind.append(okind)
                    pt_owner.append(oidx)
                    pt_offset.append(gp + quat_apply_np(gq, p))
                    pt_radius.append(0.0)
                    pt_friction.append(g.friction)
                    pt_group.append(g.group)
                    pt_owner_entry.append(ei)
            elif g.gtype == GEOM_SPHERE:
                pt_owner_kind.append(okind)
                pt_owner.append(oidx)
                pt_offset.append(gp)
                pt_radius.append(float(g.size[0]))
                pt_friction.append(g.friction)
                pt_group.append(g.group)
                pt_owner_entry.append(ei)
        if g.is_collider and g.gtype in (GEOM_BOX, GEOM_SPHERE, GEOM_PLANE):
            col_kind.append(g.gtype)
            col_owner_kind.append(okind)
            col_owner.append(oidx)
            col_pos.append(gp)
            col_quat.append(gq)
            if g.gtype == GEOM_SPHERE:
                col_size.append([float(g.size[0])] * 3)
            else:
                col_size.append(list(np.asarray(g.size, dtype=float)))
            col_friction.append(g.friction)
            col_group.append(g.group)
            col_owner_entry.append(ei)

    P, C = len(pt_owner), len(col_kind)
    from ..native import build_pair_mask

    pair_mask = build_pair_mask(
        pt_owner_entry, pt_owner_kind, pt_owner, pt_group,
        col_owner_entry, col_owner_kind, col_owner, col_group,
    ) if P * C > 0 else np.ones((P, C), dtype=bool)

    return CompiledScene(
        art=art,
        body_names=tuple(b.name for b in bodies),
        nbodies=B,
        body_mass=body_mass,
        body_inv_mass=inv_mass,
        body_inertia=body_inertia,
        body_inv_inertia=inv_inertia,
        body_com=body_com,
        body_kinematic=body_kin,
        npoints=P,
        pt_owner_kind=np.array(pt_owner_kind, dtype=np.int32),
        pt_owner=np.array(pt_owner, dtype=np.int32),
        pt_offset=np.array(pt_offset, dtype=np.float64).reshape(P, 3),
        pt_radius=np.array(pt_radius),
        pt_friction=np.array(pt_friction),
        ncolliders=C,
        col_kind=np.array(col_kind, dtype=np.int32),
        col_owner_kind=np.array(col_owner_kind, dtype=np.int32),
        col_owner=np.array(col_owner, dtype=np.int32),
        col_pos=np.array(col_pos, dtype=np.float64).reshape(C, 3),
        col_quat=np.array(col_quat, dtype=np.float64).reshape(C, 4),
        col_size=np.array(col_size, dtype=np.float64).reshape(C, 3),
        col_friction=np.array(col_friction),
        pair_mask=pair_mask,
        pt_entry=np.array(pt_owner_entry, dtype=np.int32),
        pt_group_id=np.array(pt_group, dtype=np.int32),
        col_entry=np.array(col_owner_entry, dtype=np.int32),
        col_group_id=np.array(col_group, dtype=np.int32),
    )
