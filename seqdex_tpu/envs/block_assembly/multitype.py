"""Multi-type target-brick geometry tables.

The reference builds ALL 8 lego types into every env and targets
`segmentation_id = i % 8` (`tasks/block_assembly/
allegro_hand_block_assembly_grasp_sim.py:706-745,959-965`), so every stage of
the chain trains and collects terminals for every type simultaneously.

TPU-native equivalent: the scene is compiled once with a UNION target-brick
slot (body box + 4 stud colliders, 52 contact points — the maximum over the
8 types), and this module precomputes an (8, ...) table of per-type collider
sizes/positions, contact-point offsets, and mass properties. At reset the
env samples a type, gathers one table row into `SimState.geom`
(`sim/contact.GeomTables`), and the same compiled program simulates that
type — geometry is runtime per-env state, narrowphase cost is unchanged.

Studs/points a type doesn't have are parked far from the scene in the body
frame (collider at z=-50, points at z=+50) so they can never contact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...core import builders
from ...sim.contact import GeomTables
from ...sim.scene import OWNER_BODY, _box_points

# the union brick compiled into the scene slot: 4 studs (max over types)
UNION_BRICK_KIND = "1x4"


def build_type_tables(scene, target_body="target",
                      types=builders.LEGO_TYPES,
                      brick_kwargs=None) -> GeomTables:
    """(T, ...) full-table rows for gathering into SimState.geom at reset.

    Rows repeat the scene's static tables except for the target bodies'
    colliders/points/mass, which carry each type's geometry. `target_body`
    may be one name or a sequence (InsertSim re-types both the held block
    and the kinematic socket brick).
    """
    names = ((target_body,) if isinstance(target_body, str)
             else tuple(target_body))
    T = len(types)
    col_size = np.tile(np.asarray(scene.col_size, dtype=np.float32)[None],
                       (T, 1, 1))
    col_pos = np.tile(np.asarray(scene.col_pos, dtype=np.float32)[None],
                      (T, 1, 1))
    pt_offset = np.tile(np.asarray(scene.pt_offset, dtype=np.float32)[None],
                        (T, 1, 1))
    inv_mass = np.tile(np.asarray(scene.body_inv_mass, dtype=np.float32)[None],
                       (T, 1))
    inertia = np.tile(np.asarray(scene.body_inertia, dtype=np.float32)[None],
                      (T, 1, 1, 1))
    inv_inertia = np.tile(
        np.asarray(scene.body_inv_inertia, dtype=np.float32)[None],
        (T, 1, 1, 1))
    com = np.tile(np.asarray(scene.body_com, dtype=np.float32)[None], (T, 1, 1))

    for name in names:
        b = scene.body_index(name)
        kinematic = bool(np.asarray(scene.body_kinematic)[b])
        col_idx = np.where(
            (np.asarray(scene.col_owner_kind) == OWNER_BODY)
            & (np.asarray(scene.col_owner) == b))[0]
        pt_idx = np.where(
            (np.asarray(scene.pt_owner_kind) == OWNER_BODY)
            & (np.asarray(scene.pt_owner) == b))[0]
        for t, kind in enumerate(types):
            spec = builders.lego_brick(kind, name=name,
                                       **(brick_kwargs or {}))
            # colliders in geom order (body box first, then studs)
            csz = [np.asarray(g.size, dtype=np.float32) for g in spec.geoms]
            cps = [np.asarray(g.pos, dtype=np.float32) for g in spec.geoms]
            assert len(csz) <= len(col_idx), (kind, len(csz), len(col_idx))
            while len(csz) < len(col_idx):  # park absent studs
                csz.append(np.asarray([1e-4, 1e-4, 1e-4], dtype=np.float32))
                cps.append(np.asarray([0.0, 0.0, -50.0], dtype=np.float32))
            col_size[t, col_idx] = np.stack(csz)
            col_pos[t, col_idx] = np.stack(cps)
            # points in geom order (same enumeration as compile_scene)
            pofs = []
            for g in spec.geoms:
                if g.emit_points:
                    for p in _box_points(np.asarray(g.size, dtype=float),
                                         g.point_detail):
                        pofs.append(np.asarray(g.pos, dtype=np.float32)
                                    + p.astype(np.float32))
            assert len(pofs) <= len(pt_idx), (kind, len(pofs), len(pt_idx))
            while len(pofs) < len(pt_idx):  # park absent points
                pofs.append(np.asarray([0.0, 0.0, 50.0], dtype=np.float32))
            pt_offset[t, pt_idx] = np.stack(pofs)
            # mass properties (kinematic bodies keep inv_mass = 0)
            if not kinematic:
                inv_mass[t, b] = 1.0 / spec.mass
                ixx, iyy, izz, ixy, ixz, iyz = spec.inertia
                I = np.asarray(
                    [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]],
                    dtype=np.float64)
                inertia[t, b] = I.astype(np.float32)
                inv_inertia[t, b] = np.linalg.inv(
                    I + 1e-9 * np.eye(3)).astype(np.float32)
                com[t, b] = np.asarray(spec.com, dtype=np.float32)

    return GeomTables(
        col_size=jnp.asarray(col_size),
        col_pos=jnp.asarray(col_pos),
        pt_offset=jnp.asarray(pt_offset),
        inv_mass=jnp.asarray(inv_mass),
        inertia=jnp.asarray(inertia),
        inv_inertia=jnp.asarray(inv_inertia),
        com=jnp.asarray(com),
    )


def geom_for_type(tables: GeomTables, type_idx) -> GeomTables:
    """Gather one type's row -> per-env GeomTables (jit-safe, type_idx may be
    a traced scalar)."""
    import jax

    return jax.tree_util.tree_map(lambda x: x[type_idx], tables)
