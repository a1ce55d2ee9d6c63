#!/usr/bin/env python
"""Stage-level timing of the narrowphase + QP internals on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
from seqdex_tpu.core.math import quat_apply, quat_to_matrix
from seqdex_tpu.core.model import GEOM_BOX, GEOM_SPHERE
from seqdex_tpu.sim.scene import OWNER_LINK, OWNER_STATIC


def timeit(name, fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms")
    return dt


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    env = make_grasp_sim_env(GraspSimConfig())
    sim = env.sim
    scene = sim.scene
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    s = state.sim
    fk = jax.jit(jax.vmap(sim.fk))
    fk_res = fk(s.q, s.qd)
    K = sim.config.max_contacts

    from seqdex_tpu.sim.contact import make_narrowphase
    narrow, point_world = make_narrowphase(scene, K)

    P, C = scene.npoints, scene.ncolliders
    pt_owner = jnp.asarray(scene.pt_owner)
    pt_offset = jnp.asarray(scene.pt_offset, dtype=jnp.float32)
    pt_radius = jnp.asarray(scene.pt_radius, dtype=jnp.float32)
    pair_mask_T = jnp.asarray(scene.pair_mask.T)
    col_kind = scene.col_kind
    is_box = jnp.asarray((col_kind == GEOM_BOX)[:, None])
    is_sphere = jnp.asarray((col_kind == GEOM_SPHERE)[:, None])
    col_size = jnp.asarray(scene.col_size, dtype=jnp.float32)

    def depth_grid(fk_pos, fk_quat, body_pos, body_quat):
        pw = point_world(fk_pos, fk_quat, body_pos, body_quat)
        # reuse internals by re-deriving collider poses (same math as contact.py)
        from seqdex_tpu.core.math import quat_mul
        col_owner = jnp.asarray(scene.col_owner)
        col_owner_kind = jnp.asarray(scene.col_owner_kind)
        col_pos = jnp.asarray(scene.col_pos, dtype=jnp.float32)
        col_quat = jnp.asarray(scene.col_quat, dtype=jnp.float32)
        lk = jnp.clip(col_owner, 0, fk_pos.shape[0] - 1)
        bk = jnp.clip(col_owner, 0, max(body_pos.shape[0] - 1, 0))
        p_link = fk_pos[lk] + quat_apply(fk_quat[lk], col_pos)
        q_link = quat_mul(fk_quat[lk], col_quat)
        p_body = body_pos[bk] + quat_apply(body_quat[bk], col_pos)
        q_body = quat_mul(body_quat[bk], col_quat)
        kind = col_owner_kind[:, None]
        cp = jnp.where(kind == OWNER_STATIC, col_pos,
                       jnp.where(kind == OWNER_LINK, p_link, p_body))
        cq = jnp.where(kind == OWNER_STATIC, col_quat,
                       jnp.where(kind == OWNER_LINK, q_link, q_body))
        Rc = quat_to_matrix(cq)
        pwT = pw.T
        rel = pwT[None, :, :] - cp[:, :, None]
        lx = (Rc[:, 0, 0, None] * rel[:, 0] + Rc[:, 1, 0, None] * rel[:, 1]
              + Rc[:, 2, 0, None] * rel[:, 2])
        ly = (Rc[:, 0, 1, None] * rel[:, 0] + Rc[:, 1, 1, None] * rel[:, 1]
              + Rc[:, 2, 1, None] * rel[:, 2])
        lz = (Rc[:, 0, 2, None] * rel[:, 0] + Rc[:, 1, 2, None] * rel[:, 1]
              + Rc[:, 2, 2, None] * rel[:, 2])
        hx, hy, hz = col_size[:, 0, None], col_size[:, 1, None], col_size[:, 2, None]
        qx, qy, qz = jnp.abs(lx) - hx, jnp.abs(ly) - hy, jnp.abs(lz) - hz
        qxp, qyp, qzp = jnp.maximum(qx, 0.), jnp.maximum(qy, 0.), jnp.maximum(qz, 0.)
        outside = jnp.sqrt(qxp * qxp + qyp * qyp + qzp * qzp)
        max_in = jnp.maximum(qx, jnp.maximum(qy, qz))
        sdf_box = outside + jnp.minimum(max_in, 0.0)
        r_loc = jnp.sqrt(lx * lx + ly * ly + lz * lz)
        sdf_sph = r_loc - hx
        sdf = jnp.where(is_box, sdf_box, jnp.where(is_sphere, sdf_sph, lz))
        depth = pt_radius[None, :] - sdf
        return jnp.where(pair_mask_T, depth, -1e9)

    dg = jax.jit(jax.vmap(depth_grid))
    timeit("depth grid only (no normals)", dg, fk_res.pos, fk_res.quat, s.body_pos, s.body_quat)
    depth = dg(fk_res.pos, fk_res.quat, s.body_pos, s.body_quat)

    def best2(depth):
        c1 = jnp.argmax(depth, axis=0)
        d1 = jnp.max(depth, axis=0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 0)
        depth2 = jnp.where(row_iota == c1[None, :], -1e9, depth)
        c2 = jnp.argmax(depth2, axis=0)
        d2 = jnp.max(depth2, axis=0)
        return jnp.concatenate([d1, d2]), jnp.concatenate([c1, c2])
    b2 = jax.jit(jax.vmap(best2))
    timeit("best-2 reduce", b2, depth)
    cand_depth, cand_col = b2(depth)

    def topk(cand_depth):
        return jax.lax.top_k(cand_depth, K)
    timeit("top_k(2P -> K)", jax.jit(jax.vmap(topk)), cand_depth)

    def rank_compact(cand_depth):
        active = cand_depth > 0.0
        rank = jnp.cumsum(active.astype(jnp.int32)) - 1
        slot = jnp.where(active, rank, K + 1)
        onehot = (slot[None, :] == jnp.arange(K)[:, None]).astype(jnp.float32)
        d = onehot @ cand_depth
        return d
    timeit("rank+onehot compaction", jax.jit(jax.vmap(rank_compact)), cand_depth)

    timeit("narrowphase (full, current)", jax.jit(jax.vmap(narrow)),
           fk_res.pos, fk_res.quat, s.body_pos, s.body_quat)

    # ---- QP side ----
    import seqdex_tpu.sim.simulator as simulator
    # time solve_contact_qp by reproducing the substep up to the call
    def substep_noqp(st):
        fr = sim.fk(st.q, st.qd)
        M = sim.mass_matrix(fr)
        contacts = narrow(fr.pos, fr.quat, st.body_pos, st.body_quat)
        return M, contacts.depth
    timeit("substep minus QP-ish (fk+M+narrow)", jax.jit(jax.vmap(substep_noqp)), s)


if __name__ == "__main__":
    main()
