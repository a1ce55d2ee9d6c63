#!/usr/bin/env python
"""Cumulative stage timing of the real substep (copy of simulator.substep with
early exits) — identifies which stage breaks fusion / costs the most.

Keep in sync with seqdex_tpu/sim/simulator.py (profiling aid only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
from seqdex_tpu.core.math import quat_apply, quat_to_matrix
from seqdex_tpu.sim.contact import make_narrowphase, solve_contact_qp
from seqdex_tpu.sim.kinematics import make_dynamics, make_kinematics
from seqdex_tpu.sim.scene import OWNER_BODY, OWNER_LINK


def timeit(name, fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return dt


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    env = make_grasp_sim_env(GraspSimConfig())
    sim = env.sim
    scene, config = sim.scene, sim.config
    art = scene.art
    D, B, L = art.ndof, scene.nbodies, art.nlinks
    (fk, site_jacobian, point_jacobian_tau, point_velocity,
     point_jacobian_rows, point_jacobian_planes,
     point_jacobian_rows_soa) = make_kinematics(art)
    mass_matrix, bias_forces, link_jacobians, com_world = make_dynamics(
        art, gravity=config.gravity)
    narrowphase, _ = make_narrowphase(scene, config.max_contacts)

    from seqdex_tpu.sim.simulator import default_drive_params
    kp = jnp.asarray(default_drive_params(D)[0], dtype=jnp.float32)
    kd = jnp.asarray(default_drive_params(D)[1], dtype=jnp.float32)
    effort = jnp.asarray(default_drive_params(D)[2], dtype=jnp.float32)
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    g = jnp.asarray(config.gravity, dtype=jnp.float32)
    inv_mass_b = jnp.asarray(scene.body_inv_mass, dtype=jnp.float32)
    inertia_b = jnp.asarray(scene.body_inertia, dtype=jnp.float32)
    inv_inertia_b = jnp.asarray(scene.body_inv_inertia, dtype=jnp.float32)
    body_kinematic = jnp.asarray(scene.body_kinematic)
    pt_owner_kind = jnp.asarray(scene.pt_owner_kind)
    pt_owner = jnp.asarray(scene.pt_owner)
    col_owner_kind = jnp.asarray(scene.col_owner_kind)
    col_owner = jnp.asarray(scene.col_owner)
    h = config.dt / config.substeps

    def stages(state, upto):
        fk_res = fk(state.q, state.qd)
        M = mass_matrix(fk_res)
        if upto == 0:
            return M
        bias = bias_forces(fk_res, state.qd)
        kp_e = kp * state.kp_scale
        kd_e = kd * state.kd_scale
        tau_spring = jnp.clip(kp_e * (state.ctrl - state.q), -effort, effort)
        Mt = M + jnp.diag(h * kd_e + h * h * kp_e)
        chol = jax.scipy.linalg.cho_factor(Mt)
        Minv = jax.scipy.linalg.cho_solve(chol, jnp.eye(Mt.shape[0], dtype=Mt.dtype))
        rhs = M @ state.qd + h * (tau_spring - bias)
        qd_free = Minv @ rhs
        if upto == 1:
            return qd_free
        g_eff = g + state.gravity_offset
        grav = jnp.where(body_kinematic[:, None] | (inv_mass_b == 0.0)[:, None], 0.0,
                         jnp.broadcast_to(g_eff, (B, 3)))
        v_free = state.body_linvel + h * grav
        R = quat_to_matrix(state.body_quat)
        Iw = jnp.einsum("bij,bjk,blk->bil", R, inertia_b, R)
        Iw_inv = jnp.einsum("bij,bjk,blk->bil", R, inv_inertia_b, R)
        gyro = jnp.cross(state.body_angvel, jnp.einsum("bij,bj->bi", Iw, state.body_angvel))
        w_free = state.body_angvel - h * jnp.einsum("bij,bj->bi", Iw_inv, gyro)
        w_free = jnp.clip(w_free, -config.max_angvel, config.max_angvel)
        contacts = narrowphase(fk_res.pos, fk_res.quat, state.body_pos, state.body_quat)
        if upto == 2:
            return contacts.depth, contacts.normal, contacts.pos
        k_pt, k_col = contacts.pt_idx, contacts.col_idx
        pt_is_link = pt_owner_kind[k_pt] == OWNER_LINK
        col_is_link = col_owner_kind[k_col] == OWNER_LINK
        link_of_pt = jnp.where(pt_is_link, pt_owner[k_pt], 0)
        link_of_col = jnp.where(col_is_link, col_owner[k_col], 0)
        fmask_pt = pt_is_link.astype(jnp.float32)
        fmask_col = col_is_link.astype(jnp.float32)
        Jpx, Jpy, Jpz = point_jacobian_planes(fk_res, link_of_pt, contacts.pos, fmask_pt)
        Jcx, Jcy, Jcz = point_jacobian_planes(fk_res, link_of_col, contacts.pos, fmask_col)
        Jx, Jy, Jz = Jpx - Jcx, Jpy - Jcy, Jpz - Jcz
        body_of_pt = jnp.where(pt_owner_kind[k_pt] == OWNER_BODY, pt_owner[k_pt], -1)
        body_of_col = jnp.where(col_owner_kind[k_col] == OWNER_BODY, col_owner[k_col], -1)
        body_of_pt = jnp.where(
            (body_of_pt >= 0) & (inv_mass_b[jnp.clip(body_of_pt, 0, B - 1)] == 0.0),
            -1, body_of_pt)
        body_of_col = jnp.where(
            (body_of_col >= 0) & (inv_mass_b[jnp.clip(body_of_col, 0, B - 1)] == 0.0),
            -1, body_of_col)
        com_w = state.body_pos + quat_apply(
            state.body_quat, jnp.asarray(scene.body_com, dtype=jnp.float32))
        r_pt = contacts.pos - com_w[jnp.clip(body_of_pt, 0, B - 1)]
        r_col = contacts.pos - com_w[jnp.clip(body_of_col, 0, B - 1)]
        v_robot = jnp.stack([qd_free @ Jx, qd_free @ Jy, qd_free @ Jz], axis=-1)
        v_pt_body = (v_free[jnp.clip(body_of_pt, 0, B - 1)]
                     + jnp.cross(w_free[jnp.clip(body_of_pt, 0, B - 1)], r_pt)
                     ) * (body_of_pt >= 0)[:, None]
        v_col_body = (v_free[jnp.clip(body_of_col, 0, B - 1)]
                      + jnp.cross(w_free[jnp.clip(body_of_col, 0, B - 1)], r_col)
                      ) * (body_of_col >= 0)[:, None]
        v_rel = v_robot + v_pt_body - v_col_body
        if upto == 3:
            return Jx, Jy, Jz, v_rel
        sol = solve_contact_qp(
            contacts, (Jx, Jy, Jz), body_of_pt, body_of_col, r_pt, r_col,
            v_rel, Minv, inv_mass_b, Iw_inv,
            dt=h, baumgarte=config.baumgarte, compliance=config.compliance,
            iterations=config.solver_iterations,
            max_depenetration_vel=config.max_depenetration_vel, use_pallas=False)
        if upto == 4:
            return sol.dqd, sol.dbody_v
        return sol

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    s = state.sim

    names = ["fk+M", "+bias+cho Minv+qd_free", "+freebody+narrowphase(full)",
             "+jac planes+v_rel", "+solve_contact_qp"]
    prev = 0.0
    for i, nm in enumerate(names):
        f = jax.jit(jax.vmap(lambda st, i=i: stages(st, i)))
        dt = timeit(f"upto{i}: {nm}", f, s)
        print(f"{'':44s} delta {1e3*(dt-prev):+8.3f} ms")
        prev = dt
    substep = jax.jit(jax.vmap(sim.substep))
    timeit("full substep (integration epilogue)", substep, s)


if __name__ == "__main__":
    main()
