#!/usr/bin/env python
"""Component-level timing of the GraspSim hot path on the real chip.

Times each stage of the substep at BENCH_NUM_ENVS envs so kernel work targets
the real bottleneck (run with JAX_PLATFORMS unset to hit the TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
from seqdex_tpu.rl import networks
from seqdex_tpu.sim.simulator import make_sim, SimConfig


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
    print(f"devices={jax.devices()} num_envs={num_envs}")
    env = make_grasp_sim_env(GraspSimConfig())
    sim = env.sim
    art = sim.scene.art
    print(f"ndof={art.ndof} nlinks={art.nlinks} nbodies={sim.scene.nbodies} "
          f"npoints={sim.scene.npoints} ncolliders={sim.scene.ncolliders} "
          f"max_contacts={sim.config.max_contacts}")

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    params = networks.init_actor_critic(
        jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions
    )

    s = state.sim
    q, qd = s.q, s.qd

    # --- component timings (all vmapped + jitted) ---
    fk = jax.jit(jax.vmap(sim.fk))
    timeit("fk", fk, q, qd)
    fk_res = fk(q, qd)

    mm = jax.jit(jax.vmap(sim.mass_matrix))
    timeit("mass_matrix (CRBA)", mm, fk_res)
    M = mm(fk_res)

    def minv_f(M):
        h = 1.0 / 120.0
        Mt = M + jnp.diag(jnp.full((M.shape[-1],), h * 50.0))
        chol = jax.scipy.linalg.cho_factor(Mt)
        return jax.scipy.linalg.cho_solve(chol, jnp.eye(Mt.shape[-1], dtype=M.dtype))
    timeit("cho_factor+cho_solve->Minv", jax.jit(jax.vmap(minv_f)), M)

    from seqdex_tpu.sim.contact import make_narrowphase
    narrow, _ = make_narrowphase(sim.scene, sim.config.max_contacts)
    nf = jax.jit(jax.vmap(narrow))
    timeit("narrowphase", nf, fk_res.pos, fk_res.quat, s.body_pos, s.body_quat)

    substep = jax.jit(jax.vmap(sim.substep))
    timeit("substep (x1)", substep, s)

    simstep = jax.jit(jax.vmap(sim.step))
    timeit("sim.step (2 substeps)", simstep, s)

    def env_step(st, obs):
        a = networks.actor_mu(params, obs)
        st, out = jax.vmap(env.step)(st, a)
        return st, out.obs
    env_step = jax.jit(env_step)
    obs = state.obs_stack.reshape(num_envs, -1)
    dt = timeit("env.step (policy+IK+sim+obs+rew)", env_step, state, obs)
    print(f"=> {num_envs/dt:,.0f} env steps/s/chip")


if __name__ == "__main__":
    main()
