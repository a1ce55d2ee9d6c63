#!/usr/bin/env python
"""Minimal hot-path profiler against the CURRENT sim API.

Times (at BENCH_NUM_ENVS envs, vmapped+jitted, donated where legal):
  fk            — forward kinematics alone
  dynamics      — fk + mass matrix + bias + implicit-PD free velocity
  narrowphase   — contact generation alone (from fk results)
  substep       — one full physics substep
  env_step      — full env.step (2 substeps + obs + reward + reset fold)
  policy_step   — env.step + actor forward (the bench workload)
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


def timeit(name, fn, *args, iters=30, warmup=8):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    env = make_grasp_sim_env(GraspSimConfig())
    sim = env.sim

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    jax.block_until_ready(state.sim.q)
    print(f"envs={num_envs} backend={jax.devices()[0].platform}", flush=True)

    q, qd = state.sim.q, state.sim.qd
    bp, bq = state.sim.body_pos, state.sim.body_quat

    stages = os.environ.get("PROF_STAGES", "fk,narrow,substep,policy").split(",")

    if "fk" in stages:
        fk_v = jax.jit(jax.vmap(sim.fk))
        timeit("fk", fk_v, q, qd)

    if "narrow" in stages:
        from seqdex_tpu.sim.contact import make_narrowphase

        narrowphase, _ = make_narrowphase(sim.scene, sim.config.max_contacts)

        def nphase(q, qd, bp, bq):
            fk_res = sim.fk(q, qd)
            c = narrowphase(fk_res.pos, fk_res.quat, bp, bq)
            return c.depth

        timeit("fk+narrowphase", jax.jit(jax.vmap(nphase)), q, qd, bp, bq)

    if "substep" in stages:
        substep_v = jax.jit(jax.vmap(sim.substep))
        timeit("substep", substep_v, state.sim)

    if "env" in stages:
        step_v = jax.jit(jax.vmap(env.step))
        acts = jnp.zeros((num_envs, env.num_actions))
        timeit("env_step", step_v, state, acts)

    if "policy" not in stages:
        return

    params = networks.init_actor_critic(
        jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions
    )

    def pol(state, obs):
        action = networks.actor_mu(params, obs)
        state, out = jax.vmap(env.step)(state, action)
        return state, out.obs

    # thread the carry through the timing loop: donated buffers must not be
    # reused across calls (donate+static-args would fail on standard
    # jaxlib backends)
    pol = jax.jit(pol, donate_argnums=(0,))
    obs = state.obs_stack.reshape(num_envs, -1)
    iters, warmup = 30, 8
    for _ in range(warmup):
        state, obs = pol(state, obs)
    jax.block_until_ready(obs)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, obs = pol(state, obs)
    jax.block_until_ready(obs)
    dt = (time.perf_counter() - t0) / iters
    print(f"policy_step {dt*1e3:9.3f} ms", flush=True)
    print(f"steps/s/chip: {num_envs/dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
