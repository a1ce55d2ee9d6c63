#!/usr/bin/env python
"""Breakdown of the substep cost: dynamics vs contact assembly vs QP iters."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
from seqdex_tpu.sim.kinematics import make_dynamics


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
    env0 = make_grasp_sim_env(GraspSimConfig(solver_iterations=0))
    env4 = make_grasp_sim_env(GraspSimConfig(solver_iterations=4))
    sim0, sim4 = env0.sim, env4.sim

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env0.reset))(keys)
    jax.block_until_ready(state.sim.q)
    print(f"envs={num_envs} backend={jax.devices()[0].platform}", flush=True)

    mass_matrix, bias_forces, _, _ = make_dynamics(
        sim0.scene.art, gravity=sim0.config.gravity
    )

    def dyn(q, qd):
        fk_res = sim0.fk(q, qd)
        return mass_matrix(fk_res), bias_forces(fk_res, qd)

    timeit("fk+mass+bias", jax.jit(jax.vmap(dyn)), state.sim.q, state.sim.qd)
    timeit("substep_it0", jax.jit(jax.vmap(sim0.substep)), state.sim)
    timeit("substep_it4", jax.jit(jax.vmap(sim4.substep)), state.sim)


if __name__ == "__main__":
    main()
