#!/usr/bin/env python
"""Throughput benchmark — run on the real TPU chip by the driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aggregate env steps/sec of the flagship BlockAssemblyGraspSim
environment (full physics + obs/reward pipeline + policy-forward inlined),
per chip. Baseline bar: 62,500 env steps/s/chip (BASELINE.md: >= 1e6
aggregate on 16 chips at 4096 envs/chip).
"""

import json
import os
import sys
import time

# keep the axon plugin path if the caller replaced PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
from seqdex_tpu.rl import networks

BASELINE_STEPS_PER_SEC_PER_CHIP = 62_500.0


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    warmup = int(os.environ.get("BENCH_WARMUP", "25"))

    env = make_grasp_sim_env(GraspSimConfig())
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)

    params = networks.init_actor_critic(
        jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions
    )

    def rollout_step(state, obs):
        action = networks.actor_mu(params, obs)
        state, out = jax.vmap(env.step)(state, action)
        return state, out.obs

    rollout_step = jax.jit(rollout_step, donate_argnums=(0,))

    obs = state.obs_stack.reshape(num_envs, -1)
    # compile + runtime warm-up (the first ~20 device iterations run slow
    # while the TPU runtime finishes its lazy setup)
    for _ in range(warmup):
        state, obs = rollout_step(state, obs)
    jax.block_until_ready(obs)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, obs = rollout_step(state, obs)
    jax.block_until_ready(obs)
    elapsed = time.perf_counter() - t0

    steps_per_sec = num_envs * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "grasp_sim_env_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
