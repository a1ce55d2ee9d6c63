#!/usr/bin/env python
"""Search-scene throughput at reference scale (132-brick mixed heap,
`search.py:735-742`) — the contact-pipeline stress test (VERDICT r1 item 4).

Prints JSON lines: heap settle time, rollout steps/s at BENCH_NUM_ENVS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.search import SearchConfig, make_search_env
from seqdex_tpu.rl import networks


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "128"))
    bricks = int(os.environ.get("BENCH_HEAP_BRICKS", "132"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "10"))

    t0 = time.perf_counter()
    env = make_search_env(SearchConfig(
        heap_bricks=bricks, heap_pool=int(os.environ.get("BENCH_HEAP_POOL", "8"))))
    print(json.dumps({"metric": "search_env_build_s",
                      "value": round(time.perf_counter() - t0, 1),
                      "bricks": bricks}), flush=True)

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    params = networks.init_actor_critic(
        jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions)

    def rollout_step(state, obs):
        action = networks.actor_mu(params, obs)
        state, out = jax.vmap(env.step)(state, action)
        return state, out.obs

    rollout_step = jax.jit(rollout_step, donate_argnums=(0,))
    obs = state.obs_stack.reshape(num_envs, -1)
    for _ in range(warmup):
        state, obs = rollout_step(state, obs)
    jax.block_until_ready(obs)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, obs = rollout_step(state, obs)
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "search132_env_steps_per_sec_per_chip",
        "value": round(num_envs * iters / dt, 1),
        "unit": "env_steps/s/chip",
        "num_envs": num_envs,
        "bricks": bricks,
        "ms_per_batched_step": round(dt / iters * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
