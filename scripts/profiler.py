#!/usr/bin/env python
"""Parameterized hot-path profiler (consolidates the former 8 one-off
profile_* scripts).

Usage:
    python scripts/profiler.py --mode hot            # stage wall timings
    python scripts/profiler.py --mode trace          # XLA op-level trace
    python scripts/profiler.py --mode trace --target envstep
    BENCH_NUM_ENVS=4096 python scripts/profiler.py --mode hot

Modes:
  hot    — wall-clock of fk / narrowphase / substep / env_step / policy_step
           (jitted + donated, median of N iters)
  trace  — capture a jax profiler trace of the target and print per-op
           self-times aggregated over the device timeline
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
from seqdex_tpu.rl import networks


def timeit(name, fn, *args, iters=20, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:9.3f} ms")
    return out


def build(num_envs):
    env = make_grasp_sim_env(GraspSimConfig())
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    params = networks.init_actor_critic(
        jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions)
    return env, state, params


def target_fn(env, state, params, target, num_envs):
    sim = env.sim
    if target == "substep":
        return jax.jit(jax.vmap(sim.substep)), state.sim
    if target == "fk":
        return jax.jit(jax.vmap(sim.fk)), (state.sim.q, state.sim.qd)
    if target == "envstep":
        obs0 = state.obs_stack.reshape(num_envs, -1)

        def f(st):
            a = networks.actor_mu(params, obs0)
            st, out = jax.vmap(env.step)(st, a)
            return st

        return jax.jit(f), state
    raise SystemExit(f"unknown target {target}")


def mode_hot(env, state, params, num_envs):
    sim = env.sim
    timeit("fk", jax.jit(jax.vmap(sim.fk)), state.sim.q, state.sim.qd)
    timeit("substep", jax.jit(jax.vmap(sim.substep)), state.sim)
    obs0 = state.obs_stack.reshape(num_envs, -1)

    def env_step(st, obs):
        st, out = jax.vmap(env.step)(st, jnp.zeros((num_envs, env.num_actions)))
        return st

    timeit("env_step(zero actions)", jax.jit(env_step), state, obs0)

    def policy_step(st, obs):
        a = networks.actor_mu(params, obs)
        st, out = jax.vmap(env.step)(st, a)
        return st, out.obs

    timeit("policy_step", jax.jit(policy_step), state, obs0)


def mode_trace(env, state, params, num_envs, target):
    fn, arg = target_fn(env, state, params, target, num_envs)
    if isinstance(arg, tuple) and not hasattr(arg, "_fields"):
        call = lambda: fn(*arg)
    else:
        call = lambda: fn(arg)
    for _ in range(5):
        out = call()
    jax.block_until_ready(out)
    tracedir = "/tmp/jax_trace"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for _ in range(10):
            out = call()
        jax.block_until_ready(out)
    files = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    for plane in pd.planes:
        if "TPU" not in plane.name and "CPU" not in plane.name:
            continue
        for line in plane.lines:
            tot, n = 0.0, 0
            per = defaultdict(float)
            for ev in line.events:
                tot += ev.duration_ns / 1e6
                n += 1
                per[ev.name[:110]] += ev.duration_ns / 1e6
            if tot < 1.0:
                continue
            print(f"--- {plane.name} / {line.name}: total {tot:.1f} ms, {n} events")
            for name, t in sorted(per.items(), key=lambda kv: -kv[1])[:14]:
                print(f"   {t/10:8.3f} ms/iter  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="hot", choices=["hot", "trace"])
    ap.add_argument("--target", default="substep",
                    choices=["substep", "envstep", "fk"])
    ap.add_argument("--num_envs", type=int,
                    default=int(os.environ.get("BENCH_NUM_ENVS", "2048")))
    args = ap.parse_args()
    env, state, params = build(args.num_envs)
    if args.mode == "hot":
        mode_hot(env, state, params, args.num_envs)
    else:
        mode_trace(env, state, params, args.num_envs, args.target)


if __name__ == "__main__":
    main()
