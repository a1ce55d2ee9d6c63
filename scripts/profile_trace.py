#!/usr/bin/env python
"""Capture an XLA op-level trace of the hot path and print the top ops by
self-time (aggregated over op name)."""

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


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    target = os.environ.get("TRACE_TARGET", "substep")
    env = make_grasp_sim_env(GraspSimConfig())
    sim = env.sim
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)

    if target == "substep":
        fn = jax.jit(jax.vmap(sim.substep))
        arg = state.sim
    elif target == "envstep":
        from seqdex_tpu.rl import networks
        params = networks.init_actor_critic(
            jax.random.PRNGKey(1), env.num_obs, env.num_states, env.num_actions)
        def f(st, obs):
            a = networks.actor_mu(params, obs)
            st, out = jax.vmap(env.step)(st, a)
            return st, out.obs
        fn0 = jax.jit(f)
        obs0 = state.obs_stack.reshape(num_envs, -1)
        fn = lambda s: fn0(s, obs0)
        arg = state
    for _ in range(5):
        out = fn(arg)
    jax.block_until_ready(out)

    tracedir = "/tmp/jax_trace"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for _ in range(10):
            out = fn(arg)
        jax.block_until_ready(out)

    # parse xplane
    files = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                # collapse fusion instance suffixes
                base = name.split(".")[0]
                tot[base] += dur
                cnt[base] += 1
    total = sum(tot.values())
    print(f"target={target}; total op-time {total:.2f} ms over 10 iters "
          f"=> {total/10:.2f} ms/iter")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t/10:9.3f} ms/iter  x{cnt[name]:4d}  {name}")


if __name__ == "__main__":
    main()
