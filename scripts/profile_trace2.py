#!/usr/bin/env python
"""Deeper trace analysis: per-line (queue) totals + top individual ops."""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    env = make_grasp_sim_env(GraspSimConfig())
    sim = env.sim
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    fn = jax.jit(jax.vmap(sim.substep))
    arg = state.sim
    for _ in range(5):
        out = fn(arg)
    jax.block_until_ready(out)

    tracedir = "/tmp/jax_trace2"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for _ in range(10):
            out = fn(arg)
        jax.block_until_ready(out)

    files = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        print(f"=== plane: {plane.name}")
        for line in plane.lines:
            tot = 0.0
            n = 0
            per = defaultdict(float)
            for ev in line.events:
                tot += ev.duration_ns / 1e6
                n += 1
                per[ev.name[:110]] += ev.duration_ns / 1e6
            if tot < 1.0:
                continue
            print(f"--- line: {line.name}: total {tot:.1f} ms, {n} events")
            for name, t in sorted(per.items(), key=lambda kv: -kv[1])[:12]:
                print(f"   {t/10:8.3f} ms/iter  {name}")


if __name__ == "__main__":
    main()
