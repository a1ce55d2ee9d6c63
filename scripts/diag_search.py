#!/usr/bin/env python
"""Diagnose the Search at-done-success gap: per-step success fraction,
pixel-count trajectory, and target-lift trace over one episode with the
trained policy (stochastic, the training distribution)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.distributed.checkpoint import load_params
from seqdex_tpu.envs.block_assembly.search import SearchConfig, make_search_env
from seqdex_tpu.rl import networks

N = int(os.environ.get("N", "128"))
CK = os.environ.get("CK", "runs/search_r5/BlockAssemblySearch_best.npz")

env = make_search_env(SearchConfig())
tmpl = networks.init_actor_critic(
    jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions)
params = load_params(CK, tmpl)
print("log_std mean/max:", float(params.log_std.mean()),
      float(params.log_std.max()), flush=True)


def act(obs, k):
    a, _, _ = networks.sample_action(params, obs, k)
    return a


step = jax.jit(lambda s, obs, k: jax.vmap(env.step)(s, act(obs, k)))
keys = jax.random.split(jax.random.PRNGKey(0), N)
state = jax.jit(jax.vmap(env.reset))(keys)
obs = state.obs_stack.reshape(N, -1)
akey = jax.random.PRNGKey(1)
rows = []
for t in range(env.episode_length + 1):
    akey, k = jax.random.split(akey)
    state, out = step(state, obs, k)
    obs = out.obs
    info = out.info
    rows.append((
        float(jnp.mean(info["successes"])),
        float(jnp.mean(info["pixel_count"])),
        float(jnp.max(info["pixel_count"])),
        float(jnp.mean(info["lift_z"])),
        float(jnp.max(info["lift_z"])),
        float(jnp.mean(out.reward)),
        float(jnp.mean(out.done)),
    ))
for t in range(0, len(rows), 5):
    s, pc, pcm, lz, lzm, r, d = rows[t]
    print(f"t={t:3d} succ={s:.3f} px_mean={pc:6.1f} px_max={pcm:6.1f} "
          f"lift_mean={lz:+.4f} lift_max={lzm:+.4f} rew={r:+8.2f} done={d:.2f}",
          flush=True)
s, pc, pcm, lz, lzm, r, d = rows[-2]
print(f"FINAL-1 succ={s:.3f} px_mean={pc:.1f}")
s, pc, pcm, lz, lzm, r, d = rows[-1]
print(f"FINAL   succ={s:.3f} px_mean={pc:.1f} done={d}")
