"""Stage-to-stage terminal-state handoff.

Concrete glue between the reservoirs (`seqdex.reservoir`) and the envs'
`reservoir=` reset hooks: samplers expose the exact pytrees each successor
stage consumes, and collectors harvest terminal states from policy rollouts.

Reference semantics being mirrored:
* Search saves heap root states + hand dofs per lego type when enough are
  collected (`search.py:1304-1355`); Orient samples them at reset
  (`orient.py:1603-1617`).
* Orient re-saves "good" (face-up) terminal block poses
  (`orient.py:1462-1515`); GraspSim resets from them.
* GraspSim saves (hand dof, object root) on grasp success
  (`grasp_sim.py:1399-1458`); InsertSim resets from them
  (`insert_sim.py:1448-1455`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..rl import networks
from . import reservoir as reslib


class BlockPoseSampler:
    """reservoir of {pos (3,), rot (4,)} -> (pos, rot); feeds Orient/GraspSim
    resets."""

    TEMPLATE = {"pos": jnp.zeros(3), "rot": jnp.asarray([0.0, 0.0, 0.0, 1.0])}

    def __init__(self, res: Optional[reslib.Reservoir] = None, capacity: int = 4096,
                 num_types: int = 1):
        self.res = res or reslib.create(self.TEMPLATE, capacity, num_types)

    def count(self, type_idx=0) -> int:
        """Host-side bucket fill level (env factories fall back to synthetic
        resets when the consumed bucket is empty)."""
        return int(self.res.count[type_idx])

    def sample(self, key, type_idx=0):
        s = reslib.sample(self.res, key, jnp.int32(type_idx))
        return s["pos"], s["rot"]

    def insert(self, pos, rot, valid, type_idx=None):
        n = pos.shape[0]
        t = type_idx if type_idx is not None else jnp.zeros(n, dtype=jnp.int32)
        self.res = reslib.insert(self.res, {"pos": pos, "rot": rot}, t, valid)
        return self

    def save(self, path):
        reslib.save(path, self.res)

    @classmethod
    def load(cls, path):
        out = cls()
        out.res = reslib.load(path, out.TEMPLATE)
        return out


class GraspTerminalSampler:
    """reservoir of {q (D,), pos (3,), rot (4,)} -> (q, pos, rot); feeds
    InsertSim resets (hand dofs + held-block pose)."""

    def __init__(self, ndof: int = 23, res: Optional[reslib.Reservoir] = None,
                 capacity: int = 4096, num_types: int = 1):
        self.template = {
            "q": jnp.zeros(ndof),
            "pos": jnp.zeros(3),
            "rot": jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        }
        self.res = res or reslib.create(self.template, capacity, num_types)

    def count(self, type_idx=0) -> int:
        return int(self.res.count[type_idx])

    def sample(self, key, type_idx=0):
        s = reslib.sample(self.res, key, jnp.int32(type_idx))
        return s["q"], s["pos"], s["rot"]

    def insert(self, q, pos, rot, valid, type_idx=None):
        n = q.shape[0]
        t = type_idx if type_idx is not None else jnp.zeros(n, dtype=jnp.int32)
        self.res = reslib.insert(self.res, {"q": q, "pos": pos, "rot": rot}, t, valid)
        return self

    def save(self, path):
        reslib.save(path, self.res)

    @classmethod
    def load(cls, path, ndof: int = 23):
        out = cls(ndof=ndof)
        out.res = reslib.load(path, out.template)
        return out


def rollout_collect(env, params, num_envs: int, steps: int, seed: int = 0,
                    keys=(), valid_key: str = "terminal_valid", ctx=None,
                    stochastic: bool = False):
    """Generic host-side chain-data harvest.

    Rolls the policy and, at every step, gathers `info[k] for k in keys`
    rows where `info[valid_key]` is set. This is the TPU-side analog of the
    reference's reset_idx host loops that append terminal states / HDF5
    rows per done env (`search.py:1304-1355`, `orient.py:1462-1515`).
    Returns dict of np arrays (rows = valid events).

    `stochastic=True` samples actions from the policy distribution instead
    of playing the mean — the reference harvests DURING TRAINING rollouts
    (terminal saves live in reset_idx, `search.py:1304-1355`), i.e. under
    the stochastic behavior policy; exploration noise is part of the data
    distribution the successor stage trains on.

    `ctx`: optional runtime env context for ctx-aware envs (defaults to the
    env's factory-time context).
    """
    def act(obs, k):
        if stochastic:
            # raw sampled action, exactly what the training rollout feeds
            # the env (rl/ppo.py:179-184); the env applies its own clipping
            action, _, _ = networks.sample_action(params, obs, k)
            return action
        return networks.actor_mu(params, obs)

    if env.step_ctx is not None:
        if ctx is None:
            ctx = env.init_ctx()
        _step = jax.jit(
            lambda s, obs, c, k: jax.vmap(
                env.step_ctx, in_axes=(0, 0, None))(s, act(obs, k), c))
        step = lambda s, obs, k: _step(s, obs, ctx, k)
        rng = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        state = jax.jit(
            jax.vmap(env.reset_ctx, in_axes=(0, None)))(rng, ctx)
    else:
        step = jax.jit(
            lambda s, obs, k: jax.vmap(env.step)(s, act(obs, k)))
        rng = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        state = jax.jit(jax.vmap(env.reset))(rng)
    obs = np.asarray(state.obs_stack.reshape(num_envs, -1))
    acc = {k: [] for k in keys}
    akey = jax.random.PRNGKey(seed + 7777)
    for _ in range(steps):
        akey, k = jax.random.split(akey)
        state, out = step(state, obs, k)
        obs = out.obs
        valid = np.asarray(out.info[valid_key]).astype(bool)
        if valid.any():
            for k in keys:
                acc[k].append(np.asarray(out.info[k])[valid])
    return {
        k: (np.concatenate(v) if v else np.zeros((0,)))
        for k, v in acc.items()
    }


def split_tvalue_data(data, input_key: str = "tvalue_input",
                      label_key: str = "tvalue_label"):
    """(succ, fail) arrays from a rollout_collect dict — the balanced-class
    dataset layout `TValue_Trainer` consumes (`transition_value_trainer.py:132`)."""
    x = data[input_key]
    y = data[label_key]
    if x.ndim == 0 or len(x) == 0:
        return np.zeros((0, 1)), np.zeros((0, 1))
    succ = x[y >= 0.5]
    fail = x[y < 0.5]
    return succ, fail


def collect_terminals(
    env,
    params,
    sampler,
    num_envs: int,
    steps: int,
    target_body: int = 0,
    seed: int = 0,
    min_success: float = 0.5,
):
    """Roll the policy; at every done step, insert (q, block pose) of
    successful envs into the sampler's reservoir. Host loop (collection is
    offline, like the reference's pickle dumps)."""
    step = jax.jit(
        lambda s, obs: jax.vmap(env.step)(s, networks.actor_mu(params, obs))
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    obs = state.obs_stack.reshape(num_envs, -1)
    collected = 0
    for _ in range(steps):
        # capture PRE-step state so the terminal snapshot is the state the
        # done flag refers to
        q = state.sim.q
        pos = state.sim.body_pos[:, target_body]
        rot = state.sim.body_quat[:, target_body]
        state, out = step(state, obs)
        obs = out.obs
        valid = jnp.asarray(out.done) & (jnp.asarray(out.info["successes"]) >= min_success)
        if isinstance(sampler, GraspTerminalSampler):
            sampler.insert(q, pos, rot, valid)
        else:
            sampler.insert(pos, rot, valid)
        collected += int(np.asarray(valid).sum())
    return sampler, collected
