"""Demonstration recording for BC distillation.

TPU-native analog of the reference's demo tooling: the imitation VecTask's
`step_collect_demonstration` (`tasks/hand_base/imitation_vec_task.py:146`) and
the robomimic-style HDF5 packer (`utils/saved_as_hdf5.py:22+`). Records
(obs, action, reward, done) streams from policy rollouts into .npz episode
datasets consumable by `utils.gpt_policy.GPTWrapper.train_step`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..rl import networks


def collect_demos(
    env,
    params,
    num_envs: int,
    steps: int,
    out_path: Optional[str] = None,
    seed: int = 0,
    obs_slice: Optional[slice] = None,
):
    """Deterministic policy rollouts -> stacked arrays.

    Returns dict(obs (T, N, O), actions (T, N, A), rewards, dones); writes
    .npz when out_path is given.
    """
    step = jax.jit(
        lambda s, obs: jax.vmap(env.step)(s, networks.actor_mu(params, obs))
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    obs = state.obs_stack.reshape(num_envs, -1)
    traj = {"obs": [], "actions": [], "rewards": [], "dones": []}
    for _ in range(steps):
        action = networks.actor_mu(params, obs)
        state, out = jax.vmap(env.step)(state, action)
        o = np.asarray(obs)
        if obs_slice is not None:
            o = o[:, obs_slice]
        traj["obs"].append(o)
        traj["actions"].append(np.asarray(action))
        traj["rewards"].append(np.asarray(out.reward))
        traj["dones"].append(np.asarray(out.done))
        obs = out.obs
    data = {k: np.stack(v) for k, v in traj.items()}
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        np.savez_compressed(out_path, **data)
    return data


def to_bc_batches(data: dict, context: int = 3, batch_size: int = 64, seed: int = 0):
    """Yield (obs_seq (B, context, O), action (B, A)) batches for GPT BC."""
    obs, actions, dones = data["obs"], data["actions"], data["dones"]
    T, N, O = obs.shape
    rng = np.random.RandomState(seed)
    # valid windows: no done inside the context
    valid = []
    for t in range(context - 1, T):
        window_done = dones[t - context + 1 : t].any(axis=0) if context > 1 else np.zeros(N, bool)
        for n in np.nonzero(~window_done)[0]:
            valid.append((t, n))
    valid = np.array(valid)
    rng.shuffle(valid)
    for i in range(0, len(valid) - batch_size + 1, batch_size):
        idx = valid[i : i + batch_size]
        obs_seq = np.stack([obs[t - context + 1 : t + 1, n] for t, n in idx])
        act = np.stack([actions[t, n] for t, n in idx])
        yield obs_seq, act
