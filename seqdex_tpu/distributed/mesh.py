"""Mesh construction + sharding helpers for DP-over-envs training.

TPU-native replacement for the reference's (dormant) horovod path
(`utils/config.py:232-233`, `utils/rl_games_custom.py:1221-1229`): instead of
process-level data parallelism, ONE pjit program spans all chips; the env
axis of every rollout/state array is sharded over the `dp` mesh axis and
GSPMD inserts the all-reduces (gradient means, advantage statistics) on ICI.

Multi-host: call `initialize()` once per process before building the mesh
(`jax.distributed.initialize`), then `make_mesh()` over the global devices.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "dp"


def initialize(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Multi-host bring-up (no-op in single-process runs)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = env axis, sharded."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(ts, mesh: Mesh, num_envs: int):
    """Place a PPO TrainState: env-axis pytrees sharded, the rest replicated."""
    dp = env_sharding(mesh)
    rep = replicated(mesh)

    def place_env_tree(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, dp)
        return jax.device_put(x, rep)

    env_state = jax.tree_util.tree_map(place_env_tree, ts.env_state)
    ts = ts._replace(
        env_state=env_state,
        last_obs=jax.device_put(ts.last_obs, dp),
        last_states=jax.device_put(ts.last_states, dp),
        params=jax.device_put(ts.params, rep),
        actor_opt=jax.device_put(ts.actor_opt, rep),
        critic_opt=jax.device_put(ts.critic_opt, rep),
        value_norm=jax.device_put(ts.value_norm, rep),
    )
    # shared runtime env context (reservoirs, T-values): replicated
    if getattr(ts, "env_ctx", None) is not None:
        ts = ts._replace(env_ctx=jax.device_put(ts.env_ctx, rep))
    return ts
