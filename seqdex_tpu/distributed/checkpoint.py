"""Checkpoint save/restore for PPO training state.

Covers the reference's rl_games checkpoint mechanics (`--checkpoint` /
`--resume` plumbing, `utils/config.py:141-145`; best/periodic saving,
`policy_sequencing/policy_seq_runner.py:147-161`) with orbax when available
and a plain .npz fallback (policy-params-only export for the deployment
controllers, mirroring the released `.pth` files in `scripts/evaluation.py`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_params(path: str, params) -> None:
    """Flat .npz of a params pytree (policy export for inference
    controllers)."""
    flat, _ = jax.tree_util.tree_flatten(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, *[np.asarray(x) for x in flat])


def load_params(path: str, template):
    flat, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(path)
    loaded = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, loaded)


def save_train_state(path: str, ts) -> None:
    """Full TrainState snapshot (params + optimizer + value-norm + env state
    + PRNG key + epoch) for mid-training resume — the reference's
    `--resume`/`load_checkpoint` path (`utils/config.py:141-145`)."""
    flat, _ = jax.tree_util.tree_flatten(ts)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, *[np.asarray(x) for x in flat])


def load_train_state(path: str, template):
    """Restore a TrainState saved by `save_train_state`. `template` must be
    a TrainState with identical structure (same env/PPO config)."""
    flat, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(path)
    assert len(data.files) == len(flat), (
        f"checkpoint has {len(data.files)} leaves, expected {len(flat)} — "
        "env/PPO config mismatch")
    loaded = [
        jnp.asarray(data[f"arr_{i}"]).astype(np.asarray(t).dtype)
        for i, t in enumerate(flat)
    ]
    return jax.tree_util.tree_unflatten(treedef, loaded)


class Checkpointer:
    """Periodic + best checkpointing of the full TrainState (orbax) with
    params-only .npz export alongside."""

    def __init__(self, directory: str, save_every: int = 1000, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        self.best_reward = -np.inf
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=keep),
            )
        else:
            self._mgr = None

    def maybe_save(self, ts, epoch: int, mean_reward: float, name: str = "policy",
                   full_state: bool = False):
        saved = False
        if epoch % self.save_every == 0 and epoch > 0:
            self._save(ts, epoch, name=f"{name}_ep{epoch}")
            if full_state:
                save_train_state(
                    os.path.join(self.directory, f"{name}_resume.npz"), ts)
            saved = True
        if mean_reward > self.best_reward:
            self.best_reward = mean_reward
            save_params(
                os.path.join(self.directory, f"{name}_best.npz"), ts.params
            )
            saved = True
        return saved

    def _save(self, ts, step: int, name: str):
        save_params(os.path.join(self.directory, f"{name}.npz"), ts.params)
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(ts.params)))

    def restore_params(self, template, path: Optional[str] = None):
        path = path or os.path.join(self.directory, "policy_best.npz")
        return load_params(path, template)
