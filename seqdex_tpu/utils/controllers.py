"""Deployment / inference controllers.

TPU-native re-implementation of the reference's inference-only stack:
* `NNController` — single policy: rebuild the trained actor, stack 3 obs
  frames, deterministic mu output (`utils/robot_controller/nn_controller.py:
  7-61`, network from `nn_builder.py:15-31`).
* `SeqNNController` — the four sub-policies (dig/spin/grasp/insert) with
  per-policy obs buffers, EMA action smoothing, and policy switching
  (`utils/sequence_controller/nn_controller.py:7-78`).
* `ContactSlamer` — tactile->object-pose belief MLP
  (`utils/sequence_controller/contact_slamer.py`, used by
  `..._tool_positioning_chain.py:1441-1454`).

These run anywhere JAX runs (host CPU on the robot); parameters come from the
.npz policy exports written by `distributed.checkpoint.save_params`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..distributed.checkpoint import load_params
from ..rl import networks


class NNController:
    """Single-policy deterministic controller with 3-frame stacking."""

    def __init__(self, num_obs_frame: int, num_actions: int = 23, stack: int = 3,
                 num_states: int = 1, act_moving_average: float = 1.0):
        self.num_obs_frame = num_obs_frame
        self.stack = stack
        self.num_actions = num_actions
        self.act_moving_average = act_moving_average
        self.params: Optional[networks.ActorCriticParams] = None
        self._template = networks.init_actor_critic(
            jax.random.PRNGKey(0), num_obs_frame * stack, num_states, num_actions
        )
        self._obs_buf = np.zeros((stack, num_obs_frame), dtype=np.float32)
        self._prev_action = np.zeros(num_actions, dtype=np.float32)
        self._fwd = jax.jit(lambda p, o: networks.actor_mu(p, o))

    def load(self, path: str):
        self.params = load_params(path, self._template)
        return self

    def set_params(self, params):
        self.params = params
        return self

    def reset(self):
        self._obs_buf[:] = 0
        self._prev_action[:] = 0

    def predict(self, obs_frame: np.ndarray) -> np.ndarray:
        """obs_frame: (num_obs_frame,) newest observation -> action (A,)."""
        self._obs_buf = np.concatenate(
            [obs_frame[None].astype(np.float32), self._obs_buf[:-1]], axis=0
        )
        mu = np.asarray(self._fwd(self.params, jnp.asarray(self._obs_buf.reshape(-1))))
        action = (
            self.act_moving_average * mu
            + (1.0 - self.act_moving_average) * self._prev_action
        )
        self._prev_action = action
        return np.clip(action, -1.0, 1.0)


class SeqNNController:
    """Four sub-policy controller with switching (dig/spin/grasp/insert)."""

    POLICIES = ("dig", "spin", "grasp", "insert")
    # per-policy single-frame obs sizes (dig 65: search + seg stats,
    # spin/grasp 62, insert 75 — `utils/sequence_controller/nn_controller.py`)
    OBS_DIMS = {"dig": 65, "spin": 62, "grasp": 62, "insert": 75}
    STACKS = {"dig": 3, "spin": 3, "grasp": 3, "insert": 1}

    def __init__(self, act_moving_average: float = 1.0):
        self.controllers: Dict[str, NNController] = {
            name: NNController(
                self.OBS_DIMS[name], stack=self.STACKS[name],
                act_moving_average=act_moving_average,
            )
            for name in self.POLICIES
        }
        self.active = "dig"
        self.slamer: Optional[ContactSlamer] = None

    def load(self, name: str, path: str):
        self.controllers[name].load(path)
        return self

    def select_policy(self, name: str):
        assert name in self.POLICIES, name
        self.active = name
        self.controllers[name].reset()

    def predict(self, obs_frame: np.ndarray) -> np.ndarray:
        return self.controllers[self.active].predict(obs_frame)


class ContactSlamer:
    """Tactile belief state: (contacts 12 + hand q 16) -> object pose (7).

    Mirror of `utils/sequence_controller/contact_slamer.py` (small MLP) with
    an online SGD update hook (`update_contact_slamer`,
    `..._tool_positioning_chain.py:1447-1454`)."""

    IN_DIM = 28
    OUT_DIM = 7
    HIDDEN = (128, 64)

    def __init__(self, seed: int = 0, lr: float = 1e-3):
        self.params = networks.init_mlp(
            jax.random.PRNGKey(seed), self.IN_DIM, self.HIDDEN, self.OUT_DIM
        )
        self.lr = lr
        self._fwd = jax.jit(lambda p, x: networks.mlp_apply(p, x))

        def loss(p, x, y):
            pred = networks.mlp_apply(p, x)
            return jnp.mean((pred - y) ** 2)

        self._grad = jax.jit(jax.value_and_grad(loss))

    def predict_contact_pose(self, contacts: np.ndarray, hand_q: np.ndarray):
        x = jnp.concatenate([jnp.asarray(contacts), jnp.asarray(hand_q)])
        out = np.asarray(self._fwd(self.params, x))
        pos, quat = out[:3], out[3:]
        n = np.linalg.norm(quat)
        return pos, quat / n if n > 1e-8 else np.array([0, 0, 0, 1.0])

    def update(self, contacts, hand_q, true_pose):
        x = jnp.concatenate([jnp.asarray(contacts), jnp.asarray(hand_q)])
        y = jnp.asarray(true_pose)
        loss, grads = self._grad(self.params, x, y)
        self.params = jax.tree_util.tree_map(
            lambda p, g: p - self.lr * g, self.params, grads
        )
        return float(loss)
