"""T* baseline: ONLINE transition-feasibility learning via probe rollouts.

TPU-native re-implementation of `ToolPositioningChainTSTAR`
(`tasks/tool_positioning/allegro_hand_tool_positioning_chain_tstar.py:
451-469, 1666-1735`): at a trigger step, snapshot the transition observation,
roll the FROZEN successor policy forward from the current physical state for
its full horizon, label the outcome, and BCE-update the T-value on the
(snapshot, label) pair — all inside one jitted program (the probe is a
`lax.scan`, not a second simulator instance).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..rl import networks
from . import tvalue as tvlib


@dataclasses.dataclass(frozen=True)
class TStarConfig:
    probe_steps: int = 125  # successor-policy probe horizon (`:1666-1735`)
    trigger_step: int = 117  # snapshot step (`:451-469`)
    learning_rate: float = 3e-4


def make_tstar(env, cfg: TStarConfig, tvalue_in_dim: int, tvalue_hidden,
               snapshot_fn: Callable, success_fn: Callable):
    """Returns (init, probe_and_update).

    snapshot_fn(task_state) -> (in_dim,) T-value input at the trigger
    success_fn(task_state) -> float success label after the probe
    """
    import optax

    optimizer = optax.adam(cfg.learning_rate)
    batched_step = jax.vmap(env.step)

    def init(key):
        params = tvlib.init_tvalue(key, tvalue_in_dim, tvalue_hidden)
        return tvlib.TValueTrainState(params, optimizer.init(params), jnp.int32(0))

    def probe_and_update(ts: tvlib.TValueTrainState, task_state, policy_params):
        """Run the frozen successor policy from the CURRENT state of every
        env; label outcomes; one BCE step on the (snapshot, label) batch."""
        snap = jax.vmap(snapshot_fn)(task_state)  # (N, in_dim)

        def body(carry, _):
            st = carry
            obs = st.obs_stack.reshape(st.obs_stack.shape[0], -1)
            action = networks.actor_mu(policy_params, obs)
            st, out = batched_step(st, action)
            return st, None

        probed, _ = jax.lax.scan(body, task_state, None, length=cfg.probe_steps)
        labels_bin = jax.vmap(success_fn)(probed)  # (N,)
        labels = jnp.stack([1.0 - labels_bin, labels_bin], axis=-1)

        def loss_fn(params):
            return tvlib.bce_with_logits(tvlib.tvalue_logits(params, snap), labels)

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return (
            tvlib.TValueTrainState(params, opt_state, ts.step + 1),
            {"loss": loss, "success_frac": labels_bin.mean()},
        )

    return init, probe_and_update
