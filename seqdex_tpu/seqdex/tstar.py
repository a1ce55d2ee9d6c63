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


def make_online_hook(env, num_envs: int = 16,
                     cfg: TStarConfig = TStarConfig(probe_steps=20,
                                                    trigger_step=10),
                     seed: int = 0):
    """Stateful `Env.post_epoch_hook` for the TSTAR registry task: every
    invocation rolls fresh envs to the trigger step with the CURRENT policy,
    probes the frozen successor horizon, and BCE-updates the online T-value
    — the reference's in-episode probe training
    (`..._chain_tstar.py:451-469,1666-1735`) relocated to the training
    loop's epoch boundary (the TPU-native placement: the probe is a scan in
    its own jitted program instead of a nested sim inside `step`).

    Returns extra metrics (tstar_loss / tstar_success_frac / tstar_acc)
    merged into the trainer's log — a PureRL run has none of these.
    """
    state = {}
    # reference 23-dim transition-obs protocol (`..._chain_tstar.py:
    # 1667-1670`): [0:16] hand dofs unscaled to [-1, 1], [16:23] the
    # segmentation-target pose (pos + quat) — NOT the raw arm+hand q
    from ..core.math import unscale_from_limits

    art = env.sim.scene.art
    h_lo = jnp.asarray(art.lower[7:23], dtype=jnp.float32)
    h_hi = jnp.asarray(art.upper[7:23], dtype=jnp.float32)

    def _snapshot(st):
        hand = unscale_from_limits(st.sim.q[7:23], h_lo, h_hi)
        return jnp.concatenate(
            [hand, st.sim.body_pos[0], st.sim.body_quat[0]])

    def hook(policy_params, epoch):
        if not state:
            init, pu = make_tstar(
                env, cfg, tvalue_in_dim=23, tvalue_hidden=(256, 128, 64),
                snapshot_fn=_snapshot,
                success_fn=lambda st: st.successes,
            )
            state["ts"] = init(jax.random.PRNGKey(seed + 1))
            state["pu"] = jax.jit(pu)
            state["reset"] = jax.jit(jax.vmap(env.reset))
            state["step"] = jax.jit(
                lambda s, obs, p: jax.vmap(env.step)(
                    s, networks.actor_mu(p, obs)))
        keys = jax.random.split(jax.random.PRNGKey(seed + 2 + epoch), num_envs)
        st = state["reset"](keys)
        obs = st.obs_stack.reshape(num_envs, -1)
        for _ in range(cfg.trigger_step):
            st, out = state["step"](st, obs, policy_params)
            obs = out.obs
        state["ts"], m = state["pu"](state["ts"], st, policy_params)
        snap = jax.vmap(_snapshot)(st)
        conf = tvlib.tvalue_confidence(state["ts"].params, snap)
        lab = jax.vmap(lambda s: s.successes)(st) > 0.5
        pred = conf > 0.5
        acc = jnp.mean(pred == lab)
        # balanced accuracy — robust to one-class probe batches (a trivial
        # always-predict-majority net scores 0.5, not 1.0)
        npos = jnp.maximum(jnp.sum(lab), 1)
        nneg = jnp.maximum(jnp.sum(~lab), 1)
        tpr = jnp.sum(pred & lab) / npos
        tnr = jnp.sum(~pred & ~lab) / nneg
        has_pos = jnp.any(lab)
        has_neg = jnp.any(~lab)
        # balanced accuracy is only MEANINGFUL with both classes present; a
        # one-class probe batch proves nothing about the discriminator, so
        # report NaN rather than a vacuous per-class accuracy (a trivial
        # always-fail predictor must never score 1.0)
        bal = jnp.where(has_pos & has_neg, 0.5 * (tpr + tnr), jnp.nan)
        return {
            "tstar_loss": float(m["loss"]),
            "tstar_success_frac": float(m["success_frac"]),
            "tstar_acc": float(acc),
            "tstar_balanced_acc": float(bal),
        }

    hook.state = state  # exposes the trained T-value (state["ts"].params)
    return hook


def train_tool_chain_tstar(
    num_envs: int = 32,
    rounds: int = 10,
    seed: int = 0,
    env=None,
    policy_params=None,
    cfg: TStarConfig = TStarConfig(probe_steps=20, trigger_step=0),
    log=print,
):
    """ToolPositioningChainTSTAR training harness — the caller the registry
    name points at (`..._chain_tstar.py:451-469`): roll the chain env to the
    trigger step with the (frozen) policy, snapshot the 23-dim transition
    obs (hand q unscaled, `:453-468` input protocol), probe the successor
    policy forward, and BCE-update the online T-value each round.

    Returns (tvalue_train_state, history). Small defaults so the harness is
    testable; production runs pass the full env/probe lengths.
    """
    import numpy as np

    from ..envs.registry import make

    env = env or make("ToolPositioningChainTSTAR")
    if policy_params is None:
        policy_params = networks.init_actor_critic(
            jax.random.PRNGKey(seed), env.num_obs, env.num_states,
            env.num_actions,
        )

    def snapshot_fn(task_state):
        # 23-dim transition obs: unscaled dof positions (`:453-468`)
        return task_state.sim.q[:23]

    def success_fn(task_state):
        return task_state.successes

    init, probe_and_update = make_tstar(
        env, cfg, tvalue_in_dim=23, tvalue_hidden=(256, 128, 64),
        snapshot_fn=snapshot_fn, success_fn=success_fn,
    )
    ts = init(jax.random.PRNGKey(seed + 1))
    probe_and_update = jax.jit(probe_and_update)
    batched_reset = jax.jit(jax.vmap(env.reset))
    batched_step = jax.jit(
        lambda s, obs: jax.vmap(env.step)(
            s, networks.actor_mu(policy_params, obs))
    )

    history = []
    for r in range(rounds):
        keys = jax.random.split(jax.random.PRNGKey(seed + 2 + r), num_envs)
        state = batched_reset(keys)
        obs = state.obs_stack.reshape(num_envs, -1)
        for _ in range(cfg.trigger_step):
            state, out = batched_step(state, obs)
            obs = out.obs
        ts, metrics = probe_and_update(ts, state, policy_params)
        history.append({k: float(v) for k, v in metrics.items()})
        log(f"tstar round {r}: loss={history[-1]['loss']:.4f} "
            f"succ={history[-1]['success_frac']:.3f}")
    return ts, history
