"""Two-policy joint fine-tuning (PolicySequencingRunner).

TPU-native re-implementation of `policy_sequencing/policy_seq_runner.py`
(414 LoC): a *before* and an *after* sub-policy act in one episode — who acts
is decided by the env's progress counter (`task.progress_buf[0] < 100`,
`:206-211,228-270`); experience is routed to per-agent buffers, each agent
gets its own GAE and clipped-PPO updates (`:278-343`).

Functional formulation: ONE scan rollout where the action is a per-env
`jnp.where(progress < switch, a_before, a_after)` select; per-agent sample
masks weight the PPO losses — no branching, no per-agent buffers, both
updates happen every epoch over the shared batch (an agent with zero mask
contributes zero gradient).

Per-agent observation routing: the reference feeds each agent its OWN obs
stream via `infos["before_obs"/"after_obs"]` (`policy_seq_runner.py:240-264`)
so the two stages can have different obs spaces (e.g. Search 62 vs GraspSim
132). Set `PolicySeqConfig.obs_keys = ("before_obs", "after_obs")` and have
the env emit those keys in `info`; each agent then acts/updates on its own
stream (the default `None` keeps the shared-stream behaviour for same-space
stages).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.base import Env
from ..rl import networks
from ..rl.networks import ActorCriticParams
from ..rl.ppo import PPOConfig


@dataclasses.dataclass(frozen=True)
class PolicySeqConfig:
    num_envs: int = 512
    horizon: int = 8
    switch_step: int = 100  # progress threshold (`policy_seq_runner.py:206`)
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    e_clip: float = 0.1
    mini_epochs: int = 5
    grad_norm: float = 1.0
    # info keys carrying per-agent obs streams (`policy_seq_runner.py:240-264`);
    # None = both agents share the env's default obs
    obs_keys: tuple = None


class SeqTrainState(NamedTuple):
    before: ActorCriticParams
    after: ActorCriticParams
    before_opt: optax.OptState
    after_opt: optax.OptState
    env_state: object
    last_obs: jnp.ndarray  # before-agent stream
    last_obs_after: jnp.ndarray  # after-agent stream (== last_obs when shared)
    last_states: jnp.ndarray
    last_progress: jnp.ndarray  # (N,)
    key: jnp.ndarray


def make_policy_seq(env: Env, cfg: PolicySeqConfig):
    batched_reset = jax.vmap(env.reset)
    batched_step = jax.vmap(env.step)
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.adam(cfg.learning_rate),
    )

    def init(key, before: ActorCriticParams, after: ActorCriticParams) -> SeqTrainState:
        ke, kr = jax.random.split(key)
        env_state = batched_reset(jax.random.split(ke, cfg.num_envs))
        obs0 = env_state.obs_stack.reshape(cfg.num_envs, -1)
        if cfg.obs_keys is not None:
            # per-agent streams appear in step info; bootstrap with zeros of
            # each agent's input width (stacks are zero-filled at reset too)
            def in_dim(params):
                return params.actor["layers"][0]["w"].shape[0]

            obs_b = jnp.zeros((cfg.num_envs, in_dim(before)))
            obs_a = jnp.zeros((cfg.num_envs, in_dim(after)))
        else:
            obs_b = obs0
            obs_a = obs0
        return SeqTrainState(
            before=before,
            after=after,
            before_opt=optimizer.init(before),
            after_opt=optimizer.init(after),
            env_state=env_state,
            last_obs=obs_b,
            last_obs_after=obs_a,
            last_states=env_state.state_stack.reshape(cfg.num_envs, -1),
            last_progress=jnp.zeros(cfg.num_envs, dtype=jnp.int32),
            key=kr,
        )

    def rollout(ts: SeqTrainState):
        def body(carry, _):
            env_state, obs_b, obs_a, states, progress, key = carry
            key, kb, ka = jax.random.split(key, 3)
            is_before = progress < cfg.switch_step  # (N,)
            ab, mub, lpb = networks.sample_action(ts.before, obs_b, kb)
            aa, mua, lpa = networks.sample_action(ts.after, obs_a, ka)
            action = jnp.where(is_before[:, None], ab, aa)
            logp = jnp.where(is_before, lpb, lpa)
            vb = networks.critic_value(ts.before, states)
            va = networks.critic_value(ts.after, states)
            value = jnp.where(is_before, vb, va)
            env_state, out = batched_step(env_state, action)
            if cfg.obs_keys is not None:
                next_b = out.info[cfg.obs_keys[0]]
                next_a = out.info[cfg.obs_keys[1]]
            else:
                next_b = out.obs
                next_a = out.obs
            rec = dict(
                obs=obs_b, obs_after=obs_a, states=states, actions=action,
                logp=logp, mu_before=mub, mu_after=mua,
                rewards=out.reward, dones=out.done.astype(jnp.float32),
                values=value, is_before=is_before.astype(jnp.float32),
            )
            return (env_state, next_b, next_a, out.states,
                    env_state.progress, key), rec

        init_carry = (ts.env_state, ts.last_obs, ts.last_obs_after,
                      ts.last_states, ts.last_progress, ts.key)
        (env_state, obs_b, obs_a, states, progress, key), recs = jax.lax.scan(
            body, init_carry, None, length=cfg.horizon
        )
        return env_state, obs_b, obs_a, states, progress, key, recs

    def gae(recs, last_value):
        def body(adv_next, xs):
            r, d, v, vn = xs
            nd = 1.0 - d
            delta = r + cfg.gamma * vn * nd - v
            adv = delta + cfg.gamma * cfg.tau * nd * adv_next
            return adv, adv

        vn = jnp.concatenate([recs["values"][1:], last_value[None]], axis=0)
        _, advs = jax.lax.scan(
            body, jnp.zeros_like(last_value),
            (recs["rewards"], recs["dones"], recs["values"], vn), reverse=True,
        )
        return advs, advs + recs["values"]

    def agent_update(params, opt_state, batch, mask):
        """Masked clipped-PPO + value update for one agent."""

        def loss_fn(p):
            mu = networks.actor_mu(p, batch["obs"])
            logp = networks.gaussian_logprob(mu, p.log_std, batch["actions"])
            ratio = jnp.exp(logp - batch["logp"])
            surr1 = ratio * batch["advs"]
            surr2 = jnp.clip(ratio, 1 - cfg.e_clip, 1 + cfg.e_clip) * batch["advs"]
            denom = jnp.maximum(mask.sum(), 1.0)
            pg = -jnp.sum(jnp.minimum(surr1, surr2) * mask) / denom
            value = networks.critic_value(p, batch["states"])
            v_loss = jnp.sum((value - batch["returns"]) ** 2 * mask) / denom
            return pg + 0.5 * v_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def train_epoch(ts: SeqTrainState):
        env_state, obs_b, obs_a, states, progress, key, recs = rollout(ts)
        last_is_before = progress < cfg.switch_step
        lv = jnp.where(
            last_is_before,
            networks.critic_value(ts.before, states),
            networks.critic_value(ts.after, states),
        )
        advs, returns = gae(recs, lv)

        flat = {
            k: v.reshape((-1,) + v.shape[2:]) for k, v in recs.items()
        }
        flat["advs"] = (advs - advs.mean()) / (advs.std() + 1e-8)
        flat["advs"] = flat["advs"].reshape(-1)
        flat["returns"] = returns.reshape(-1)
        mask_before = flat.pop("is_before")
        mask_after = 1.0 - mask_before
        obs_after_flat = flat.pop("obs_after")
        batch_before = dict(flat)
        batch_after = dict(flat)
        batch_after["obs"] = obs_after_flat

        before, before_opt = ts.before, ts.before_opt
        after, after_opt = ts.after, ts.after_opt
        for _ in range(cfg.mini_epochs):
            before, before_opt, lb = agent_update(
                before, before_opt, batch_before, mask_before)
            after, after_opt, la = agent_update(
                after, after_opt, batch_after, mask_after)

        metrics = {
            "reward_mean": recs["rewards"].mean(),
            "before_frac": mask_before.mean(),
            "loss_before": lb,
            "loss_after": la,
        }
        key, knext = jax.random.split(key)
        return (
            ts._replace(
                before=before, after=after,
                before_opt=before_opt, after_opt=after_opt,
                env_state=env_state, last_obs=obs_b, last_obs_after=obs_a,
                last_states=states,
                last_progress=progress, key=knext,
            ),
            metrics,
        )

    return init, train_epoch
