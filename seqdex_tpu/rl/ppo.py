"""PPO (A2C-continuous) trainer — the rl_games replacement.

Re-implements the training semantics the reference gets from rl_games 1.5.2
(`train_rlgames.py:90-94`, `cfg/lego/ppo_continuous_grasp.yaml`):
  * rollout `horizon_length` steps over all envs (here: one `lax.scan` whose
    body inlines policy inference AND the physics step — sim + NN in one XLA
    program, no host round-trips),
  * GAE(gamma, tau) with value bootstrap,
  * `mini_epochs` x minibatched clipped-PPO updates with clipped value loss,
    bounds loss, grad-norm clipping,
  * adaptive learning rate on the KL threshold (`lr_schedule: adaptive`,
    `kl_threshold: 0.02`),
  * asymmetric central-value critic over privileged states with input
    normalization (`central_value_config`).

Multi-chip: the env axis is data-parallel. All cross-chip reductions
(advantage statistics, gradient means, KL) go through `jax.lax.pmean` when
`axis_name` is set — the trainer body is written once and used both
single-device (axis_name=None) and under `shard_map` over a mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..envs.base import Env
from . import networks
from .networks import ActorCriticParams, RunningNorm


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 1024
    horizon: int = 8  # horizon_length
    gamma: float = 0.99
    tau: float = 0.95  # GAE lambda
    learning_rate: float = 3e-4
    critic_learning_rate: float = 1e-3
    kl_threshold: float = 0.02
    e_clip: float = 0.1
    mini_epochs: int = 5
    num_minibatches: int = 4
    grad_norm: float = 1.0
    # small entropy bonus + a log-std floor: arrests the round-2 policy
    # collapse (exploration noise shrank until the success rate drifted
    # down while reward kept climbing); rl_games runs entropy_coef 0 but
    # its separate sigma parameterization rarely collapses this way
    entropy_coef: float = 1e-3
    log_std_min: float = -3.0
    log_std_max: float = 1.0
    critic_coef: float = 1.0  # used when critic trained jointly
    bounds_loss_coef: float = 0.001
    clip_value: bool = True
    normalize_advantage: bool = True
    normalize_value_input: bool = True
    lr_min: float = 1e-6
    lr_max: float = 1e-2


class TrainState(NamedTuple):
    params: ActorCriticParams
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    lr: jnp.ndarray  # adaptive actor lr
    critic_lr: jnp.ndarray
    value_norm: RunningNorm
    env_state: object  # batched TaskState pytree
    last_obs: jnp.ndarray  # (N, obs)
    last_states: jnp.ndarray  # (N, states)
    key: jnp.ndarray
    epoch: jnp.ndarray
    # shared runtime env context (reservoir contents, T-value params — see
    # envs/base.Env.init_ctx). A runtime ARG of train_epoch: swapping it
    # between epochs/bi-opt iterations does NOT recompile. None for
    # ctx-unaware envs.
    env_ctx: object = None


class Rollout(NamedTuple):
    obs: jnp.ndarray  # (T, N, O)
    states: jnp.ndarray  # (T, N, S)
    actions: jnp.ndarray  # (T, N, A)
    logp: jnp.ndarray  # (T, N)
    mu: jnp.ndarray  # (T, N, A)
    rewards: jnp.ndarray  # (T, N)
    dones: jnp.ndarray  # (T, N)
    values: jnp.ndarray  # (T, N)
    successes: jnp.ndarray  # (T, N)


def make_ppo(env: Env, cfg: PPOConfig, axis_name: Optional[str] = None):
    """Returns (init_fn, train_epoch_fn, act_fn)."""

    has_ctx = env.init_ctx is not None

    if has_ctx:
        batched_reset = jax.vmap(env.reset_ctx, in_axes=(0, None))

        def _slim_step(state, action, ctx):
            state, out = env.step_ctx(state, action, ctx)
            return state, out._replace(info={"successes": out.info["successes"]})

        batched_step = jax.vmap(_slim_step, in_axes=(0, 0, None))
    else:
        batched_reset = jax.vmap(env.reset)

        def _slim_step(state, action):
            # the trainer consumes only info["successes"]; dropping the chain
            # handoff info (terminal snapshots, T-value rows) BEFORE tracing
            # keeps the dead outputs out of the jaxpr — they otherwise inflate
            # the GSPMD partition/compile time of the training program several-
            # fold (the collectors that need them call env.step directly)
            state, out = env.step(state, action)
            return state, out._replace(info={"successes": out.info["successes"]})

        batched_step = jax.vmap(_slim_step)

    actor_optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.scale_by_adam(eps=1e-8),
        optax.scale(-1.0),
    )
    critic_optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.scale_by_adam(eps=1e-8),
        optax.scale(-1.0),
    )

    def _pmean(x):
        if axis_name is None:
            return x
        return jax.lax.pmean(x, axis_name)

    def init(key, env_keys=None, env_ctx=None) -> TrainState:
        kp, ke, kr = jax.random.split(key, 3)
        params = networks.init_actor_critic(
            kp, env.num_obs, env.num_states, env.num_actions
        )
        if env_keys is None:
            env_keys = jax.random.split(ke, cfg.num_envs)
        if has_ctx:
            if env_ctx is None:
                env_ctx = env.init_ctx()
            env_state = batched_reset(env_keys, env_ctx)
        else:
            env_state = batched_reset(env_keys)
        # initial obs come from the freshly reset stacks
        obs = env_state.obs_stack.reshape(cfg.num_envs, -1)
        states = env_state.state_stack.reshape(cfg.num_envs, -1)
        return TrainState(
            params=params,
            actor_opt=actor_optimizer.init((params.actor, params.log_std)),
            critic_opt=critic_optimizer.init(params.critic),
            lr=jnp.float32(cfg.learning_rate),
            critic_lr=jnp.float32(cfg.critic_learning_rate),
            value_norm=RunningNorm.create(env.num_states),
            env_state=env_state,
            last_obs=obs,
            last_states=states,
            key=kr,
            epoch=jnp.int32(0),
            env_ctx=env_ctx,
        )

    def _value(params, value_norm, states):
        s = value_norm.normalize(states) if cfg.normalize_value_input else states
        return networks.critic_value(params, s)

    def rollout(ts: TrainState):
        def scan_body(carry, t):
            env_state, obs, states, key = carry
            key, ka = jax.random.split(key)
            action, mu, logp = networks.sample_action(ts.params, obs, ka)
            value = _value(ts.params, ts.value_norm, states)
            if has_ctx:
                # thread the scan index as a UNIFORM scalar tick — drives
                # the sim's select_every pair-persistence cadence (a
                # per-env counter would batch the lax.cond); tick 0 at
                # every epoch boundary forces a fresh pair selection
                ctx = (dict(ts.env_ctx, tick=t)
                       if isinstance(ts.env_ctx, dict) else ts.env_ctx)
                env_state, out = batched_step(env_state, action, ctx)
            else:
                env_state, out = batched_step(env_state, action)
            rec = Rollout(
                obs=obs, states=states, actions=action, logp=logp, mu=mu,
                rewards=out.reward, dones=out.done.astype(jnp.float32),
                values=value, successes=out.info["successes"],
            )
            return (env_state, out.obs, out.states, key), rec

        (env_state, last_obs, last_states, key), recs = jax.lax.scan(
            scan_body,
            (ts.env_state, ts.last_obs, ts.last_states, ts.key),
            jnp.arange(cfg.horizon),
        )
        return env_state, last_obs, last_states, key, recs

    def compute_gae(recs: Rollout, last_value):
        def scan_body(carry, xs):
            adv_next = carry
            reward, done, value, value_next = xs
            not_done = 1.0 - done
            delta = reward + cfg.gamma * value_next * not_done - value
            adv = delta + cfg.gamma * cfg.tau * not_done * adv_next
            return adv, adv

        values_next = jnp.concatenate([recs.values[1:], last_value[None]], axis=0)
        _, advs = jax.lax.scan(
            scan_body,
            jnp.zeros_like(last_value),
            (recs.rewards, recs.dones, recs.values, values_next),
            reverse=True,
        )
        returns = advs + recs.values
        return advs, returns

    def update(ts: TrainState, recs: Rollout, advs, returns, key):
        T, N = recs.rewards.shape
        batch = T * N
        mb = batch // cfg.num_minibatches

        flat = jax.tree_util.tree_map(lambda x: x.reshape((batch,) + x.shape[2:]), recs)
        advs = advs.reshape(batch)
        returns = returns.reshape(batch)

        if cfg.normalize_advantage:
            mean = _pmean(advs.mean())
            var = _pmean(((advs - mean) ** 2).mean())
            advs = (advs - mean) / jnp.sqrt(var + 1e-8)

        value_norm = (
            ts.value_norm.update(flat.states) if cfg.normalize_value_input else ts.value_norm
        )

        def actor_loss_fn(actor_and_logstd, mb_obs, mb_actions, mb_logp, mb_adv):
            actor, log_std = actor_and_logstd
            mu = networks.mlp_apply(actor, mb_obs)
            logp = networks.gaussian_logprob(mu, log_std, mb_actions)
            ratio = jnp.exp(logp - mb_logp)
            surr1 = ratio * mb_adv
            surr2 = jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip) * mb_adv
            pg_loss = -jnp.minimum(surr1, surr2).mean()
            # rl_games bounds loss on mu
            mu_excess = jnp.clip(mu - 1.1, 0.0, None) ** 2 + jnp.clip(mu + 1.1, None, 0.0) ** 2
            b_loss = mu_excess.sum(-1).mean() * cfg.bounds_loss_coef
            entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            loss = pg_loss + b_loss - cfg.entropy_coef * entropy
            return loss, (mu, log_std)

        def critic_loss_fn(critic, mb_states_n, mb_returns, mb_old_values):
            value = networks.mlp_apply(critic, mb_states_n)[..., 0]
            if cfg.clip_value:
                v_clipped = mb_old_values + jnp.clip(
                    value - mb_old_values, -cfg.e_clip, cfg.e_clip
                )
                v_loss = jnp.maximum(
                    (value - mb_returns) ** 2, (v_clipped - mb_returns) ** 2
                ).mean()
            else:
                v_loss = ((value - mb_returns) ** 2).mean()
            return 0.5 * v_loss

        states_n = (
            value_norm.normalize(flat.states) if cfg.normalize_value_input else flat.states
        )

        def epoch_body(carry, _):
            params, actor_opt, critic_opt, lr, critic_lr, key = carry
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, batch)

            def mb_body(carry, mb_idx):
                params, actor_opt, critic_opt, kl_acc = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb, mb)
                mb_obs = flat.obs[idx]
                mb_actions = flat.actions[idx]
                mb_logp = flat.logp[idx]
                mb_mu_old = flat.mu[idx]
                mb_adv = advs[idx]
                mb_states_n = states_n[idx]
                mb_returns = returns[idx]
                mb_old_values = flat.values[idx]

                (a_loss, (mu, log_std)), a_grads = jax.value_and_grad(
                    actor_loss_fn, has_aux=True
                )((params.actor, params.log_std), mb_obs, mb_actions, mb_logp, mb_adv)
                a_grads = _pmean(a_grads)
                a_updates, actor_opt = actor_optimizer.update(
                    a_grads, actor_opt, (params.actor, params.log_std)
                )
                a_updates = jax.tree_util.tree_map(lambda u: lr * u, a_updates)
                new_actor, new_log_std = optax.apply_updates(
                    (params.actor, params.log_std), a_updates
                )
                new_log_std = jnp.clip(
                    new_log_std, cfg.log_std_min, cfg.log_std_max)

                c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
                    params.critic, mb_states_n, mb_returns, mb_old_values
                )
                c_grads = _pmean(c_grads)
                c_updates, critic_opt = critic_optimizer.update(
                    c_grads, critic_opt, params.critic
                )
                c_updates = jax.tree_util.tree_map(lambda u: critic_lr * u, c_updates)
                new_critic = optax.apply_updates(params.critic, c_updates)

                kl = networks.gaussian_kl(
                    mu, log_std, mb_mu_old, params.log_std
                ).mean()
                kl = _pmean(kl)
                params = ActorCriticParams(new_actor, new_log_std, new_critic)
                return (params, actor_opt, critic_opt, kl_acc + kl), None

            (params, actor_opt, critic_opt, kl_sum), _ = jax.lax.scan(
                mb_body,
                (params, actor_opt, critic_opt, jnp.float32(0.0)),
                jnp.arange(cfg.num_minibatches),
            )
            kl_mean = kl_sum / cfg.num_minibatches
            # rl_games adaptive schedule
            lr = jnp.where(kl_mean > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
            lr = jnp.where(kl_mean < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
            lr = jnp.clip(lr, cfg.lr_min, cfg.lr_max)
            critic_lr_new = jnp.where(kl_mean > 2.0 * cfg.kl_threshold, critic_lr / 1.5, critic_lr)
            critic_lr_new = jnp.where(kl_mean < 0.5 * cfg.kl_threshold, critic_lr_new * 1.5, critic_lr_new)
            critic_lr_new = jnp.clip(critic_lr_new, cfg.lr_min, cfg.lr_max)
            return (params, actor_opt, critic_opt, lr, critic_lr_new, key), kl_mean

        (params, actor_opt, critic_opt, lr, critic_lr, key), kls = jax.lax.scan(
            epoch_body,
            (ts.params, ts.actor_opt, ts.critic_opt, ts.lr, ts.critic_lr, key),
            None,
            length=cfg.mini_epochs,
        )
        return ts._replace(
            params=params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            lr=lr,
            critic_lr=critic_lr,
            value_norm=value_norm,
        ), kls[-1]

    def train_epoch(ts: TrainState):
        env_state, last_obs, last_states, key, recs = rollout(ts)
        last_value = _value(ts.params, ts.value_norm, last_states)
        advs, returns = compute_gae(recs, last_value)
        ts = ts._replace(env_state=env_state, last_obs=last_obs, last_states=last_states)
        # split BEFORE update so the next epoch's rollout key is independent
        # of update()'s internal minibatch-permutation stream
        key_update, knext = jax.random.split(key)
        ts, kl = update(ts, recs, advs, returns, key_update)
        metrics = {
            "reward_mean": _pmean(recs.rewards.mean()),
            "reward_sum_per_env": _pmean(recs.rewards.sum(0).mean()),
            "done_rate": _pmean(recs.dones.mean()),
            "success_rate": _pmean(recs.successes.mean()),
            "kl": kl,
            "lr": ts.lr,
            "value_mean": _pmean(recs.values.mean()),
        }
        return ts._replace(key=knext, epoch=ts.epoch + 1), metrics

    def act(params, obs):
        """Deterministic policy (rl_games player `deterministic: True`)."""
        return networks.actor_mu(params, obs)

    return init, train_epoch, act
