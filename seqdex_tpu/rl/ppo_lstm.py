"""Recurrent (LSTM) PPO — the rl_games `rnn:` training path.

Reference: `cfg/lego/ppo_continuous_lstm.yaml` (lstm 512 after the MLP
trunk, `seq_length: 4`) driven through the same A2C-continuous semantics as
`rl/ppo.py`. rl_games treats SEQUENCES as the minibatch unit and zeroes the
hidden state at episode boundaries during replay; here a sequence is one
env's full horizon (stored initial carry + done-masked `recurrent.unroll`
replay), and minibatches are slices of the env axis.

Multi-chip: identical DP-over-envs story as `make_ppo` — pass `axis_name`
and run under `shard_map`, or shard the env axis and let GSPMD insert the
reductions.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..envs.base import Env
from . import networks, recurrent
from .networks import RunningNorm
from .ppo import PPOConfig


class RecTrainState(NamedTuple):
    params: recurrent.RecurrentACParams
    opt_state: optax.OptState
    lr: jnp.ndarray
    value_norm: RunningNorm
    env_state: object
    last_obs: jnp.ndarray
    last_states: jnp.ndarray
    carry: dict  # rollout-side recurrent state, (N, units) leaves
    prev_done: jnp.ndarray  # (N,) dones of the last emitted step
    key: jnp.ndarray
    epoch: jnp.ndarray


class RecRollout(NamedTuple):
    obs: jnp.ndarray  # (T, N, O)
    states: jnp.ndarray  # (T, N, S)
    actions: jnp.ndarray  # (T, N, A)
    logp: jnp.ndarray  # (T, N)
    mu: jnp.ndarray  # (T, N, A)
    rewards: jnp.ndarray  # (T, N)
    dones: jnp.ndarray  # (T, N)
    prev_dones: jnp.ndarray  # (T, N) — done flag of step t-1 (carry resets)
    values: jnp.ndarray  # (T, N)
    successes: jnp.ndarray


def make_recurrent_ppo(env: Env, cfg: PPOConfig, units: int = 512,
                       hidden=(1024, 1024), axis_name: Optional[str] = None):
    """Returns (init, train_epoch, act) with LSTM actor/critic."""

    batched_reset = jax.vmap(env.reset)

    def _slim_step(state, action):
        # keep only the consumed info key out of the traced program (see
        # the identical wrapper in ppo.py — compile-time discipline)
        state, out = env.step(state, action)
        return state, out._replace(info={"successes": out.info["successes"]})

    batched_step = jax.vmap(_slim_step)

    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.scale_by_adam(eps=1e-8),
        optax.scale(-1.0),
    )

    def _pmean(x):
        if axis_name is None:
            return x
        return jax.lax.pmean(x, axis_name)

    def init(key) -> RecTrainState:
        kp, ke, kr = jax.random.split(key, 3)
        params = recurrent.init_recurrent_actor_critic(
            kp, env.num_obs, env.num_states, env.num_actions,
            hidden=hidden, units=units,
        )
        env_state = batched_reset(jax.random.split(ke, cfg.num_envs))
        obs = env_state.obs_stack.reshape(cfg.num_envs, -1)
        states = env_state.state_stack.reshape(cfg.num_envs, -1)
        return RecTrainState(
            params=params,
            opt_state=optimizer.init(params),
            lr=jnp.float32(cfg.learning_rate),
            value_norm=RunningNorm.create(env.num_states),
            env_state=env_state,
            last_obs=obs,
            last_states=states,
            carry=recurrent.initial_carry(params, (cfg.num_envs,)),
            prev_done=jnp.zeros(cfg.num_envs),
            key=kr,
            epoch=jnp.int32(0),
        )

    def _norm_states(value_norm, states):
        return value_norm.normalize(states) if cfg.normalize_value_input else states

    def rollout(ts: RecTrainState):
        init_c = recurrent.initial_carry(ts.params, (cfg.num_envs,))

        def scan_body(carry_state, _):
            env_state, obs, states, carry, prev_done, key = carry_state
            carry = recurrent.reset_carry(carry, prev_done, init_c)
            key, ka = jax.random.split(key)
            carry, mu = recurrent.actor_mu(ts.params, carry, obs)
            carry, value = recurrent.critic_value(
                ts.params, carry, _norm_states(ts.value_norm, states))
            noise = jax.random.normal(ka, mu.shape)
            std = jnp.exp(ts.params.log_std)
            action = mu + std * noise
            logp = networks.gaussian_logprob(mu, ts.params.log_std, action)
            env_state, out = batched_step(env_state, action)
            rec = RecRollout(
                obs=obs, states=states, actions=action, logp=logp, mu=mu,
                rewards=out.reward, dones=out.done.astype(jnp.float32),
                prev_dones=prev_done, values=value,
                successes=out.info["successes"],
            )
            new_carry_state = (env_state, out.obs, out.states, carry,
                               out.done.astype(jnp.float32), key)
            return new_carry_state, rec

        (env_state, last_obs, last_states, carry, prev_done, key), recs = (
            jax.lax.scan(
                scan_body,
                (ts.env_state, ts.last_obs, ts.last_states, ts.carry,
                 ts.prev_done, ts.key),
                None,
                length=cfg.horizon,
            )
        )
        return env_state, last_obs, last_states, carry, prev_done, key, recs

    def compute_gae(recs: RecRollout, last_value):
        def scan_body(adv_next, xs):
            reward, done, value, value_next = xs
            not_done = 1.0 - done
            delta = reward + cfg.gamma * value_next * not_done - value
            adv = delta + cfg.gamma * cfg.tau * not_done * adv_next
            return adv, adv

        values_next = jnp.concatenate([recs.values[1:], last_value[None]], axis=0)
        _, advs = jax.lax.scan(
            scan_body, jnp.zeros_like(last_value),
            (recs.rewards, recs.dones, recs.values, values_next), reverse=True,
        )
        returns = advs + recs.values
        return advs, returns

    def update(ts: RecTrainState, carry0: dict, recs: RecRollout, advs, returns,
               key):
        N = cfg.num_envs
        mb = N // cfg.num_minibatches

        if cfg.normalize_advantage:
            mean = _pmean(advs.mean())
            var = _pmean(((advs - mean) ** 2).mean())
            advs = (advs - mean) / jnp.sqrt(var + 1e-8)

        value_norm = (
            ts.value_norm.update(recs.states.reshape(-1, env.num_states))
            if cfg.normalize_value_input else ts.value_norm
        )
        states_n = _norm_states(value_norm, recs.states)

        def loss_fn(params, idx):
            # replay the full-horizon sequences of the minibatch envs from
            # their stored initial carries, resetting at episode boundaries
            c0 = jax.tree_util.tree_map(lambda x: x[idx], carry0)
            obs_seq = recs.obs[:, idx]
            st_seq = states_n[:, idx]
            done_seq = recs.prev_dones[:, idx]
            _, mus, vs = recurrent.unroll(params, c0, obs_seq, st_seq, done_seq)
            logp = networks.gaussian_logprob(
                mus, params.log_std, recs.actions[:, idx])
            ratio = jnp.exp(logp - recs.logp[:, idx])
            mb_adv = advs[:, idx]
            surr1 = ratio * mb_adv
            surr2 = jnp.clip(ratio, 1 - cfg.e_clip, 1 + cfg.e_clip) * mb_adv
            pg_loss = -jnp.minimum(surr1, surr2).mean()
            mb_returns = returns[:, idx]
            mb_old_values = recs.values[:, idx]
            if cfg.clip_value:
                v_clip = mb_old_values + jnp.clip(
                    vs - mb_old_values, -cfg.e_clip, cfg.e_clip)
                v_loss = jnp.maximum(
                    (vs - mb_returns) ** 2, (v_clip - mb_returns) ** 2).mean()
            else:
                v_loss = ((vs - mb_returns) ** 2).mean()
            mu_excess = (jnp.clip(mus - 1.1, 0.0, None) ** 2
                         + jnp.clip(mus + 1.1, None, 0.0) ** 2)
            b_loss = mu_excess.sum(-1).mean() * cfg.bounds_loss_coef
            loss = pg_loss + 0.5 * cfg.critic_coef * v_loss + b_loss
            kl = networks.gaussian_kl(
                mus, params.log_std, recs.mu[:, idx], params.log_std).mean()
            return loss, kl

        def epoch_body(carry, _):
            params, opt_state, lr, key = carry
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, N)

            def mb_body(carry, mb_i):
                params, opt_state, kl_acc = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, mb_i * mb, mb)
                (loss, kl), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, idx)
                grads = _pmean(grads)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, kl_acc + _pmean(kl)), None

            (params, opt_state, kl_sum), _ = jax.lax.scan(
                mb_body, (params, opt_state, jnp.float32(0.0)),
                jnp.arange(cfg.num_minibatches))
            kl_mean = kl_sum / cfg.num_minibatches
            lr = jnp.where(kl_mean > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
            lr = jnp.where(kl_mean < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
            lr = jnp.clip(lr, cfg.lr_min, cfg.lr_max)
            return (params, opt_state, lr, key), kl_mean

        (params, opt_state, lr, key), kls = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state, ts.lr, key), None,
            length=cfg.mini_epochs)
        return ts._replace(
            params=params, opt_state=opt_state, lr=lr, value_norm=value_norm,
        ), kls[-1]

    def train_epoch(ts: RecTrainState):
        carry0 = ts.carry  # sequence-start carries for the replay
        prev_done0 = ts.prev_done
        env_state, last_obs, last_states, carry, prev_done, key, recs = rollout(ts)
        # NOTE: unroll() resets on prev_dones[t]; prev_dones[0] is the carry
        # reset applied before frame 0 — fold it in so replay == rollout
        recs = recs._replace(
            prev_dones=recs.prev_dones.at[0].set(prev_done0))
        _, last_value = recurrent.critic_value(
            ts.params, carry, _norm_states(ts.value_norm, last_states))
        advs, returns = compute_gae(recs, last_value)
        ts = ts._replace(env_state=env_state, last_obs=last_obs,
                         last_states=last_states, carry=carry,
                         prev_done=prev_done)
        # split BEFORE update so the next epoch's rollout key is independent
        # of update()'s internal minibatch-permutation stream
        key_update, knext = jax.random.split(key)
        ts, kl = update(ts, carry0, recs, advs, returns, key_update)
        metrics = {
            "reward_mean": _pmean(recs.rewards.mean()),
            "done_rate": _pmean(recs.dones.mean()),
            "success_rate": _pmean(recs.successes.mean()),
            "kl": kl,
            "lr": ts.lr,
            "value_mean": _pmean(recs.values.mean()),
        }
        return ts._replace(key=knext, epoch=ts.epoch + 1), metrics

    def act(params, carry, obs):
        """Deterministic recurrent policy (returns (carry, mu))."""
        return recurrent.actor_mu(params, carry, obs)

    return init, train_epoch, act
