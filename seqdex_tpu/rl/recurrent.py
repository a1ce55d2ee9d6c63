"""Recurrent (LSTM) actor/critic — the rl_games `rnn:` network family.

Reference: `cfg/lego/ppo_continuous_lstm.yaml` (network.rnn block: lstm,
512 units, 1 layer, after the MLP trunk, `concat_input: True`) and the
rl_games builder path mirrored at `utils/rl_games_custom.py:110-117`
(rnn_in_size = mlp_out [+ input when concat_input], out_size = rnn_units).

The TPU-native shape: an `lax.scan`-able cell. `apply` consumes one frame
and a carry; rollouts thread the carry through the env scan, and the PPO
update replays sequences of `seq_length` frames (rl_games `seq_length: 4`)
from stored initial carries. Plain-pytree params like `networks.py`.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import networks


class LSTMCarry(NamedTuple):
    h: jnp.ndarray  # (..., units)
    c: jnp.ndarray  # (..., units)


def init_lstm_cell(key, in_dim: int, units: int):
    # one fused kernel for the 4 gates (i, f, g, o) — a single (in+units,
    # 4*units) matmul keeps the step MXU-friendly
    kw, kh = jax.random.split(key)
    limit = jnp.sqrt(6.0 / (in_dim + units + 4 * units))
    return {
        "wx": jax.random.uniform(kw, (in_dim, 4 * units), minval=-limit, maxval=limit),
        "wh": jax.random.uniform(kh, (units, 4 * units), minval=-limit, maxval=limit),
        # forget-gate bias 1.0: standard LSTM init (matches torch defaults
        # closely enough for training parity)
        "b": jnp.zeros((4 * units,)).at[units : 2 * units].set(1.0),
    }


def lstm_step(params, carry: LSTMCarry, x) -> Tuple[LSTMCarry, jnp.ndarray]:
    gates = x @ params["wx"] + carry.h @ params["wh"] + params["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * carry.c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return LSTMCarry(h, c), h


class RecurrentACParams(NamedTuple):
    actor_mlp: dict
    actor_lstm: dict
    actor_head: dict
    log_std: jnp.ndarray
    critic_mlp: dict
    critic_lstm: dict
    critic_head: dict


def init_recurrent_actor_critic(
    key,
    num_obs: int,
    num_states: int,
    num_actions: int,
    hidden: Sequence[int] = (1024, 1024),
    units: int = 512,
    concat_input: bool = True,
) -> RecurrentACParams:
    ka, kal, kah, kc, kcl, kch = jax.random.split(key, 6)
    rnn_in = hidden[-1] + (num_obs if concat_input else 0)
    rnn_in_c = hidden[-1] + (num_states if concat_input else 0)
    return RecurrentACParams(
        actor_mlp=networks.init_mlp(ka, num_obs, hidden),
        actor_lstm=init_lstm_cell(kal, rnn_in, units),
        actor_head=networks._linear_init(kah, units, num_actions, scale=0.02),
        log_std=jnp.zeros(num_actions),
        critic_mlp=networks.init_mlp(kc, num_states, hidden),
        critic_lstm=init_lstm_cell(kcl, rnn_in_c, units),
        critic_head=networks._linear_init(kch, units, 1, scale=0.02),
    )


def initial_carry(params: RecurrentACParams, batch_shape=()) -> dict:
    ua = params.actor_lstm["wh"].shape[0]
    uc = params.critic_lstm["wh"].shape[0]
    z = lambda u: jnp.zeros(batch_shape + (u,))
    return {
        "actor": LSTMCarry(z(ua), z(ua)),
        "critic": LSTMCarry(z(uc), z(uc)),
    }


def actor_mu(params: RecurrentACParams, carry, obs, concat_input: bool = True):
    """One control frame: MLP trunk -> (concat obs) -> LSTM -> mu head.

    Returns (new_carry, mu). Thread `carry` through the rollout scan; reset
    it to `initial_carry` slices where envs reset (masked `jnp.where`).
    """
    x = networks.mlp_apply(params.actor_mlp, obs)
    if concat_input:
        x = jnp.concatenate([x, obs], axis=-1)
    new_a, h = lstm_step(params.actor_lstm, carry["actor"], x)
    mu = h @ params.actor_head["w"] + params.actor_head["b"]
    return {**carry, "actor": new_a}, mu


def critic_value(params: RecurrentACParams, carry, states, concat_input: bool = True):
    x = networks.mlp_apply(params.critic_mlp, states)
    if concat_input:
        x = jnp.concatenate([x, states], axis=-1)
    new_c, h = lstm_step(params.critic_lstm, carry["critic"], x)
    v = (h @ params.critic_head["w"] + params.critic_head["b"])[..., 0]
    return {**carry, "critic": new_c}, v


def reset_carry(carry: dict, reset_mask, init_carry: dict) -> dict:
    """Zero the recurrent state of envs that just reset (mask shape (N,))."""
    m = reset_mask[..., None].astype(jnp.float32)
    return jax.tree_util.tree_map(
        lambda c, i: jnp.where(m > 0, i, c), carry, init_carry
    )


def unroll(params: RecurrentACParams, carry, obs_seq, states_seq,
           done_seq=None, concat_input: bool = True):
    """Replay a (T, N, D) sequence from a stored initial carry — the PPO
    update path (rl_games `seq_length: 4` minibatch replay).

    done_seq: optional (T, N) episode-boundary flags, aligned so that
    done_seq[t] is the done flag of frame t-1 (prev-dones): the carry is
    reset BEFORE processing frame t when its predecessor ended an episode.
    rl_games' RNN path zeroes the hidden state at dones during replay;
    without the mask a done inside a stored sequence would leak hidden state
    across episodes and make replayed mu/value diverge from rollout-time
    behaviour, biasing the PPO update."""
    init = initial_carry(params, carry["actor"].h.shape[:-1])

    def step(c, xs):
        if done_seq is None:
            o, s = xs
        else:
            o, s, d = xs
            c = reset_carry(c, d, init)
        c, mu = actor_mu(params, c, o, concat_input)
        c, v = critic_value(params, c, s, concat_input)
        return c, (mu, v)

    xs = (obs_seq, states_seq) if done_seq is None else (
        obs_seq, states_seq, done_seq)
    carry, (mus, vs) = jax.lax.scan(step, carry, xs)
    return carry, mus, vs
