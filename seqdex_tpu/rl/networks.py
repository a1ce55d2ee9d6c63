"""Actor/critic networks matching the reference rl_games architecture.

Reference: `cfg/lego/ppo_continuous_grasp.yaml` — separate actor/critic MLPs
[1024, 512, 256] with ELU, state-independent learned log-std
(`fixed_sigma: True`, `sigma_init val 0`), mu head init scale 0.02, plus an
asymmetric "central value" critic over privileged states with input
normalization (`central_value_config`).

Plain-pytree params (dicts of arrays) — no framework dependency; everything
jits/vmaps/shards trivially and the param pytree maps 1:1 onto optax.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

HIDDEN = (1024, 512, 256)


def _linear_init(key, fan_in, fan_out, scale=None):
    # rl_games 'default' initializer = orthogonal-ish; use lecun/xavier uniform
    kw, kb = jax.random.split(key)
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    if scale is not None:
        limit = scale
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-limit, maxval=limit)
    b = jnp.zeros((fan_out,))
    return {"w": w, "b": b}


def init_mlp(key, in_dim: int, hidden: Sequence[int] = HIDDEN, out_dim: int = None,
             out_scale: float = 0.02):
    keys = jax.random.split(key, len(hidden) + 1)
    layers = []
    d = in_dim
    for k, h in zip(keys[:-1], hidden):
        layers.append(_linear_init(k, d, h))
        d = h
    params = {"layers": layers}
    if out_dim is not None:
        params["head"] = _linear_init(keys[-1], d, out_dim, scale=out_scale)
    return params


def mlp_apply(params, x, activation=jax.nn.elu):
    for layer in params["layers"]:
        x = activation(x @ layer["w"] + layer["b"])
    if "head" in params:
        x = x @ params["head"]["w"] + params["head"]["b"]
    return x


class ActorCriticParams(NamedTuple):
    actor: dict  # mu MLP
    log_std: jnp.ndarray  # (A,) state-independent
    critic: dict  # value MLP over privileged states


def init_actor_critic(key, num_obs: int, num_states: int, num_actions: int,
                      hidden=HIDDEN) -> ActorCriticParams:
    ka, kc = jax.random.split(key)
    return ActorCriticParams(
        actor=init_mlp(ka, num_obs, hidden, num_actions, out_scale=0.02),
        log_std=jnp.zeros(num_actions),
        critic=init_mlp(kc, num_states, hidden, 1, out_scale=0.02),
    )


def actor_mu(params: ActorCriticParams, obs):
    return mlp_apply(params.actor, obs)


def critic_value(params: ActorCriticParams, states):
    return mlp_apply(params.critic, states)[..., 0]


def sample_action(params: ActorCriticParams, obs, key):
    mu = actor_mu(params, obs)
    std = jnp.exp(params.log_std)
    eps = jax.random.normal(key, mu.shape)
    action = mu + std * eps
    logp = gaussian_logprob(mu, params.log_std, action)
    return action, mu, logp


def gaussian_logprob(mu, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mu) / std
    return -0.5 * jnp.sum(z**2 + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1)


def gaussian_kl(mu0, log_std0, mu1, log_std1):
    """KL(N0 || N1), summed over action dims (rl_games adaptive-LR metric)."""
    v0, v1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    return jnp.sum(
        log_std1 - log_std0 + (v0 + (mu0 - mu1) ** 2) / (2 * v1) - 0.5, axis=-1
    )


class RunningNorm(NamedTuple):
    """Running mean/std used by the central-value `normalize_input: True`."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(dim):
        return RunningNorm(jnp.zeros(dim), jnp.ones(dim), jnp.asarray(1e-4))

    def update(self, batch):
        bmean = batch.mean(axis=tuple(range(batch.ndim - 1)))
        bvar = batch.var(axis=tuple(range(batch.ndim - 1)))
        bcount = jnp.asarray(batch.size / batch.shape[-1], dtype=self.count.dtype)
        delta = bmean - self.mean
        tot = self.count + bcount
        new_mean = self.mean + delta * bcount / tot
        m_a = self.var * self.count
        m_b = bvar * bcount
        m2 = m_a + m_b + delta**2 * self.count * bcount / tot
        return RunningNorm(new_mean, m2 / tot, tot)

    def normalize(self, x):
        return jnp.clip((x - self.mean) / jnp.sqrt(self.var + 1e-5), -5.0, 5.0)
