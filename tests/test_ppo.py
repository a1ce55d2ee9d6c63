import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.envs.base import Env, StepOutput
from seqdex_tpu.rl import networks
from seqdex_tpu.rl.ppo import PPOConfig, make_ppo


def make_toy_env(obs_dim=8, act_dim=3, ep_len=20):
    """Tiny analytic env: reward = -|action - f(obs)|^2; obs random walk.

    Uses the same TaskState protocol (obs_stack/state_stack fields) as the
    real envs so the PPO wiring is exercised unchanged.
    """
    from typing import NamedTuple

    class ToyState(NamedTuple):
        x: jnp.ndarray
        t: jnp.ndarray
        key: jnp.ndarray
        obs_stack: jnp.ndarray
        state_stack: jnp.ndarray
        reset_flag: jnp.ndarray

    def obs_of(x):
        return jnp.tile(x, (1,))

    def reset(key):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, (obs_dim,)) * 0.1
        return ToyState(
            x=x, t=jnp.int32(0), key=k2,
            obs_stack=obs_of(x)[None],
            state_stack=obs_of(x)[None],
            reset_flag=jnp.bool_(False),
        )

    def step(state, action):
        fresh = reset(state.key)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(state.reset_flag, (1,) * a.ndim), a, b
            ),
            fresh, state,
        )
        target = jnp.tanh(state.x[:act_dim])
        reward = -jnp.sum((action - target) ** 2)
        k1, k2 = jax.random.split(state.key)
        x = state.x + 0.05 * jax.random.normal(k1, (obs_dim,))
        t = state.t + 1
        done = t >= ep_len
        state = ToyState(
            x=x, t=t, key=k2,
            obs_stack=obs_of(x)[None],
            state_stack=obs_of(x)[None],
            reset_flag=done,
        )
        return state, StepOutput(
            obs=state.obs_stack.reshape(-1),
            states=state.state_stack.reshape(-1),
            reward=reward,
            done=done,
            info={"successes": jnp.float32(0.0)},
        )

    return Env(
        name="toy", num_obs=obs_dim, num_states=obs_dim, num_actions=act_dim,
        episode_length=ep_len, reset=reset, step=step,
    )


def test_networks_shapes():
    p = networks.init_actor_critic(jax.random.PRNGKey(0), 12, 20, 5, hidden=(32, 16))
    mu = networks.actor_mu(p, jnp.zeros((7, 12)))
    assert mu.shape == (7, 5)
    v = networks.critic_value(p, jnp.zeros((7, 20)))
    assert v.shape == (7,)


def test_running_norm():
    rn = networks.RunningNorm.create(3)
    data = jax.random.normal(jax.random.PRNGKey(0), (1000, 3)) * 2.0 + 1.0
    rn = rn.update(data)
    np.testing.assert_allclose(np.asarray(rn.mean), [1, 1, 1], atol=0.3)
    np.testing.assert_allclose(np.asarray(rn.var), [4, 4, 4], atol=1.0)
    z = rn.normalize(data)
    assert abs(float(z.mean())) < 0.1


def test_gaussian_logprob_matches_scipy():
    mu = jnp.array([0.5, -1.0])
    log_std = jnp.array([0.1, -0.3])
    a = jnp.array([0.7, -0.8])
    lp = float(networks.gaussian_logprob(mu, log_std, a))
    import math

    expected = 0.0
    for m, ls, x in zip(mu, log_std, a):
        s = math.exp(ls)
        expected += -0.5 * ((x - m) / s) ** 2 - ls - 0.5 * math.log(2 * math.pi)
    assert abs(lp - expected) < 1e-4


def test_ppo_improves_on_toy_env():
    env = make_toy_env()
    cfg = PPOConfig(num_envs=64, horizon=8, num_minibatches=4, mini_epochs=3)
    init, train_epoch, act = make_ppo(env, cfg)
    ts = init(jax.random.PRNGKey(0))
    train_epoch = jax.jit(train_epoch)
    ts, m0 = train_epoch(ts)
    first = float(m0["reward_mean"])
    for _ in range(40):
        ts, m = train_epoch(ts)
    last = float(m["reward_mean"])
    assert np.isfinite(last)
    assert last > first + 0.2, (first, last)  # clear improvement on toy task
    assert float(m["kl"]) < 1.0


def test_ppo_metrics_finite():
    env = make_toy_env()
    cfg = PPOConfig(num_envs=16, horizon=4, num_minibatches=2, mini_epochs=2)
    init, train_epoch, act = make_ppo(env, cfg)
    ts = init(jax.random.PRNGKey(1))
    ts, m = jax.jit(train_epoch)(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
