"""LSTM actor/critic (rl_games `rnn:` family, cfg/lego/ppo_continuous_lstm.yaml)."""

import jax
import jax.numpy as jnp
import numpy as np

from seqdex_tpu.rl import recurrent


def _params():
    return recurrent.init_recurrent_actor_critic(
        jax.random.PRNGKey(0), num_obs=12, num_states=20, num_actions=5,
        hidden=(32, 32), units=16,
    )


def test_shapes_and_carry_update():
    p = _params()
    carry = recurrent.initial_carry(p, (7,))
    obs = jnp.ones((7, 12))
    states = jnp.ones((7, 20))
    c1, mu = recurrent.actor_mu(p, carry, obs)
    c2, v = recurrent.critic_value(p, c1, states)
    assert mu.shape == (7, 5) and v.shape == (7,)
    # carry actually changed
    assert not np.allclose(np.asarray(c2["actor"].h), 0.0)
    assert not np.allclose(np.asarray(c2["critic"].h), 0.0)


def test_statefulness():
    """Same obs, different carry -> different mu (the point of the RNN)."""
    p = _params()
    obs = jnp.ones((1, 12))
    c0 = recurrent.initial_carry(p, (1,))
    c1, mu1 = recurrent.actor_mu(p, c0, obs)
    c2, mu2 = recurrent.actor_mu(p, c1, obs)
    assert not np.allclose(np.asarray(mu1), np.asarray(mu2))


def test_reset_carry_masks_only_reset_envs():
    p = _params()
    c0 = recurrent.initial_carry(p, (4,))
    c1, _ = recurrent.actor_mu(p, c0, jnp.ones((4, 12)))
    mask = jnp.array([1.0, 0.0, 1.0, 0.0])
    c2 = recurrent.reset_carry(c1, mask, c0)
    h = np.asarray(c2["actor"].h)
    assert np.allclose(h[0], 0) and np.allclose(h[2], 0)
    assert not np.allclose(h[1], 0) and not np.allclose(h[3], 0)


def test_unroll_matches_stepwise():
    p = _params()
    T, N = 4, 3
    key = jax.random.PRNGKey(1)
    obs_seq = jax.random.normal(key, (T, N, 12))
    st_seq = jax.random.normal(key, (T, N, 20))
    c0 = recurrent.initial_carry(p, (N,))
    _, mus, vs = recurrent.unroll(p, c0, obs_seq, st_seq)
    c = c0
    for t in range(T):
        c, mu = recurrent.actor_mu(p, c, obs_seq[t])
        c, v = recurrent.critic_value(p, c, st_seq[t])
        np.testing.assert_allclose(np.asarray(mus[t]), np.asarray(mu), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vs[t]), np.asarray(v), rtol=1e-5, atol=1e-6)


def test_jit_and_vmap():
    p = _params()
    c0 = recurrent.initial_carry(p, (5,))
    f = jax.jit(lambda c, o: recurrent.actor_mu(p, c, o))
    c1, mu = f(c0, jnp.zeros((5, 12)))
    assert np.all(np.isfinite(np.asarray(mu)))
