"""Recurrent PPO (rl_games rnn family) — learning + replay consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from seqdex_tpu.rl.ppo import PPOConfig
from seqdex_tpu.rl.ppo_lstm import make_recurrent_ppo
from tests.test_ppo import make_toy_env


def test_recurrent_train_epoch_runs_and_improves():
    env = make_toy_env(obs_dim=6, act_dim=2, ep_len=10)
    cfg = PPOConfig(num_envs=16, horizon=8, num_minibatches=2, mini_epochs=2,
                    learning_rate=5e-3)
    init, train_epoch, act = make_recurrent_ppo(env, cfg, units=16,
                                                hidden=(32, 32))
    ts = init(jax.random.PRNGKey(0))
    train_epoch = jax.jit(train_epoch)
    ts, m0 = train_epoch(ts)
    first = float(m0["reward_mean"])
    for _ in range(40):
        ts, m = train_epoch(ts)
    assert np.isfinite(float(m["reward_mean"]))
    assert float(m["reward_mean"]) > first  # reward improves on the toy task
    assert float(m["kl"]) >= 0.0


def test_recurrent_carry_persists_across_epochs():
    env = make_toy_env(obs_dim=6, act_dim=2, ep_len=50)  # longer than horizon
    cfg = PPOConfig(num_envs=4, horizon=4, num_minibatches=1, mini_epochs=1)
    init, train_epoch, act = make_recurrent_ppo(env, cfg, units=8,
                                               hidden=(16,))
    ts = init(jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(ts.carry["actor"].h), 0.0)
    ts, _ = jax.jit(train_epoch)(ts)
    # hidden state carried out of the rollout is nonzero (no episode ended)
    assert not np.allclose(np.asarray(ts.carry["actor"].h), 0.0)


def test_unroll_done_masking_matches_fresh_start():
    """A done inside a replayed sequence must behave as a fresh episode:
    outputs after the boundary equal an unroll started from the initial
    carry (the rl_games RNN-replay semantics the done mask restores)."""
    from seqdex_tpu.rl import recurrent

    p = recurrent.init_recurrent_actor_critic(
        jax.random.PRNGKey(0), num_obs=5, num_states=7, num_actions=2,
        hidden=(16,), units=8)
    T, N = 6, 3
    key = jax.random.PRNGKey(2)
    obs = jax.random.normal(key, (T, N, 5))
    sts = jax.random.normal(key, (T, N, 7))
    # episode boundary before frame 3 (prev_dones[3] = 1)
    dones = jnp.zeros((T, N)).at[3].set(1.0)
    c0 = recurrent.initial_carry(p, (N,))
    _, mus, vs = recurrent.unroll(p, c0, obs, sts, dones)
    # reference: unroll frames 3.. from a fresh carry
    _, mus_ref, vs_ref = recurrent.unroll(p, c0, obs[3:], sts[3:])
    np.testing.assert_allclose(np.asarray(mus[3:]), np.asarray(mus_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs[3:]), np.asarray(vs_ref),
                               rtol=1e-5, atol=1e-6)
    # and WITHOUT the mask they differ (the leak the mask prevents)
    _, mus_leak, _ = recurrent.unroll(p, c0, obs, sts)
    assert not np.allclose(np.asarray(mus_leak[3:]), np.asarray(mus_ref),
                           atol=1e-6)
