"""Multi-chip (virtual 8-device CPU mesh) data-parallel training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_ppo import make_toy_env


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_train_epoch_sharded_matches_semantics():
    from seqdex_tpu.distributed import mesh as meshlib
    from seqdex_tpu.rl.ppo import PPOConfig, make_ppo

    env = make_toy_env()
    cfg = PPOConfig(num_envs=64, horizon=4, num_minibatches=2, mini_epochs=2)
    init, train_epoch, act = make_ppo(env, cfg)
    ts = init(jax.random.PRNGKey(0))

    mesh = meshlib.make_mesh(8)
    ts_sharded = meshlib.shard_train_state(ts, mesh, cfg.num_envs)
    with mesh:
        ts2, metrics = jax.jit(train_epoch)(ts_sharded)
        jax.block_until_ready(metrics["reward_mean"])
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # env state stays sharded across epochs
    shard_count = len(ts2.env_state.x.sharding.device_set)
    assert shard_count == 8, shard_count
    # params replicated
    leaf = jax.tree_util.tree_leaves(ts2.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_and_single_device_agree():
    """One epoch sharded vs unsharded from identical state -> identical
    metrics (GSPMD must not change the math)."""
    from seqdex_tpu.distributed import mesh as meshlib
    from seqdex_tpu.rl.ppo import PPOConfig, make_ppo

    env = make_toy_env()
    cfg = PPOConfig(num_envs=32, horizon=4, num_minibatches=2, mini_epochs=1)
    init, train_epoch, act = make_ppo(env, cfg)
    ts = init(jax.random.PRNGKey(1))

    _, m_single = jax.jit(train_epoch)(ts)

    mesh = meshlib.make_mesh(8)
    ts_sharded = meshlib.shard_train_state(init(jax.random.PRNGKey(1)), mesh, cfg.num_envs)
    with mesh:
        _, m_sharded = jax.jit(train_epoch)(ts_sharded)

    np.testing.assert_allclose(
        float(m_single["reward_mean"]), float(m_sharded["reward_mean"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m_single["kl"]), float(m_sharded["kl"]), rtol=1e-3, atol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_real_sim_train_epoch_sharded():
    """The REAL physics stack (FK scan, CRBA, SDF narrowphase one-hot
    matmuls, contact-QP fori_loop) under an 8-device data-parallel mesh —
    the compile-small fixture scene, same op mix as the flagship envs."""
    from seqdex_tpu.distributed import mesh as meshlib
    from seqdex_tpu.envs.mini import MiniConfig, make_mini_env
    from seqdex_tpu.rl.ppo import PPOConfig, make_ppo

    env = make_mini_env(MiniConfig())
    cfg = PPOConfig(num_envs=32, horizon=4, num_minibatches=2, mini_epochs=1)
    init, train_epoch, act = make_ppo(env, cfg)
    ts = init(jax.random.PRNGKey(2))

    _, m_single = jax.jit(train_epoch)(ts)

    mesh = meshlib.make_mesh(8)
    ts_sharded = meshlib.shard_train_state(
        init(jax.random.PRNGKey(2)), mesh, cfg.num_envs)
    with mesh:
        ts2, m_sharded = jax.jit(train_epoch)(ts_sharded)
        jax.block_until_ready(m_sharded["reward_mean"])

    # GSPMD must not change the physics or the update math
    np.testing.assert_allclose(
        float(m_single["reward_mean"]), float(m_sharded["reward_mean"]),
        rtol=1e-4)
    np.testing.assert_allclose(
        float(m_single["kl"]), float(m_sharded["kl"]), rtol=1e-3, atol=1e-5)
    # env state (incl. SimState leaves) stays sharded across epochs
    assert len(ts2.env_state.sim.q.sharding.device_set) == 8


def test_reservoir_handoff_samplers():
    from seqdex_tpu.seqdex.handoff import BlockPoseSampler, GraspTerminalSampler

    bp = BlockPoseSampler(capacity=16)
    pos = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    rot = jnp.tile(jnp.asarray([0, 0, 0, 1.0]), (4, 1))
    bp.insert(pos, rot, jnp.asarray([True, True, False, True]))
    assert int(bp.res.count[0]) == 3
    p, r = bp.sample(jax.random.PRNGKey(0))
    assert p.shape == (3,) and r.shape == (4,)

    gt = GraspTerminalSampler(ndof=23, capacity=8)
    q = jnp.ones((4, 23))
    gt.insert(q, pos, rot, jnp.asarray([True, False, True, True]))
    assert int(gt.res.count[0]) == 3
    qq, pp, rr = gt.sample(jax.random.PRNGKey(1))
    assert qq.shape == (23,)
