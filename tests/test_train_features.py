"""User-reachable-path tests for round-2 wired subsystems: DR engine at
reset, full-TrainState resume, YAML config consumption (VERDICT r1 item 7:
'wire the implemented-but-dead subsystems')."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_ppo import make_toy_env


def test_domain_randomization_samples_physical_scales():
    """GraspSimConfig(randomize=True) must land sampled DR factors in the
    SimState fields the simulator consumes (base_task.py:229-423 schema)."""
    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig,
        make_grasp_sim_env,
    )

    cfg = GraspSimConfig(max_contacts=8, solver_iterations=2, substeps=1,
                         randomize=True)
    env = make_grasp_sim_env(cfg)
    s1 = env.reset(jax.random.PRNGKey(0))
    s2 = env.reset(jax.random.PRNGKey(1))
    kp1 = np.asarray(s1.sim.kp_scale)
    kp2 = np.asarray(s2.sim.kp_scale)
    assert not np.allclose(kp1, 1.0)  # scales actually sampled
    assert not np.allclose(kp1, kp2)  # per-reset draw
    assert not np.allclose(float(s1.sim.mass_scale), 1.0)
    # and the un-randomized env keeps identity scales
    env0 = make_grasp_sim_env(
        GraspSimConfig(max_contacts=8, solver_iterations=2, substeps=1))
    s0 = env0.reset(jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(s0.sim.kp_scale), 1.0)


def test_train_state_save_resume_roundtrip(tmp_path):
    """`save_train_state`/`load_train_state` (the --resume path) must restore
    training exactly: one epoch after resume == one epoch without the
    save/load detour."""
    from seqdex_tpu.distributed.checkpoint import (
        load_train_state,
        save_train_state,
    )
    from seqdex_tpu.rl.ppo import PPOConfig, make_ppo

    env = make_toy_env(obs_dim=6, act_dim=2, ep_len=10)
    cfg = PPOConfig(num_envs=8, horizon=4, num_minibatches=2, mini_epochs=1)
    init, train_epoch, act = make_ppo(env, cfg)
    train_epoch = jax.jit(train_epoch)
    ts = init(jax.random.PRNGKey(0))
    ts, _ = train_epoch(ts)

    path = str(tmp_path / "resume.npz")
    save_train_state(path, ts)
    ts_loaded = load_train_state(path, init(jax.random.PRNGKey(7)))
    assert int(ts_loaded.epoch) == int(ts.epoch)

    ts_a, m_a = train_epoch(ts)
    ts_b, m_b = train_epoch(ts_loaded)
    np.testing.assert_allclose(
        float(m_a["reward_mean"]), float(m_b["reward_mean"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(ts_a.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(ts_b.params)[0]), rtol=1e-6)


def test_yaml_cfg_maps_to_env_and_ppo_kwargs():
    from seqdex_tpu.cli import config as cfglib

    cfg = cfglib.load_cfg("BlockAssemblyGraspSim")
    env_kw = cfglib.env_kwargs_from_cfg(cfg)
    assert env_kw.get("episode_length") == 150
    assert env_kw.get("lego_type") == "1x2"
    assert env_kw.get("substeps") == 2
    ppo_kw = cfglib.ppo_kwargs_from_cfg(cfg)
    assert ppo_kw.get("num_envs") == 2048
    assert ppo_kw.get("horizon") == 8
    assert abs(ppo_kw.get("learning_rate") - 3e-4) < 1e-9
    # CLI override precedence is exercised through build(): None flags fall
    # back to these values (train.py), explicit values win
