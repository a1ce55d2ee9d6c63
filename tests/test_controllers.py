import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.utils.controllers import ContactSlamer, NNController, SeqNNController
from seqdex_tpu.utils.gpt_policy import GPTConfig, GPTWrapper, gmm_nll, gpt_forward, init_gpt


def test_nn_controller_roundtrip(tmp_path):
    """Mirror of the reference's __main__ smoke
    (`utils/robot_controller/nn_controller.py:64-93`): save params, load,
    predict on random obs."""
    from seqdex_tpu.distributed.checkpoint import save_params
    from seqdex_tpu.rl import networks

    ctrl = NNController(num_obs_frame=62, num_actions=23)
    params = networks.init_actor_critic(jax.random.PRNGKey(1), 62 * 3, 1, 23)
    path = str(tmp_path / "p.npz")
    save_params(path, params)
    ctrl.load(path)
    a1 = ctrl.predict(np.random.randn(62).astype(np.float32))
    assert a1.shape == (23,)
    assert np.abs(a1).max() <= 1.0
    # stacking: same frame twice shifts the buffer -> different output
    a2 = ctrl.predict(np.random.randn(62).astype(np.float32))
    assert not np.allclose(a1, a2)


def test_seq_controller_switching():
    seq = SeqNNController()
    from seqdex_tpu.rl import networks

    for name in seq.POLICIES:
        dims = seq.OBS_DIMS[name] * seq.STACKS[name]
        seq.controllers[name].set_params(
            networks.init_actor_critic(jax.random.PRNGKey(0), dims, 1, 23)
        )
    seq.select_policy("grasp")
    a = seq.predict(np.zeros(62, dtype=np.float32))
    assert a.shape == (23,)
    seq.select_policy("insert")
    a = seq.predict(np.zeros(75, dtype=np.float32))
    assert a.shape == (23,)


def test_contact_slamer_learns_linear_map():
    slamer = ContactSlamer(lr=1e-2)
    rng = np.random.RandomState(0)
    W = rng.randn(28, 7) * 0.1
    losses = []
    for i in range(300):
        x = rng.randn(28).astype(np.float32)
        y = (x @ W).astype(np.float32)
        losses.append(slamer.update(x[:12], x[12:], y))
    assert np.mean(losses[-20:]) < np.mean(losses[:20])


def test_gpt_forward_shapes():
    cfg = GPTConfig(obs_dim=30, act_dim=23, context=3, n_layer=2, n_embd=64, n_head=4)
    params = init_gpt(jax.random.PRNGKey(0), cfg)
    obs = jnp.zeros((5, 3, 30))
    mu, ls, lg = gpt_forward(params, cfg, obs)
    assert mu.shape == (5, cfg.n_modes, 23)
    assert lg.shape == (5, cfg.n_modes)
    nll = gmm_nll(mu, ls, lg, jnp.zeros((5, 23)))
    assert nll.shape == (5,)
    assert np.isfinite(np.asarray(nll)).all()


def test_gpt_bc_learns_constant_action():
    cfg = GPTConfig(obs_dim=8, act_dim=4, context=3, n_layer=2, n_embd=32, n_head=2,
                    n_modes=2)
    g = GPTWrapper(cfg, lr=3e-3)
    rng = np.random.RandomState(0)
    target = np.array([0.3, -0.5, 0.1, 0.8], dtype=np.float32)
    first = None
    for i in range(200):
        obs = rng.randn(16, 3, 8).astype(np.float32)
        actions = np.tile(target, (16, 1))
        loss = g.train_step(obs, actions)
        if first is None:
            first = loss
    assert loss < first
    pred = g.predict(np.zeros(8, dtype=np.float32))
    assert np.abs(pred - target).max() < 0.3, pred


def test_randomization_factors():
    from seqdex_tpu.envs.randomization import (
        RandomizationParams,
        identity_factors,
        sample_factors,
    )

    p = RandomizationParams()
    f = sample_factors(p, jax.random.PRNGKey(0), jnp.float32(40000), 10, 23, 23)
    assert f.kp_scale.shape == (23,)
    assert float(f.kp_scale.min()) > 0.5
    assert float(f.kp_scale.max()) < 2.0
    # cold schedule -> near identity
    f0 = sample_factors(p, jax.random.PRNGKey(0), jnp.float32(0.0), 10, 23, 23)
    np.testing.assert_allclose(np.asarray(f0.kp_scale), 1.0, atol=1e-5)
    i = identity_factors(10, 23, 23)
    np.testing.assert_allclose(np.asarray(i.mass_scale), 1.0)
