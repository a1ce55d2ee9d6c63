"""Tests for the contact buffer, FeatureTunk trunk, logger tools, and env
adapters (reference parity: `utils/contact_buffer.py`, `utils/cnn_module.py`,
`utils/logger/`, `tasks/hand_base/{multi,meta,imitation}_vec_task.py`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.utils import contact_buffer as cb
from seqdex_tpu.utils.cnn import feature_tunk_apply, init_feature_tunk
from seqdex_tpu.utils import logger_tools
from seqdex_tpu.utils.metrics import MetricsWriter


def test_contact_buffer_sequential_fill_then_random_overwrite():
    st = cb.create(10, 3)
    key = jax.random.PRNGKey(0)
    st = cb.insert(st, jnp.ones((3, 3)), key)
    assert int(st.top) == 3
    assert np.allclose(cb.contents(st), 1.0)
    st = cb.insert(st, 2 * jnp.ones((4, 3)), key)
    assert int(st.top) == 7
    # fill to capacity
    st = cb.insert(st, 3 * jnp.ones((3, 3)), key)
    assert int(st.top) == 10
    # full: random-position overwrite, top saturates
    st = cb.insert(st, 4 * jnp.ones((2, 3)), jax.random.PRNGKey(7))
    assert int(st.top) == 10
    vals = cb.contents(st)
    assert (vals == 4.0).all(axis=1).sum() == 2  # exactly the new rows


def test_contact_buffer_jittable():
    st = cb.create(8, 2)

    @jax.jit
    def push(st, batch, key):
        return cb.insert(st, batch, key)

    for i in range(6):
        st = push(st, jnp.full((3, 2), float(i)), jax.random.PRNGKey(i))
    assert int(st.top) == 8


def test_feature_tunk_shapes_and_grad():
    params = init_feature_tunk(jax.random.PRNGKey(0), input_dim=6, output_dim=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 6))
    y = feature_tunk_apply(params, x)
    assert y.shape == (4, 2)
    # differentiable end to end
    g = jax.grad(lambda p: feature_tunk_apply(p, x).sum())(params)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g, 0.0)))


def test_logger_csv_and_smooth(tmp_path):
    logdir = str(tmp_path / "run0")
    w = MetricsWriter(logdir)
    for i in range(20):
        w.write(i, {"reward": float(i), "kl": 0.01})
    w.close()
    path = logger_tools.export_csv(logdir)
    assert os.path.exists(path)
    rows = open(path).read().strip().splitlines()
    assert rows[0].startswith("step")
    assert len(rows) == 21
    sm = logger_tools.smooth(np.arange(20.0), radius=3)
    assert sm.shape == (20,)
    assert abs(sm[10] - 10.0) < 1e-9  # centered window preserves a ramp


def test_multi_agent_view_roundtrip():
    from seqdex_tpu.envs.adapters import multi_agent_view
    from seqdex_tpu.envs.base import Env, StepOutput

    def reset(key):
        return jnp.zeros((4,))

    def step(state, action):
        out = StepOutput(
            obs=jnp.arange(10.0), states=jnp.zeros(3), reward=jnp.float32(1.0),
            done=jnp.bool_(False), info={},
        )
        return state + action.sum(), out

    env = Env(name="toy", num_obs=10, num_states=3, num_actions=4,
              episode_length=5, reset=reset, step=step)
    view = multi_agent_view(env, num_agents=2, agent_obs_dim=3)
    assert view.per_agent_obs_dim == 3 + 4
    obs = jnp.arange(10.0)
    a0 = view.agent_obs(obs, 0)
    a1 = view.agent_obs(obs, 1)
    assert np.allclose(a0, [0, 1, 2, 6, 7, 8, 9])
    assert np.allclose(a1, [3, 4, 5, 6, 7, 8, 9])
    st, outs = view.step(jnp.zeros(4), [jnp.ones(2), jnp.zeros(2)])
    assert len(outs) == 2 and outs[0].obs.shape == (7,)


def test_imitation_env_surfaces_action():
    from seqdex_tpu.envs.adapters import imitation_env
    from seqdex_tpu.envs.base import Env, StepOutput

    def step(state, action):
        return state, StepOutput(jnp.zeros(2), jnp.zeros(2), jnp.float32(0),
                                 jnp.bool_(False), {})

    env = Env(name="toy", num_obs=2, num_states=2, num_actions=3,
              episode_length=5, reset=lambda k: jnp.zeros(1), step=step)
    wrapped = imitation_env(env)
    _, out = wrapped.step(jnp.zeros(1), jnp.array([1.0, 2.0, 3.0]))
    assert np.allclose(out.info["demo_action"], [1.0, 2.0, 3.0])


def test_meta_env_onehot():
    from seqdex_tpu.envs.adapters import meta_env
    from seqdex_tpu.envs.base import Env, StepOutput

    def mk(dim, tag):
        def step(state, action):
            return state, StepOutput(jnp.full((dim,), tag), jnp.zeros(dim),
                                     jnp.float32(0), jnp.bool_(False), {})
        return Env(name=f"t{tag}", num_obs=dim, num_states=dim, num_actions=2,
                   episode_length=5, reset=lambda k: jnp.zeros(1), step=step)

    views = meta_env([mk(3, 1.0), mk(5, 2.0)])
    assert len(views) == 2
    assert views[0].num_obs == 5 + 2  # padded + onehot
    _, out0 = views[0].step(jnp.zeros(1), jnp.zeros(2))
    assert out0.obs.shape == (7,)
    assert np.allclose(out0.obs[-2:], [1.0, 0.0])
    _, out1 = views[1].step(jnp.zeros(1), jnp.zeros(2))
    assert np.allclose(out1.obs[-2:], [0.0, 1.0])
