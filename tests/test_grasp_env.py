import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full franka_allegro scene

from seqdex_tpu.envs.block_assembly.grasp_sim import (
    GraspSimConfig,
    make_grasp_sim_env,
)


@pytest.fixture(scope="module")
def env():
    # few solver iters / contacts: keep CPU compile time sane in CI
    return make_grasp_sim_env(GraspSimConfig(max_contacts=32, solver_iterations=8))


def test_env_shapes(env):
    assert env.num_obs == 396
    assert env.num_states == 564
    assert env.num_actions == 23


def test_reset_and_step(env):
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    action = jnp.zeros(23)
    state, out = step(state, action)
    assert out.obs.shape == (396,)
    assert out.states.shape == (564,)
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(float(out.reward))
    assert not bool(out.done)
    # obs layout spot checks: slot 0:16 is unscaled hand q in [-1, 1]
    assert np.abs(np.asarray(out.obs[0:16])).max() <= 1.0 + 1e-5


def test_episode_runs_and_times_out(env):
    state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    done_at = None
    for t in range(150):
        state, out = step(state, jnp.zeros(23))
        if bool(out.done) and done_at is None:
            done_at = t
    assert done_at is not None  # episode must terminate within its length
    assert np.isfinite(np.asarray(state.sim.q)).all()


def test_reset_on_done_reinitializes(env):
    state = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    # force the done flag and step: env must re-init, progress back to 1
    state = state._replace(reset_flag=jnp.bool_(True), progress=jnp.int32(99))
    state, out = step(state, jnp.zeros(23))
    assert int(state.progress) == 1


def test_actions_move_fingers(env):
    state = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    close = jnp.zeros(23).at[7:23].set(1.0)  # fingers to upper limits
    open_ = jnp.zeros(23).at[7:23].set(-1.0)
    s_close = state
    for _ in range(20):
        s_close, _ = step(s_close, close)
    s_open = state
    for _ in range(20):
        s_open, _ = step(s_open, open_)
    qc = np.asarray(s_close.sim.q[7:23])
    qo = np.asarray(s_open.sim.q[7:23])
    assert (qc - qo).mean() > 0.3  # closing drives joints higher than opening


def test_vmapped_env(env):
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    states = jax.vmap(env.reset)(keys)
    step = jax.jit(jax.vmap(env.step))
    actions = jnp.zeros((4, 23))
    states, out = step(states, actions)
    assert out.obs.shape == (4, 396)
    assert np.isfinite(np.asarray(out.reward)).all()


import pytest


@pytest.mark.slow
def test_clutter_scene_builds_and_steps():
    """Reference-scale clutter opt-in (`..._grasp_sim.py:706-745`): 72
    distractors + baseplate + bin walls; settled pool; env steps finite."""
    import jax
    import jax.numpy as jnp

    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig, make_grasp_sim_env)

    env = make_grasp_sim_env(GraspSimConfig(clutter=True, clutter_bricks=16,
                                            clutter_pool=2))
    assert env.sim.scene.nbodies == 1 + 16 + 1  # target + clutter + plate
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    st = jax.jit(jax.vmap(env.reset))(keys)
    # distractors landed in the bin, not at the origin
    assert float(jnp.abs(st.sim.body_pos[:, 1:17, 2]).min()) > 0.3
    st, out = jax.jit(jax.vmap(env.step))(st, jnp.zeros((4, env.num_actions)))
    assert bool(jnp.all(jnp.isfinite(out.obs)))
