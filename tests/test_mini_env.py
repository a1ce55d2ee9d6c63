"""Fast fixture-scene counterparts of the slow full-scene tests.

Every mechanics assertion the `@pytest.mark.slow` franka_allegro tests make
(PD tracking, contact forces firing, site-jacobian correctness, env
reset/step/timeout/vmap semantics) is covered here on the compile-small
`envs/mini.py` scene, so the default (`-m "not slow"`) suite verifies the
same physics pipeline cold in minutes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.envs.mini import MiniConfig, make_mini_env, mini_arm


@pytest.fixture(scope="module")
def env():
    return make_mini_env(MiniConfig())


def test_env_shapes(env):
    st = env.reset(jax.random.PRNGKey(0))
    assert st.obs_stack.shape == (1, env.num_obs)
    assert st.state_stack.shape == (1, env.num_states)
    st2, out = env.step(st, jnp.zeros(env.num_actions))
    assert out.obs.shape == (env.num_obs,)
    assert out.states.shape == (env.num_states,)
    assert np.isfinite(np.asarray(out.obs)).all()


def test_episode_times_out_and_reinitializes(env):
    st = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    a = jnp.zeros(env.num_actions)
    done_seen = False
    for i in range(env.episode_length + 2):
        st, out = step(st, a)
        if bool(out.done):
            done_seen = True
            prog_after_done = int(st.progress)
            st, out2 = step(st, a)  # reset folds in on the next step
            assert int(st.progress) == 1
            break
    assert done_seen


def test_pd_tracks_commanded_offset(env):
    """Mini-arm PD drive reaches a commanded joint offset (fast counterpart
    of test_sim.test_robot_reaches_commanded_offset)."""
    sim = env.sim
    D = sim.scene.art.ndof
    q0 = jnp.zeros(D, dtype=jnp.float32)
    target = q0.at[1].add(0.4)
    s = sim.init_state(q0)._replace(ctrl=target)
    # move the box out of the way (free-fall far from the arm)
    s = s._replace(body_pos=s.body_pos.at[0].set(jnp.asarray([5.0, 5.0, 5.0])))
    step = jax.jit(sim.step)
    for _ in range(90):
        s = step(s)
    assert abs(float(s.q[1]) - 0.4) < 0.06
    assert np.isfinite(np.asarray(s.q)).all()


def test_contact_force_fires_on_box(env):
    """Pressing the end link into the box produces contact force on the box
    (fast counterpart of test_sim.test_fingers_close_and_report_contact)."""
    sim = env.sim
    st = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    # drive joints toward the box long enough to strike it or the ground
    total = 0.0
    for _ in range(60):
        st, out = step(st, jnp.asarray([1.0, 0.0, 1.0, 0.0]))
        total += float(np.asarray(st.sim.link_contact_force).sum())
    assert np.isfinite(np.asarray(st.sim.q)).all()
    assert total > 0.0, total


def test_site_jacobian_matches_fd_mini():
    """Geometric site Jacobian vs finite differences on the fixture arm
    (fast counterpart of test_kinematics.test_site_jacobian_matches_fd)."""
    from seqdex_tpu.core.model import compile_articulation
    from seqdex_tpu.sim.kinematics import make_kinematics

    art = compile_articulation(mini_arm())
    fk, site_jacobian, *_ = make_kinematics(art)
    q = jnp.asarray([0.3, -0.5, 0.7, 0.2][: art.ndof], dtype=jnp.float32)
    qd0 = jnp.zeros_like(q)
    link = art.nlinks - 1
    J = site_jacobian(fk(q, qd0), link)  # (6, D)
    eps = 1e-4
    for d in range(art.ndof):
        qp = q.at[d].add(eps)
        qm = q.at[d].add(-eps)
        dp = (fk(qp, qd0).pos[link] - fk(qm, qd0).pos[link]) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(J[:3, d]), np.asarray(dp), atol=2e-3)


def test_vmapped_env_batch(env):
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    st = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    a = jnp.zeros((8, env.num_actions))
    for _ in range(5):
        st, out = step(st, a)
    assert out.obs.shape == (8, env.num_obs)
    assert np.isfinite(np.asarray(out.reward)).all()


def test_runtime_collision_filter_masks_pairs(env):
    """PhysX-style filter words (SimState.collision_filter): hand and box
    with word 1 must stop colliding while box-vs-ground (word 0) keeps
    resting contact — the chain demo's per-phase switching mechanism
    (`gui.py:3074-3092`)."""
    from seqdex_tpu.sim.simulator import SimConfig, make_sim

    # full solver budget (the fixture default's 2 Jacobi iterations
    # under-resolve a falling box; that budget is a fixture choice, not
    # what this test probes)
    sim = make_sim(env.sim.scene, SimConfig(
        substeps=2, solver_iterations=16, max_contacts=8,
        stiffness=(30.0,) * 4, damping=(3.0,) * 4, effort=(20.0,) * 4))
    B = sim.scene.nbodies
    # drive the arm into the box/ground with hand<->box and hand<->ground
    # filtered OFF but box<->ground ON (distinct filter bits — PhysX
    # semantics: pair collides iff words AND to zero)
    words = (jnp.zeros(B + 2, dtype=jnp.int32)
             .at[0].set(0b11)      # robot
             .at[1].set(0b01)      # box
             .at[B + 1].set(0b10))  # statics
    s = sim.init_state()._replace(
        body_pos=jnp.asarray([[0.14, 0.14, 0.05]], dtype=jnp.float32),
        collision_filter=words,
    )
    step = jax.jit(sim.step)
    total = 0.0
    for _ in range(90):
        s = s._replace(ctrl=jnp.clip(s.q + 0.2, -2.0, 2.0))  # sweep down
        s = step(s)
        total += float(np.asarray(s.link_contact_force).sum())
    # robot contacts are filtered -> no link force anywhere
    assert total == 0.0, total
    # box still rests on the ground (box-ground bits AND to zero -> on)
    assert -0.02 < float(s.body_pos[0, 2]) < 0.1
    # control: same sweep with filters cleared DOES produce link force
    s2 = sim.init_state()._replace(
        body_pos=jnp.asarray([[0.14, 0.14, 0.05]], dtype=jnp.float32),
        collision_filter=jnp.zeros(B + 2, dtype=jnp.int32),
    )
    total2 = 0.0
    for _ in range(90):
        s2 = s2._replace(ctrl=jnp.clip(s2.q + 0.2, -2.0, 2.0))
        s2 = step(s2)
        total2 += float(np.asarray(s2.link_contact_force).sum())
    assert total2 > 0.0
