"""Studded-socket InsertSim variant (reference "extra lego" 4x4 plate,
`..._insert_sim.py:750-756,973-996`) + cavity-brick press-fit.

The physical claim under test: a cavity brick pressed onto the plate's studs
INTERLOCKS — it bottoms out on the plate top and resists lateral push via
stud-rim contact — while staying within the reference's <2 cm / <0.2 rad
success tolerance of the analytic mate pose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.core import builders
from seqdex_tpu.envs.block_assembly.insert_sim import (
    InsertSimConfig, make_insert_sim_env)


@pytest.fixture(scope="module")
def env():
    return make_insert_sim_env(InsertSimConfig(socket="studded",
                                               lego_type="1x2"))


def test_studded_env_builds_and_steps(env):
    st = env.reset(jax.random.PRNGKey(0))
    a = jnp.zeros(env.num_actions)
    for _ in range(3):
        st, out = jax.jit(env.step)(st, a)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert bool(jnp.all(jnp.isfinite(st.sim.body_pos)))


def _engaged_state(env, dz=0.0, dx=0.0):
    """Sim state with the brick at the analytic mate pose (+offset), robot
    parked away from the plate."""
    st = env.reset(jax.random.PRNGKey(1))
    s = st.sim
    scene = env.sim.scene
    tb = scene.body_index("target")
    tgt = st.extra_target_pos
    rot = st.extra_target_rot
    s = s._replace(
        body_pos=s.body_pos.at[tb].set(tgt + jnp.asarray([dx, 0.0, dz])),
        body_quat=s.body_quat.at[tb].set(rot),
        body_linvel=jnp.zeros_like(s.body_linvel),
        body_angvel=jnp.zeros_like(s.body_angvel),
    )
    return st, s, tb


def test_pressfit_settles_into_engagement(env):
    """Dropped from 6 mm above the mate pose, the cavity brick settles into
    the slot: final position within the success tolerance, near-zero slide."""
    st, s, tb = _engaged_state(env, dz=0.006)
    step = jax.jit(env.sim.step)
    for _ in range(40):
        s = step(s)
    final = np.asarray(s.body_pos[tb])
    tgt = np.asarray(st.extra_target_pos)
    err = np.linalg.norm(final - tgt)
    assert err < 0.01, (final, tgt, err)
    assert bool(jnp.all(jnp.isfinite(s.body_pos)))


def test_pressfit_resists_lateral_push(env):
    """An engaged brick shoved sideways at 0.5 m/s stays in the slot (the
    stud-rim interlock); the same shove with the brick sitting loose on the
    table slides it several cm — interlock, not just friction."""
    st, s, tb = _engaged_state(env)
    step = jax.jit(env.sim.step)
    for _ in range(10):  # settle into engagement
        s = step(s)
    start = np.asarray(s.body_pos[tb])
    s = s._replace(body_linvel=s.body_linvel.at[tb].set(
        jnp.asarray([0.5, 0.0, 0.0])))
    for _ in range(30):
        s = step(s)
    moved = np.linalg.norm(np.asarray(s.body_pos[tb])[:2] - start[:2])
    # 2 mm cavity clearance + compliance: must stay well inside one module
    assert moved < 0.012, moved
    # control: same brick, same shove, loose on the table next to the plate
    st2, s2, _ = _engaged_state(env)
    loose = np.asarray(st2.extra_target_pos) + np.asarray([0.0, 0.12, 0.0])
    s2 = s2._replace(body_pos=s2.body_pos.at[tb].set(jnp.asarray(loose)))
    for _ in range(10):
        s2 = step(s2)
    start2 = np.asarray(s2.body_pos[tb])
    s2 = s2._replace(body_linvel=s2.body_linvel.at[tb].set(
        jnp.asarray([0.5, 0.0, 0.0])))
    for _ in range(30):
        s2 = step(s2)
    moved2 = np.linalg.norm(np.asarray(s2.body_pos[tb])[:2] - start2[:2])
    assert moved2 > 2.5 * moved, (moved2, moved)


def test_parked_bricks_scene_builds():
    env2 = make_insert_sim_env(InsertSimConfig(
        socket="studded", lego_type="1x2", parked_bricks=True))
    st = env2.reset(jax.random.PRNGKey(0))
    st, out = jax.jit(env2.step)(st, jnp.zeros(env2.num_actions))
    # parked bricks rest ~1 m outside the workspace (reference x = 1.13..)
    pp = np.asarray(st.sim.body_pos)
    names = env2.sim.scene.body_names
    parked = [i for i, n in enumerate(names) if n.startswith("parked")]
    assert len(parked) == 8
    assert (pp[parked, 0] > 1.0).all()
