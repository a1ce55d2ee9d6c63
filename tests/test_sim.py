import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.core.builders import (
    DEFAULT_ARM_QPOS,
    HAND_BASE_LINK,
    franka_allegro,
    ground,
    lego_brick,
    table,
)
from seqdex_tpu.core.model import (
    JOINT_REVOLUTE,
    ArticulationSpec,
    JointSpec,
    LinkSpec,
)
from seqdex_tpu.sim.scene import compile_scene
from seqdex_tpu.sim.simulator import SimConfig, SimState, make_sim


def minimal_robot():
    """Single-dof arm that can't reach anything — placeholder articulation for
    body-only scenes."""
    return ArticulationSpec(
        name="stub",
        links=[
            LinkSpec(name="root", parent=None, mass=1.0, inertia=(1e-2, 1e-2, 1e-2, 0, 0, 0)),
            LinkSpec(
                name="l1",
                parent="root",
                joint=JointSpec(JOINT_REVOLUTE, (0, 0, 1), lower=-1, upper=1, effort=10),
                origin_pos=(0, 0, 5.0),  # far above the scene
                mass=1.0,
                inertia=(1e-2, 1e-2, 1e-2, 0, 0, 0),
            ),
        ],
        base_pos=(0, 0, 10.0),
    )


@pytest.fixture(scope="module")
def brick_sim():
    scene = compile_scene(minimal_robot(), bodies=[lego_brick("1x2")], statics=[table(), ground()])
    cfg = SimConfig(substeps=2, max_contacts=32, stiffness=(10.0,), damping=(1.0,), effort=(10.0,))
    sim = make_sim(scene, cfg)
    return scene, sim


def place_brick(sim, pos, quat=(0, 0, 0, 1), vel=(0, 0, 0)):
    s = sim.init_state()
    s = s._replace(
        body_pos=jnp.array([pos], dtype=jnp.float32),
        body_quat=jnp.array([quat], dtype=jnp.float32),
        body_linvel=jnp.array([vel], dtype=jnp.float32),
        body_angvel=jnp.zeros((1, 3), dtype=jnp.float32),
    )
    return s


def run_steps(sim, state, n):
    step = jax.jit(sim.step)
    for _ in range(n):
        state = step(state)
    return state


def test_brick_settles_on_table(brick_sim):
    scene, sim = brick_sim
    # brick dropped from 5 cm above the table
    s0 = place_brick(sim, (0.25, 0.19, 0.70))
    s = run_steps(sim, s0, 90)  # 1.5 s
    z = float(s.body_pos[0, 2])
    # resting pose: bottom of brick (z - 0.01875) on table top (0.6)
    assert abs(z - 0.61875) < 0.006, z
    v = np.abs(np.asarray(s.body_linvel)).max()
    assert v < 0.05, v
    # upright orientation preserved
    assert float(s.body_quat[0, 3]) > 0.99


def test_brick_at_rest_stays(brick_sim):
    scene, sim = brick_sim
    s0 = place_brick(sim, (0.25, 0.19, 0.61875))
    s = run_steps(sim, s0, 60)
    drift = np.linalg.norm(np.asarray(s.body_pos[0, :2]) - np.array([0.25, 0.19]))
    assert drift < 0.005, drift
    assert abs(float(s.body_pos[0, 2]) - 0.61875) < 0.005


def test_brick_falls_off_table_to_ground(brick_sim):
    scene, sim = brick_sim
    s0 = place_brick(sim, (2.0, 0.0, 0.70))  # off the table
    s = run_steps(sim, s0, 150)
    z = float(s.body_pos[0, 2])
    assert abs(z - 0.01875) < 0.01, z


def test_friction_holds_brick_on_table_under_gravity_tilt(brick_sim):
    """Give the brick a sideways shove; friction should stop it quickly."""
    scene, sim = brick_sim
    s0 = place_brick(sim, (0.25, 0.19, 0.62), vel=(0.5, 0, 0))
    s = run_steps(sim, s0, 60)
    v = np.abs(np.asarray(s.body_linvel)).max()
    assert v < 0.05, v
    # it slid some but not far
    assert float(s.body_pos[0, 0]) - 0.25 < 0.25


@pytest.fixture(scope="module")
def robot_sim():
    scene = compile_scene(
        franka_allegro(), bodies=[lego_brick("1x2")], statics=[table(), ground()]
    )
    sim = make_sim(scene, SimConfig(substeps=2, max_contacts=64))
    return scene, sim


@pytest.mark.slow  # full-scene compile
def test_robot_pd_tracks_default_pose(robot_sim):
    scene, sim = robot_sim
    art = scene.art
    q0 = jnp.zeros(art.ndof, dtype=jnp.float32)
    q0 = q0.at[:7].set(jnp.asarray(DEFAULT_ARM_QPOS, dtype=jnp.float32))
    s = sim.init_state()
    s = s._replace(
        q=q0, ctrl=q0,
        body_pos=jnp.array([[0.25, 0.19, 0.61875]], dtype=jnp.float32),
    )
    s = run_steps(sim, s, 60)  # 1 s hold
    err = np.abs(np.asarray(s.q[:7] - q0[:7])).max()
    # steady-state gravity sag of a kp=400 PD on the shoulder is ~tau_g/kp
    # ~ 0.1 rad — same as PhysX DOF drives; the env's IK loop closes it out
    assert err < 0.15, err
    assert np.isfinite(np.asarray(s.q)).all()
    assert np.isfinite(np.asarray(s.body_pos)).all()


@pytest.mark.slow  # full-scene compile
def test_robot_reaches_commanded_offset(robot_sim):
    scene, sim = robot_sim
    art = scene.art
    q0 = jnp.zeros(art.ndof, dtype=jnp.float32).at[:7].set(
        jnp.asarray(DEFAULT_ARM_QPOS, dtype=jnp.float32)
    )
    target = q0.at[0].add(0.3)
    s = sim.init_state()._replace(
        q=q0, ctrl=target,
        body_pos=jnp.array([[0.25, 0.19, 0.61875]], dtype=jnp.float32),
    )
    s = run_steps(sim, s, 90)
    assert abs(float(s.q[0]) - float(target[0])) < 0.05


@pytest.mark.slow  # full-scene compile
def test_fingers_close_and_report_contact_on_brick(robot_sim):
    """Close the fingers onto a brick placed in the palm; FSR-style link
    contact forces must fire (reference thresholds contacts at 0.1 N,
    `..._grasp_sim.py:1174-1178`)."""
    scene, sim = robot_sim
    art = scene.art
    fk, = (sim.fk,)
    q0 = jnp.zeros(art.ndof, dtype=jnp.float32).at[:7].set(
        jnp.asarray(DEFAULT_ARM_QPOS, dtype=jnp.float32)
    )
    res = fk(q0, jnp.zeros_like(q0))
    palm_idx = art.link_index("palm")
    palm = np.asarray(res.pos[palm_idx])
    # put the brick at the palm center
    s = sim.init_state()._replace(
        q=q0,
        ctrl=q0.at[7:].set(jnp.asarray(art.upper[7:], dtype=jnp.float32)),  # close hand
        body_pos=jnp.asarray([palm], dtype=jnp.float32),
    )
    s = run_steps(sim, s, 30)
    total_force = float(np.asarray(s.link_contact_force).sum())
    assert np.isfinite(np.asarray(s.q)).all()
    assert total_force > 0.1, total_force


def test_sim_vmap_batch(brick_sim):
    scene, sim = brick_sim
    keys = np.arange(8)
    states = jax.vmap(lambda i: place_brick(sim, (0.25, 0.19, 0.65 + 0.0 * i)))(
        jnp.arange(8, dtype=jnp.float32)
    )
    step = jax.jit(jax.vmap(sim.step))
    for _ in range(30):
        states = step(states)
    assert states.body_pos.shape == (8, 1, 3)
    assert np.isfinite(np.asarray(states.body_pos)).all()
