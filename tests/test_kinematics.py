import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.core.builders import FINGERTIP_LINKS, HAND_BASE_LINK, franka_allegro
from seqdex_tpu.core.model import (
    JOINT_REVOLUTE,
    ArticulationSpec,
    JointSpec,
    LinkSpec,
    compile_articulation,
)
from seqdex_tpu.sim.kinematics import make_dynamics, make_kinematics


def two_link_pendulum(l1=1.0, l2=0.8, m1=1.0, m2=0.5):
    """Planar double pendulum about y axes, links along +x."""
    links = [
        LinkSpec(name="base", parent=None, mass=0.0),
        LinkSpec(
            name="l1", parent="base",
            joint=JointSpec(JOINT_REVOLUTE, (0, 1, 0), lower=-10, upper=10, effort=100),
            origin_pos=(0, 0, 0),
            mass=m1, com=(l1 / 2, 0, 0), inertia=(1e-8, m1 * l1**2 / 12, m1 * l1**2 / 12, 0, 0, 0),
        ),
        LinkSpec(
            name="l2", parent="l1",
            joint=JointSpec(JOINT_REVOLUTE, (0, 1, 0), lower=-10, upper=10, effort=100),
            origin_pos=(l1, 0, 0),
            mass=m2, com=(l2 / 2, 0, 0), inertia=(1e-8, m2 * l2**2 / 12, m2 * l2**2 / 12, 0, 0, 0),
        ),
    ]
    return ArticulationSpec(name="pendulum", links=links)


def test_fk_pendulum_positions():
    art = compile_articulation(two_link_pendulum())
    fk, *_ = make_kinematics(art)
    # q = 0: both links along +x
    res = fk(jnp.zeros(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.pos[2]), [1.0, 0, 0], atol=1e-6)
    # rotate first joint by -pi/2 about y -> tip up (+z)
    res = fk(jnp.array([-jnp.pi / 2, 0.0]), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(res.pos[2]), [0, 0, 1.0], atol=1e-6)


def test_fk_velocities_match_fd():
    """Link velocities from FK == finite difference of positions."""
    art = compile_articulation(two_link_pendulum())
    fk, *_ = make_kinematics(art)
    q = jnp.array([0.3, -0.7])
    qd = jnp.array([1.1, 0.5])
    eps = 1e-3
    res = fk(q, qd)
    hi = fk(q + eps * qd, qd)
    lo = fk(q - eps * qd, qd)
    fd = (hi.pos - lo.pos) / (2 * eps)
    np.testing.assert_allclose(np.asarray(res.linvel), np.asarray(fd), atol=1e-3)


def test_mass_matrix_double_pendulum_analytic():
    """M(q) vs the textbook planar double-pendulum formula."""
    l1, l2, m1, m2 = 1.0, 0.8, 1.0, 0.5
    art = compile_articulation(two_link_pendulum(l1, l2, m1, m2))
    fk, *_ = make_kinematics(art)
    mass_matrix, bias_forces, *_ = make_dynamics(art)
    q2 = 0.6
    res = fk(jnp.array([0.2, q2]), jnp.zeros(2))
    M = np.asarray(mass_matrix(res))
    lc1, lc2 = l1 / 2, l2 / 2
    I1, I2 = m1 * l1**2 / 12, m2 * l2**2 / 12
    m11 = I1 + m1 * lc1**2 + I2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * np.cos(q2))
    m12 = I2 + m2 * (lc2**2 + l1 * lc2 * np.cos(q2))
    m22 = I2 + m2 * lc2**2
    np.testing.assert_allclose(M, [[m11, m12], [m12, m22]], rtol=1e-4, atol=1e-5)


def test_gravity_bias_double_pendulum():
    l1, l2, m1, m2 = 1.0, 0.8, 1.0, 0.5
    art = compile_articulation(two_link_pendulum(l1, l2, m1, m2))
    fk, *_ = make_kinematics(art)
    _, bias_forces, *_ = make_dynamics(art)
    gq = 9.81
    # at q=0 (links horizontal along +x, rotation about +y): gravity torque
    res = fk(jnp.zeros(2), jnp.zeros(2))
    tau = np.asarray(bias_forces(res, jnp.zeros(2)))
    lc1, lc2 = l1 / 2, l2 / 2
    # potential V = -sum m g z; z rotates as -sin(q) x for +y rotation... use
    # signed check via finite differences of potential energy instead:
    def pot(q):
        r = fk(jnp.asarray(q), jnp.zeros(2))
        # com world positions
        c1 = r.pos[1] + jnp.array([lc1, 0, 0]) @ _rotmat(r.quat[1]).T
        c2 = r.pos[2] + jnp.array([lc2, 0, 0]) @ _rotmat(r.quat[2]).T
        return float(m1 * gq * c1[2] + m2 * gq * c2[2])

    eps = 1e-5
    for d in range(2):
        dq = np.zeros(2)
        dq[d] = eps
        fd = (pot(dq) - pot(-dq)) / (2 * eps)
        # bias with qd=0 equals dV/dq
        assert abs(tau[d] - fd) < 1e-3, (d, tau[d], fd)


def _rotmat(q):
    from seqdex_tpu.core.math import quat_to_matrix

    return quat_to_matrix(q)


def test_coriolis_energy_consistency():
    """Passive double pendulum with fine explicit integration conserves energy
    to ~1% -> validates M(q) and bias terms jointly."""
    l1, l2, m1, m2 = 1.0, 0.8, 1.0, 0.5
    art = compile_articulation(two_link_pendulum(l1, l2, m1, m2))
    fk, *_ = make_kinematics(art)
    mass_matrix, bias_forces, *_ = make_dynamics(art)
    lc1, lc2 = l1 / 2, l2 / 2

    def energy(q, qd):
        res = fk(q, qd)
        M = mass_matrix(res)
        ke = 0.5 * qd @ M @ qd
        c1 = res.pos[1] + _rotmat(res.quat[1]) @ jnp.array([lc1, 0, 0])
        c2 = res.pos[2] + _rotmat(res.quat[2]) @ jnp.array([lc2, 0, 0])
        pe = 9.81 * (m1 * c1[2] + m2 * c2[2])
        return float(ke + pe)

    def step(carry, _):
        q, qd = carry
        res = fk(q, qd)
        M = mass_matrix(res)
        b = bias_forces(res, qd)
        qdd = jnp.linalg.solve(M, -b)
        dt = 1e-4
        qd2 = qd + dt * qdd
        return (q + dt * qd2, qd2), None

    q = jnp.array([0.4, 0.2])
    qd = jnp.array([0.0, 0.0])
    e0 = energy(q, qd)
    (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=2000)
    e1 = energy(q, qd)
    assert abs(e1 - e0) < 0.02 * max(abs(e0), 1.0), (e0, e1)


@pytest.mark.slow  # full-scene compile
def test_franka_allegro_compiles():
    spec = franka_allegro()
    art = compile_articulation(spec)
    assert art.ndof == 23
    for tip in FINGERTIP_LINKS:
        assert tip in art.link_names
    fk, site_jacobian, *_ = make_kinematics(art)
    from seqdex_tpu.core.builders import DEFAULT_ARM_QPOS

    q = jnp.zeros(23).at[:7].set(jnp.asarray(DEFAULT_ARM_QPOS))
    res = fk(q, jnp.zeros(23))
    base = art.link_index(HAND_BASE_LINK)
    p = np.asarray(res.pos[base])
    # hand should be in front of the robot base, above the table (z=0.6)
    assert p[2] > 0.6, p
    assert np.isfinite(np.asarray(res.pos)).all()


@pytest.mark.slow  # full-scene compile
def test_site_jacobian_matches_fd():
    spec = franka_allegro()
    art = compile_articulation(spec)
    fk, site_jacobian, *_ = make_kinematics(art)
    li = art.link_index(HAND_BASE_LINK)
    q0 = jnp.zeros(23).at[:7].set(jnp.array([0.1, 0.3, -0.2, -2.0, 0.1, 2.2, 0.5]))

    J = np.asarray(site_jacobian(fk(q0, jnp.zeros(23)), li))
    eps = 1e-3  # fp32-friendly central-difference step
    for d in range(7):
        dq = jnp.zeros(23).at[d].set(eps)
        p1 = fk(q0 + dq, jnp.zeros(23)).pos[li]
        p0 = fk(q0 - dq, jnp.zeros(23)).pos[li]
        fd = np.asarray((p1 - p0) / (2 * eps))
        np.testing.assert_allclose(J[:3, d], fd, atol=2e-3)


@pytest.mark.slow  # full-scene compile
def test_fk_vmap_batch():
    art = compile_articulation(franka_allegro())
    fk, *_ = make_kinematics(art)
    qs = jnp.tile(jnp.zeros(23), (16, 1))
    res = jax.vmap(lambda q: fk(q, jnp.zeros(23)))(qs)
    assert res.pos.shape == (16, art.nlinks, 3)
