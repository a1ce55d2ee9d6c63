"""Cross-engine physics sanity: the CRBA/Newton-Euler pipeline vs CLOSED-FORM
multibody dynamics (VERDICT round-1 weak #6: the golden harness only locks
self-consistency; these tests check against independent analytic references
derived via Lagrangian mechanics and autodiff of the closed-form energies).

Reference system: planar double pendulum, two point masses m1/m2 on massless
rods l1/l2, revolute about the world y-axis, gravity -z. The textbook
Lagrangian dynamics give

    M11 = (m1+m2) l1^2 + m2 l2^2 + 2 m2 l1 l2 cos(q2)
    M12 = m2 l2^2 + m2 l1 l2 cos(q2)
    M22 = m2 l2^2
    C1  = -m2 l1 l2 sin(q2) (2 qd1 qd2 + qd2^2)
    C2  =  m2 l1 l2 sin(q2) qd1^2
    G1  = (m1+m2) g l1 sin(th1) + m2 g l2 sin(th1+q2)
    G2  =  m2 g l2 sin(th1+q2)

The bias reference is derived CONVENTION-FREE by autodiff of the analytic
particle-position kinematics (Euler-Lagrange with qdd = 0) — an independent
derivation path sharing no code with the engine's CRBA/Newton-Euler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.core.model import (
    JOINT_REVOLUTE,
    ArticulationSpec,
    JointSpec,
    LinkSpec,
    compile_articulation,
)
from seqdex_tpu.sim.kinematics import make_dynamics, make_kinematics

M1, M2 = 1.3, 0.7
L1, L2 = 0.9, 0.6
G = 9.81


def _pendulum_art():
    """Two revolute links about +y; rod i extends along -z (hanging)."""
    links = [
        LinkSpec(
            name="link1", parent=None,
            joint=JointSpec(JOINT_REVOLUTE, axis=(0, 1, 0), lower=-10, upper=10),
            origin_pos=(0, 0, 0), mass=M1, com=(0, 0, -L1),
            inertia=(0, 0, 0, 0, 0, 0),  # point mass at the com
        ),
        LinkSpec(
            name="link2", parent="link1",
            joint=JointSpec(JOINT_REVOLUTE, axis=(0, 1, 0), lower=-10, upper=10),
            origin_pos=(0, 0, -L1), mass=M2, com=(0, 0, -L2),
            inertia=(0, 0, 0, 0, 0, 0),
        ),
    ]
    return compile_articulation(ArticulationSpec(name="dpend", links=links))


def _analytic_M(q2):
    m11 = (M1 + M2) * L1**2 + M2 * L2**2 + 2 * M2 * L1 * L2 * np.cos(q2)
    m12 = M2 * L2**2 + M2 * L1 * L2 * np.cos(q2)
    m22 = M2 * L2**2
    return np.array([[m11, m12], [m12, m22]])


def _positions(q):
    """Analytic particle positions (independent of the engine FK): rotation
    about +y by a maps the hanging rod (0,0,-L) to (-L sin a, 0, -L cos a)."""
    q1, q2 = q[0], q[1]
    p1 = jnp.array([-L1 * jnp.sin(q1), 0.0, -L1 * jnp.cos(q1)])
    p2 = p1 + jnp.array(
        [-L2 * jnp.sin(q1 + q2), 0.0, -L2 * jnp.cos(q1 + q2)])
    return p1, p2


def _lagrangian_bias(q, qd):
    """C(q,qd) qd + G(q) via Euler-Lagrange with qdd = 0, autodiffed from
    the closed-form kinetic/potential energies."""
    q = jnp.asarray(q, dtype=jnp.float64)
    qd = jnp.asarray(qd, dtype=jnp.float64)

    def T(q, qd):
        J1 = jax.jacfwd(lambda qq: _positions(qq)[0])(q)
        J2 = jax.jacfwd(lambda qq: _positions(qq)[1])(q)
        v1 = J1 @ qd
        v2 = J2 @ qd
        return 0.5 * M1 * v1 @ v1 + 0.5 * M2 * v2 @ v2

    def V(q):
        p1, p2 = _positions(q)
        return M1 * G * p1[2] + M2 * G * p2[2]

    dT_dqd = jax.grad(T, argnums=1)
    ddt = jax.jacfwd(lambda qq: dT_dqd(qq, qd))(q) @ qd
    return np.asarray(ddt - jax.grad(T, argnums=0)(q, qd) + jax.grad(V)(q))


@pytest.fixture(scope="module")
def dyn():
    art = _pendulum_art()
    fk = make_kinematics(art)[0]
    mass_matrix, bias_forces, _, _ = make_dynamics(art, gravity=(0, 0, -G))
    return fk, mass_matrix, bias_forces


@pytest.mark.parametrize("q,qd", [
    ((0.3, -0.7), (0.0, 0.0)),
    ((1.2, 0.4), (2.0, -1.5)),
    ((-0.8, 2.1), (-0.3, 0.9)),
    ((0.0, 0.0), (1.0, 1.0)),
])
def test_mass_matrix_matches_lagrangian(dyn, q, qd):
    fk, mass_matrix, _ = dyn
    qj = jnp.asarray(q, dtype=jnp.float32)
    fk_res = fk(qj, jnp.asarray(qd, dtype=jnp.float32))
    M = np.asarray(mass_matrix(fk_res))
    M_ref = _analytic_M(q[1])
    np.testing.assert_allclose(M, M_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("q,qd", [
    ((0.3, -0.7), (0.5, 1.1)),
    ((1.2, 0.4), (2.0, -1.5)),
    ((-0.8, 2.1), (-0.3, 0.9)),
])
def test_bias_forces_match_lagrangian(dyn, q, qd):
    fk, _, bias_forces = dyn
    qj = jnp.asarray(q, dtype=jnp.float32)
    qdj = jnp.asarray(qd, dtype=jnp.float32)
    fk_res = fk(qj, qdj)
    bias = np.asarray(bias_forces(fk_res, qdj))
    bias_ref = _lagrangian_bias(q, qd)
    np.testing.assert_allclose(bias, bias_ref, rtol=1e-3, atol=1e-3)


def test_passive_swing_conserves_energy(dyn):
    """Undriven, frictionless pendulum: symplectic-Euler M(q)^-1 integration
    must keep total energy bounded (and nearly constant at small dt)."""
    fk, mass_matrix, bias_forces = dyn

    def energy(q, qd):
        Mm = _analytic_M(float(q[1]))
        ke = 0.5 * np.asarray(qd) @ Mm @ np.asarray(qd)
        z1 = -L1 * np.cos(float(q[0]))
        z2 = z1 - L2 * np.cos(float(q[0]) + float(q[1]))
        pe = M1 * G * z1 + M2 * G * z2
        return ke + pe

    h = 1e-3

    @jax.jit
    def step(q, qd):
        fk_res = fk(q, qd)
        M = mass_matrix(fk_res)
        b = bias_forces(fk_res, qd)
        qdd = jnp.linalg.solve(M, -b)
        qd2 = qd + h * qdd
        return q + h * qd2, qd2

    q = jnp.asarray([0.7, 0.2], dtype=jnp.float32)
    qd = jnp.asarray([0.0, 0.0], dtype=jnp.float32)
    e0 = energy(q, qd)
    for _ in range(2000):  # 2 s
        q, qd = step(q, qd)
    e1 = energy(q, qd)
    # symplectic Euler at 1 kHz on a chaotic pendulum: a few percent drift
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05


def test_free_body_projectile_matches_kinematics():
    """A contact-free body under the full simulator integrator follows the
    analytic parabola (velocity-level check of the free-body path)."""
    from seqdex_tpu.core import builders
    from seqdex_tpu.envs.mini import mini_arm
    from seqdex_tpu.sim.scene import compile_scene
    from seqdex_tpu.sim.simulator import SimConfig, make_sim

    # the articulation is scenery here (free-body path under test) — use the
    # compile-small fixture arm instead of the 40-link flagship scene
    art_spec = mini_arm()
    brick = builders.lego_brick("1x2", name="b")
    scene = compile_scene(art_spec, bodies=[brick], statics=[])
    sim = make_sim(scene, SimConfig(substeps=2, solver_iterations=2,
                                    max_contacts=8))
    s = sim.init_state()
    body = scene.body_index("b")
    v0 = jnp.asarray([0.5, -0.2, 1.0])
    s = s._replace(
        body_pos=s.body_pos.at[body].set(jnp.asarray([5.0, 5.0, 5.0])),
        body_linvel=s.body_linvel.at[body].set(v0),
    )
    step = jax.jit(sim.step)
    T = 30
    for _ in range(T):
        s = step(s)
    t = T * sim.config.dt
    # symplectic Euler closed form over n substeps:
    # x(n) = x0 + h*sum_k v(k), v(k) = v0 + k h g
    h = sim.config.dt / sim.config.substeps
    n = T * sim.config.substeps
    g = -9.81
    z = 5.0 + h * (n * 1.0 + g * h * n * (n + 1) / 2)
    xy = np.array([5.0, 5.0]) + np.array([0.5, -0.2]) * t
    np.testing.assert_allclose(np.asarray(s.body_pos[body][:2]), xy, atol=1e-4)
    np.testing.assert_allclose(float(s.body_pos[body][2]), z, atol=1e-3)
