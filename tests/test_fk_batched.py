"""Level-batched FK / closed-form bias vs the serial reference recursions.

The round-4 FK rewrite (kinematics.py) replaces the per-link Python loops
with per-tree-depth batched ops + ancestor-matrix matmuls; these tests pin
exact agreement with the serial implementations on the real robot topology
and on a mixed revolute/prismatic chain.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seqdex_tpu.core.builders import franka_allegro
from seqdex_tpu.core.model import (
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    ArticulationSpec,
    JointSpec,
    LinkSpec,
    compile_articulation,
)
from seqdex_tpu.sim.kinematics import make_dynamics, make_kinematics


def mixed_chain():
    """Revolute + prismatic + fixed links, with a branch."""
    links = [
        LinkSpec(name="base", parent=None, mass=0.0),
        LinkSpec(
            name="r1", parent="base",
            joint=JointSpec(JOINT_REVOLUTE, (0, 0, 1), lower=-10, upper=10, effort=10),
            origin_pos=(0.1, 0.0, 0.2), origin_rpy=(0.1, -0.2, 0.3),
            mass=1.0, com=(0.05, 0.02, 0.0), inertia=(0.01, 0.012, 0.008, 0, 0, 0),
        ),
        LinkSpec(
            name="p1", parent="r1",
            joint=JointSpec(JOINT_PRISMATIC, (1, 0, 0), lower=-1, upper=1, effort=10),
            origin_pos=(0.3, 0.0, 0.0), origin_rpy=(0.0, 0.4, 0.0),
            mass=0.5, com=(0.1, 0.0, 0.05), inertia=(0.005, 0.006, 0.004, 0, 0, 0),
        ),
        LinkSpec(
            name="f1", parent="p1", origin_pos=(0.05, 0.05, 0.0),
            mass=0.2, com=(0.0, 0.0, 0.02), inertia=(0.001, 0.001, 0.001, 0, 0, 0),
        ),
        LinkSpec(
            name="r2", parent="f1",
            joint=JointSpec(JOINT_REVOLUTE, (0, 1, 0), lower=-10, upper=10, effort=10),
            origin_pos=(0.0, 0.1, 0.1), origin_rpy=(0.2, 0.0, -0.1),
            mass=0.4, com=(0.08, 0.0, 0.0), inertia=(0.002, 0.003, 0.003, 0, 0, 0),
        ),
        # branch off r1
        LinkSpec(
            name="r3", parent="r1",
            joint=JointSpec(JOINT_REVOLUTE, (1, 0, 0), lower=-10, upper=10, effort=10),
            origin_pos=(-0.1, 0.2, 0.0),
            mass=0.3, com=(0.0, 0.06, 0.0), inertia=(0.002, 0.002, 0.002, 0, 0, 0),
        ),
    ]
    return ArticulationSpec(name="mixed", links=links, base_pos=(0.1, -0.2, 0.5),
                            base_rpy=(0.05, 0.1, -0.3))


def _arts():
    return [compile_articulation(mixed_chain()),
            compile_articulation(franka_allegro())]


def test_fk_batched_equals_serial():
    for art in _arts():
        fk, *_ = make_kinematics(art)
        key = jax.random.PRNGKey(0)
        for i in range(3):
            k1, k2, key = jax.random.split(key, 3)
            q = jax.random.uniform(k1, (art.ndof,), minval=-1.0, maxval=1.0)
            q = jnp.clip(q, jnp.asarray(art.lower, jnp.float32),
                         jnp.asarray(art.upper, jnp.float32))
            qd = jax.random.normal(k2, (art.ndof,))
            a = fk(q, qd)
            b = fk.reference(q, qd)
            np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                                       atol=1e-5)
            # quats agree up to sign per link
            qa, qb = np.asarray(a.quat), np.asarray(b.quat)
            sign = np.sign(np.sum(qa * qb, axis=-1, keepdims=True))
            np.testing.assert_allclose(qa, sign * qb, atol=1e-5)
            np.testing.assert_allclose(np.asarray(a.linvel), np.asarray(b.linvel),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(a.angvel), np.asarray(b.angvel),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(a.dof_axis_w),
                                       np.asarray(b.dof_axis_w), atol=1e-5)
            np.testing.assert_allclose(np.asarray(a.dof_origin_w),
                                       np.asarray(b.dof_origin_w), atol=1e-5)


def test_bias_batched_equals_serial():
    for art in _arts():
        fk, *_ = make_kinematics(art)
        mass_matrix, bias_forces, _, _ = make_dynamics(art)
        key = jax.random.PRNGKey(42)
        for i in range(3):
            k1, k2, key = jax.random.split(key, 3)
            q = jax.random.uniform(k1, (art.ndof,), minval=-1.0, maxval=1.0)
            q = jnp.clip(q, jnp.asarray(art.lower, jnp.float32),
                         jnp.asarray(art.upper, jnp.float32))
            qd = jax.random.normal(k2, (art.ndof,))
            res = fk(q, qd)
            a = np.asarray(bias_forces(res, qd))
            b = np.asarray(bias_forces.reference(res, qd))
            np.testing.assert_allclose(a, b, atol=2e-4,
                                       rtol=1e-4)


def test_fk_batched_vmap_jit():
    art = compile_articulation(mixed_chain())
    fk, *_ = make_kinematics(art)
    key = jax.random.PRNGKey(7)
    q = jax.random.uniform(key, (16, art.ndof), minval=-0.5, maxval=0.5)
    qd = jax.random.normal(key, (16, art.ndof))
    batched = jax.jit(jax.vmap(fk))(q, qd)
    single = fk(q[3], qd[3])
    np.testing.assert_allclose(np.asarray(batched.pos[3]),
                               np.asarray(single.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batched.linvel[3]),
                               np.asarray(single.linvel), atol=1e-5)
