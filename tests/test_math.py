import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.core import math as m


def rot_scipy(q):
    """xyzw quat -> rotation matrix via an independent formula."""
    from numpy import array

    x, y, z, w = q
    n = np.dot(q, q)
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return array(
        [
            [1 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1 - (xx + yy)],
        ]
    )


def test_quat_mul_identity():
    q = m.quat_normalize(jnp.array([0.1, -0.2, 0.3, 0.9]))
    e = m.quat_identity()
    np.testing.assert_allclose(m.quat_mul(q, e), q, atol=1e-6)
    np.testing.assert_allclose(m.quat_mul(e, q), q, atol=1e-6)


def test_quat_mul_vs_matrix():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    qa = m.random_quat(k1)
    qb = m.random_quat(k2)
    Rab = np.asarray(m.quat_to_matrix(m.quat_mul(qa, qb)))
    np.testing.assert_allclose(
        Rab, rot_scipy(np.asarray(qa)) @ rot_scipy(np.asarray(qb)), atol=1e-5
    )


def test_quat_apply_matches_matrix():
    q = m.random_quat(jax.random.PRNGKey(1))
    v = jnp.array([0.3, -1.2, 2.0])
    np.testing.assert_allclose(
        np.asarray(m.quat_apply(q, v)), rot_scipy(np.asarray(q)) @ np.asarray(v), atol=1e-5
    )


def test_matrix_quat_roundtrip():
    for seed in range(8):
        q = m.random_quat(jax.random.PRNGKey(seed))
        q2 = m.matrix_to_quat(m.quat_to_matrix(q))
        # q and -q are the same rotation
        d = min(np.abs(np.asarray(q) - np.asarray(q2)).max(),
                np.abs(np.asarray(q) + np.asarray(q2)).max())
        assert d < 1e-5


def test_quat_from_angle_axis():
    q = m.quat_from_angle_axis(jnp.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    v = m.quat_apply(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_euler_roundtrip():
    rpy = jnp.array([0.3, -0.4, 1.2])
    q = m.quat_from_euler_xyz(*rpy)
    r, p, y = m.quat_to_euler_xyz(q)
    np.testing.assert_allclose([r, p, y], rpy, atol=1e-5)


def test_tf_combine_inverse():
    k = jax.random.PRNGKey(3)
    q = m.random_quat(k)
    p = jnp.array([0.5, -1.0, 2.0])
    qi, pi = m.tf_inverse(q, p)
    qc, pc = m.tf_combine(q, p, qi, pi)
    np.testing.assert_allclose(np.asarray(pc), np.zeros(3), atol=1e-5)
    assert abs(abs(float(qc[3])) - 1.0) < 1e-5


def test_orientation_error_zero_at_match():
    q = m.random_quat(jax.random.PRNGKey(4))
    err = m.orientation_error(q, q)
    np.testing.assert_allclose(np.asarray(err), np.zeros(3), atol=1e-6)


def test_scale_unscale():
    lo = jnp.array([-1.0, 0.0])
    hi = jnp.array([1.0, 4.0])
    x = jnp.array([0.5, -0.25])
    s = m.scale_to_limits(x, lo, hi)
    np.testing.assert_allclose(np.asarray(m.unscale_from_limits(s, lo, hi)), np.asarray(x), atol=1e-6)


def test_quat_integrate_constant_omega():
    omega = jnp.array([0.0, 0.0, jnp.pi])  # half-turn/s
    dt = 1e-3
    q = jax.lax.fori_loop(
        0, 1000, lambda _, q: m.quat_integrate(q, omega, dt), m.quat_identity()
    )
    # after 1 s: rotation by pi about z
    v = m.quat_apply(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [-1.0, 0.0, 0.0], atol=1e-2)


def test_quat_diff_rad():
    qa = m.quat_identity()
    qb = m.quat_from_angle_axis(jnp.array(0.7), jnp.array([0.0, 1.0, 0.0]))
    assert abs(float(m.quat_diff_rad(qa, qb)) - 0.7) < 1e-5
