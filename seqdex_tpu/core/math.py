"""Quaternion / SE(3) math for the TPU-native SeqDex rebuild.

Conventions
-----------
* Quaternions are stored ``(x, y, z, w)`` — the IsaacGym layout — so that
  observation vectors match the reference bit-for-bit in ordering
  (reference: `isaacgym.torch_utils`, used throughout
  `tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py`).
* All functions are pure jnp, broadcast over arbitrary leading batch dims,
  and are safe under ``jit`` / ``vmap`` / ``grad``.

Reference parity: semantics of `quat_mul/quat_apply/quat_conjugate/
quat_from_angle_axis/tf_combine/tf_inverse` follow isaacgym.torch_utils
(the public IsaacGym math API the reference relies on), and
`orientation_error` follows
`tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py:1788-1792`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (xyzw)."""
    u = q[..., :3]
    w = q[..., 3:4]
    # v' = v + 2*w*(u×v) + 2*(u×(u×v))
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_apply(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """angle: (...,), axis: (..., 3) unit vectors -> quat xyzw."""
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([axis * s, w], axis=-1)


def quat_axis(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Basis vector `axis` of the rotation frame (isaacgym.torch_utils.quat_axis)."""
    basis = jnp.zeros(q.shape[:-1] + (3,)).at[..., axis].set(1.0)
    return quat_apply(q, basis)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyzw -> (..., 3, 3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) xyzw. Branch-free Shepperd via 4-candidate select."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate w-major
    qw0 = 0.5 * safe_sqrt(1.0 + tr)
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01)], axis=-1) / (4.0 * qw0[..., None])
    cand0 = jnp.concatenate([c0, qw0[..., None]], axis=-1)
    # x-major
    qx1 = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    cand1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)],
        axis=-1,
    )
    # y-major
    qy2 = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    cand2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)],
        axis=-1,
    )
    # z-major
    qz3 = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    cand3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)],
        axis=-1,
    )
    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    """URDF rpy (extrinsic XYZ == intrinsic ZYX applied R = Rz Ry Rx) -> xyzw."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q: jnp.ndarray):
    """xyzw -> (roll, pitch, yaw)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def quat_diff_rad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle between two quaternions (isaacgym.torch_utils semantics)."""
    d = quat_mul(a, quat_conjugate(b))
    return 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(d[..., :3], axis=-1), 0.0, 1.0))


def orientation_error(desired: jnp.ndarray, current: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle-ish error used by the reference's damped-LS IK
    (`..._grasp_sim.py:1788-1792`)."""
    q_r = quat_mul(desired, quat_conjugate(current))
    return q_r[..., :3] * jnp.sign(q_r[..., 3:4])


# ---------------------------------------------------------------------------
# Rigid transforms (p, q) pairs
# ---------------------------------------------------------------------------


def tf_combine(q1, p1, q2, p2):
    """Compose transforms: (q1,p1) ∘ (q2,p2). Returns (q, p)."""
    return quat_mul(q1, q2), quat_apply(q1, p2) + p1


def tf_inverse(q, p):
    qc = quat_conjugate(q)
    return qc, -quat_apply(qc, p)


def tf_apply(q, p, v):
    return quat_apply(q, v) + p


# ---------------------------------------------------------------------------
# Integration helpers
# ---------------------------------------------------------------------------


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity omega over dt."""
    dq = quat_mul(jnp.concatenate([omega, jnp.zeros_like(omega[..., :1])], axis=-1), q)
    return quat_normalize(q + 0.5 * dt * dq)


def scale_to_limits(x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [lower, upper] (isaacgym `scale`)."""
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def unscale_from_limits(x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray) -> jnp.ndarray:
    """[lower, upper] -> [-1, 1] (isaacgym `unscale`)."""
    return (2.0 * x - upper - lower) / (upper - lower)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    m = jnp.stack(
        [zeros, -vz, vy, vz, zeros, -vx, -vy, vx, zeros], axis=-1
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def random_quat(key) -> jnp.ndarray:
    """Uniform random rotation (Shoemake)."""
    u = jax.random.uniform(key, (3,))
    a, b, c = u[0], u[1], u[2]
    sq1 = jnp.sqrt(1 - a)
    sq2 = jnp.sqrt(a)
    two_pi = 2 * jnp.pi
    return jnp.stack(
        [
            sq1 * jnp.sin(two_pi * b),
            sq1 * jnp.cos(two_pi * b),
            sq2 * jnp.sin(two_pi * c),
            sq2 * jnp.cos(two_pi * c),
        ]
    )
