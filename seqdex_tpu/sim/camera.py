"""Analytic segmentation camera for the Search task.

TPU-native replacement for the IsaacGym GPU camera + segmentation renderer
(reference: 128x128 segmentation images via `gym.create_camera_sensor` /
`get_camera_image_gpu_tensor`, `allegro_hand_block_assembly_search.py:755-758,
873-882`). The reference only ever consumes three scalars from the image:
per-target pixel count and centroid x/y (`search.py:1231-1241`,
`:1140-1166`: `segmentation_object_point_num`, `..._center_point_x/y`).

So instead of rasterizing, we ray-cast a WxH grid of pinhole rays against the
(target + occluder) boxes: a pixel belongs to the target when the target box
is the nearest hit. Branch-free slab tests, fixed shapes, vmappable —
~W*H*(n_boxes) ray-box tests per env on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import quat_apply, quat_conjugate


def ray_box_t(origin, direction, box_pos, box_quat, half):
    """First-hit distance of rays against an oriented box (slab method).

    origin: (3,), direction: (R, 3) unit rays — world frame
    box_pos: (B, 3), box_quat: (B, 4), half: (B, 3)
    returns t: (R, B), +inf where no hit.

    Layout discipline: everything is computed on (B, R) component planes
    (rotation entries from the quaternion as (B,) planes, slabs merged
    axis-by-axis) — no (R, B, 3) intermediates; the trailing-3 formulation
    cost ~15 ms/step at Search scale (128 envs x 4096 rays x 132 boxes).
    """
    # box-frame ray components via R^T, plane form
    qx, qy, qz, qw = (box_quat[:, 0], box_quat[:, 1], box_quat[:, 2],
                      box_quat[:, 3])
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qz * qw)
    r02 = 2 * (qx * qz + qy * qw)
    r10 = 2 * (qx * qy + qz * qw)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qx * qw)
    r20 = 2 * (qx * qz - qy * qw)
    r21 = 2 * (qy * qz + qx * qw)
    r22 = 1 - 2 * (qy * qy + qx * qx)
    # origin in box frame: (B,) planes
    ex = origin[0] - box_pos[:, 0]
    ey = origin[1] - box_pos[:, 1]
    ez = origin[2] - box_pos[:, 2]
    ox = r00 * ex + r10 * ey + r20 * ez
    oy = r01 * ex + r11 * ey + r21 * ez
    oz = r02 * ex + r12 * ey + r22 * ez
    # ray directions in box frame: (B, R) planes
    dxw, dyw, dzw = direction[:, 0], direction[:, 1], direction[:, 2]

    def _axis(ra, rb, rc, o_a, h_a):
        d = (ra[:, None] * dxw[None, :] + rb[:, None] * dyw[None, :]
             + rc[:, None] * dzw[None, :])  # (B, R)
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9,
                              jnp.where(d >= 0, 1e-9, -1e-9), d)
        t1 = (-h_a - o_a)[:, None] * inv
        t2 = (h_a - o_a)[:, None] * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    n1, x1 = _axis(r00, r10, r20, ox, half[:, 0])
    n2, x2 = _axis(r01, r11, r21, oy, half[:, 1])
    n3, x3 = _axis(r02, r12, r22, oz, half[:, 2])
    tmin = jnp.maximum(n1, jnp.maximum(n2, n3))
    tmax = jnp.minimum(x1, jnp.minimum(x2, x3))
    hit = tmax >= jnp.maximum(tmin, 0.0)
    t = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    return t.T  # (R, B)


def _min_argmin_reduce(t):
    """(min, argmin) over axis 0 of a (B, R) grid in one variadic reduce —
    XLA fuses the slab-test producer in, so the grid is read once and never
    materialized."""
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)

    def merge(a, b):
        ta, ia = a
        tb, ib = b
        take_a = ta <= tb
        return jnp.where(take_a, ta, tb), jnp.where(take_a, ia, ib)

    return jax.lax.reduce((t, iota), (jnp.float32(jnp.inf), jnp.int32(0)),
                          merge, (0,))


def make_segmentation_camera(width: int = 128, height: int = 128,
                             fov_x: float = 0.9):
    """Returns seg_stats(cam_pos, cam_quat, target_idx, box_pos, box_quat,
    box_half) -> (pixel_count, cx, cy).

    Camera convention: looks along +z of the camera frame, x right, y down
    (image row = y). fov_x is the half-angle tangent scale.
    """
    # pixel ray directions in camera frame
    xs = (jnp.arange(width) + 0.5) / width * 2 - 1  # [-1, 1]
    ys = (jnp.arange(height) + 0.5) / height * 2 - 1
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    dirs_cam = jnp.stack(
        [px * fov_x, py * fov_x * (height / width), jnp.ones_like(px)], axis=-1
    )
    dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_cam = dirs_cam.reshape(-1, 3)  # (R, 3)
    ix = jnp.arange(width * height) % width
    iy = jnp.arange(width * height) // width

    def seg_stats(cam_pos, cam_quat, target_idx, box_pos, box_quat, box_half):
        """target_idx: int index into the box arrays. Returns
        (count, cx, cy) with centroid in pixel units (x: col, y: row)."""
        dirs_w = quat_apply(cam_quat[None, :], dirs_cam)  # (R, 3)
        t_br = ray_box_t(cam_pos, dirs_w, box_pos, box_quat, box_half).T  # (B, R)
        t_min, argmin = _min_argmin_reduce(t_br)  # (R,) each, single pass
        visible = jnp.isfinite(t_min) & (argmin == target_idx)
        count = jnp.sum(visible)
        denom = jnp.maximum(count, 1)
        cx = jnp.sum(jnp.where(visible, ix, 0)) / denom
        cy = jnp.sum(jnp.where(visible, iy, 0)) / denom
        return count.astype(jnp.float32), cx.astype(jnp.float32), cy.astype(jnp.float32)

    return seg_stats
