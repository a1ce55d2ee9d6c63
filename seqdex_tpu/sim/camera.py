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
    """
    qc = quat_conjugate(box_quat)
    o = quat_apply(qc[None, :, :], origin[None, None, :] - box_pos[None, :, :])  # (1,B,3)
    d = quat_apply(qc[None, :, :], direction[:, None, :])  # (R,B,3)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d >= 0, 1e-9, -1e-9), d)
    t1 = (-half[None] - o) * inv
    t2 = (half[None] - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    return t


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
        t = ray_box_t(cam_pos, dirs_w, box_pos, box_quat, box_half)  # (R, B)
        t_min = jnp.min(t, axis=-1)
        argmin = jnp.argmin(t, axis=-1)
        visible = jnp.isfinite(t_min) & (argmin == target_idx)
        count = jnp.sum(visible)
        denom = jnp.maximum(count, 1)
        cx = jnp.sum(jnp.where(visible, ix, 0)) / denom
        cy = jnp.sum(jnp.where(visible, iy, 0)) / denom
        return count.astype(jnp.float32), cx.astype(jnp.float32), cy.astype(jnp.float32)

    return seg_stats
