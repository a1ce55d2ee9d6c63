"""Point-cloud tooling: viewer-free visualization + camera projection.

TPU-native stand-ins for two reference utilities that depend on open3d/cv2
(neither available here, and a GUI viewer makes no sense on a pod):

* `utils/o3dviewer.py` `PointcloudVisualizer` — replaced by `PointCloudLog`,
  which writes ASCII PLY frames (any viewer opens them offline) and can
  render a matplotlib scatter when available.
* `utils/test_pe_datasets.py` `project_point_cloud` — replaced by
  `project_points`, the same pinhole projection (camera-frame remap +
  intrinsics) as pure numpy, returning pixel coords + a validity mask
  instead of painting into an image.
"""

from __future__ import annotations

import os

import numpy as np

# the reference's camera-frame remap (`test_pe_datasets.py:13-17`):
# x_cam = -y, y_cam = -z, z_cam = x (rows of R; applied as p @ R.T there)
_PE_ROTATION = np.array(
    [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], dtype=np.float32
)
# reference RealSense-ish intrinsics (`test_pe_datasets.py:19-22`)
DEFAULT_INTRINSICS = np.array(
    [[434.2199, 0.0, 326.772], [0.0, 433.0419, 245.07], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)


def project_points(points, intrinsics=None, image_size=(640, 480),
                   apply_pe_rotation=True):
    """Pinhole-project (N, 3) world/robot-frame points to pixel coords.

    Returns (uv int (N, 2), valid bool (N,)): valid = in front of the camera
    and inside the image bounds — the reference's inline boundary check
    (`test_pe_datasets.py:32-40`)."""
    pts = np.asarray(points, dtype=np.float32)
    if apply_pe_rotation:
        pts = pts @ _PE_ROTATION.T
    K = np.asarray(intrinsics if intrinsics is not None else DEFAULT_INTRINSICS)
    z = pts[:, 2:3]
    in_front = z[:, 0] > 1e-6
    zs = np.where(in_front[:, None], z, 1.0)
    uv = (pts[:, :2] / zs) * np.diagonal(K)[:2] + K[:2, 2]
    uv = np.round(uv).astype(np.int64)
    w, h = image_size
    valid = (
        in_front
        & (uv[:, 0] >= 0) & (uv[:, 0] < w)
        & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    )
    return uv, valid


def write_ply(path: str, points, colors=None) -> str:
    """Write an ASCII PLY point cloud (what o3d.io would read back)."""
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    cols = None
    if colors is not None:
        cols = np.clip(np.asarray(colors).reshape(-1, 3), 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if cols is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(pts):
            line = f"{p[0]} {p[1]} {p[2]}"
            if cols is not None:
                line += f" {cols[i][0]} {cols[i][1]} {cols[i][2]}"
            f.write(line + "\n")
    return path


def read_ply(path: str) -> np.ndarray:
    """Read back vertices of an ASCII PLY written by `write_ply`."""
    with open(path) as f:
        n = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        pts = [list(map(float, f.readline().split()[:3])) for _ in range(n)]
    return np.asarray(pts, dtype=np.float32)


class PointCloudLog:
    """Frame-by-frame point-cloud recorder (the `PointcloudVisualizer`
    replacement): `update(points)` writes `frame_%05d.ply` under `logdir`;
    `render_last()` draws a 3D scatter if matplotlib is importable."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self.frame = 0
        os.makedirs(logdir, exist_ok=True)

    def update(self, points, colors=None) -> str:
        path = os.path.join(self.logdir, f"frame_{self.frame:05d}.ply")
        write_ply(path, points, colors)
        self.frame += 1
        return path

    def render_last(self, out_path=None):
        if self.frame == 0:
            return None
        pts = read_ply(
            os.path.join(self.logdir, f"frame_{self.frame - 1:05d}.ply")
        )
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1)
        out_path = out_path or os.path.join(self.logdir, "last_frame.png")
        fig.savefig(out_path, dpi=80)
        plt.close(fig)
        return out_path
