"""LDraw import (`assets/urdf/blender/ldr2urdf.py` analog) and point-cloud
tooling (`utils/o3dviewer.py`, `utils/test_pe_datasets.py` analogs)."""

import numpy as np

from seqdex_tpu.core import ldraw
from seqdex_tpu.utils import pointcloud

LDR = """0 test model
0 Name: test.ldr
1 4 0 -24 0 1 0 0 0 1 0 0 0 1 3004.dat
1 14 20 -48 0 0 0 -1 0 1 0 1 0 0 3005.dat
1 2 0 0 0 1 0 0 0 1 0 0 0 1 9999.dat
"""


def test_parse_ldr_type1_lines():
    parts = ldraw.parse_ldr(LDR)
    assert len(parts) == 3
    assert parts[0].part == "3004" and parts[0].kind == "1x2"
    assert parts[1].part == "3005" and parts[1].kind == "1x1"
    assert parts[2].kind is None  # unknown part id
    # LDraw y-down -> z-up: y=-24 LDU becomes +z 24*0.4mm
    np.testing.assert_allclose(parts[0].pos, [0.0, 0.0, 24 * 0.0004], atol=1e-9)
    # rotation stays orthonormal after the basis change
    R = parts[1].rot
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_to_body_specs_and_urdf():
    parts = ldraw.parse_ldr(LDR)
    specs = ldraw.to_body_specs(parts)
    assert len(specs) == 2  # unknown part skipped
    spec, pos, quat = specs[0]
    assert spec.geoms and abs(np.linalg.norm(quat) - 1) < 1e-5
    docs = ldraw.to_urdf(parts)
    # one standalone single-root URDF per part (reference converter emits
    # one file per part; a multi-link joint-less <robot> is invalid URDF)
    assert len(docs) == 2
    for doc in docs:
        assert doc.count("<link") == 1 and "box size=" in doc
        assert doc.count("<robot") == 1
    # each doc must re-parse through our own URDF loader
    import tempfile

    from seqdex_tpu.core import urdf as urdflib

    for doc in docs:
        with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
            f.write(doc)
            path = f.name
        parsed = urdflib.load_urdf(path, fix_base=False)
        assert parsed is not None


def test_project_points_bounds_and_validity():
    # a point straight ahead (robot-frame +x is camera-frame +z)
    pts = np.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    uv, valid = pointcloud.project_points(pts)
    assert valid[0] and not valid[1]  # behind camera invalid
    # straight-ahead point lands at the principal point
    np.testing.assert_allclose(uv[0], [327, 245], atol=1.0)


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(50, 3).astype(np.float32)
    log = pointcloud.PointCloudLog(str(tmp_path / "pc"))
    p = log.update(pts)
    back = pointcloud.read_ply(p)
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-5)
