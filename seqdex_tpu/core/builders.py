"""Procedural model builders for the SeqDex scenes.

TPU-native replacement for the reference's URDF assets
(`assets/urdf/franka_description/robots/franka_panda_allegro.urdf`,
`assets/urdf/blender/urdf/*.urdf`, table/bin boxes created in
`tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py:629-680`).

The kinematic/limit numbers below are the physical parameters of the
Franka Emika Panda and Wonik Allegro v4 right hand (public robot specs, also
present in the reference URDF); arm link inertials use the published Panda
identification values (Gaz et al. 2019) since the reference URDF leaves them
to IsaacGym defaults. Collision geometry is re-derived as primitive
boxes/spheres sized for the contact-point SDF pipeline — *not* the reference
meshes.

LEGO bricks follow the reference's 3 cm module grid (mesh bounding boxes of
`assets/urdf/blender/origin_obj/*`): footprint n*0.03 x m*0.03 m, body height
0.0455 m, stud crown to 0.0575 m, density 567 kg/m^3
(`assets/urdf/blender/urdf/1x2.urdf` inertial density).
"""

from __future__ import annotations

import numpy as np

from .model import (
    GEOM_BOX,
    GEOM_PLANE,
    GEOM_SPHERE,
    JOINT_FIXED,
    JOINT_REVOLUTE,
    ArticulationSpec,
    BodySpec,
    GeomSpec,
    JointSpec,
    LinkSpec,
    StaticGeomSpec,
)

# ---------------------------------------------------------------------------
# Franka Panda arm (7 revolute dofs)
# ---------------------------------------------------------------------------

# name, parent, origin xyz, origin rpy, axis, (lower, upper, effort, velocity)
_PANDA_JOINTS = [
    ("panda_link1", "panda_link0", (0, 0, 0.333), (0, 0, 0), (0, 0, 1), (-2.8973, 2.8973, 87.0, 2.175)),
    ("panda_link2", "panda_link1", (0, 0, 0), (-1.57079632679, 0, 0), (0, 0, 1), (-1.7628, 1.7628, 87.0, 2.175)),
    ("panda_link3", "panda_link2", (0, -0.316, 0), (1.57079632679, 0, 0), (0, 0, 1), (-2.8973, 2.8973, 87.0, 2.175)),
    ("panda_link4", "panda_link3", (0.0825, 0, 0), (1.57079632679, 0, 0), (0, 0, 1), (-3.0718, -0.0698, 87.0, 2.175)),
    ("panda_link5", "panda_link4", (-0.0825, 0.384, 0), (-1.57079632679, 0, 0), (0, 0, 1), (-2.8973, 2.8973, 12.0, 2.61)),
    ("panda_link6", "panda_link5", (0, 0, 0), (1.57079632679, 0, 0), (0, 0, 1), (-0.0175, 3.7525, 12.0, 2.61)),
    ("panda_link7", "panda_link6", (0.088, 0, 0), (1.57079632679, 0, 0), (0, 0, 1), (-2.8973, 2.8973, 12.0, 2.61)),
]

# Published Panda link inertials (mass, com, [ixx iyy izz ixy ixz iyz])
_PANDA_INERTIAL = {
    "panda_link0": (2.92, (-0.026, 0.0, 0.057), (0.008, 0.010, 0.009, 0, 0, 0)),
    "panda_link1": (4.97, (0.0, -0.032, -0.068), (0.070, 0.068, 0.012, 0, 0, 0.014)),
    "panda_link2": (0.647, (0.0, -0.069, 0.032), (0.008, 0.003, 0.008, 0, 0, 0.003)),
    "panda_link3": (3.228, (0.044, 0.025, -0.038), (0.037, 0.036, 0.011, -0.005, -0.006, 0.007)),
    "panda_link4": (3.588, (-0.039, 0.103, 0.027), (0.026, 0.028, 0.031, 0.008, -0.001, 0.001)),
    "panda_link5": (1.226, (-0.011, 0.041, -0.384 + 0.26), (0.036, 0.034, 0.006, -0.002, 0.003, -0.006)),
    "panda_link6": (1.667, (0.061, -0.014, -0.010), (0.002, 0.006, 0.005, 0.0, 0.0, 0.0)),
    "panda_link7": (0.735, (0.010, -0.004, 0.062), (0.013, 0.013, 0.005, -0.004, 0.001, -0.001)),
}

# approximate bounding spheres for arm links (collision proxies vs table only)
_PANDA_COLLIDER_R = {
    "panda_link1": 0.09,
    "panda_link2": 0.09,
    "panda_link3": 0.08,
    "panda_link4": 0.08,
    "panda_link5": 0.08,
    "panda_link6": 0.07,
    "panda_link7": 0.06,
}

# ---------------------------------------------------------------------------
# Allegro hand (16 revolute dofs, 4 fingers x 4 joints)
# ---------------------------------------------------------------------------

# finger geometry shared by index/middle/ring chains
_FINGER_SEGMENTS = {
    # link base name suffix: (box half extents, box offset z, mass, inertia6)
    "proximal_hub": ((0.0098, 0.01375, 0.0082), 0.0082, 0.005,
                     (5.1458e-05, 5.1458e-05, 6.125e-05, 0, 0, 0)),
    "proximal": ((0.0098, 0.01375, 0.027), 0.027, 0.125164,
                 (6.39979e-06, 8.88687e-05, 9.13751e-05, 0, 0, 0)),
    "medial": ((0.0098, 0.01375, 0.0192), 0.0192, 0.131691,
               (7.04217e-05, 3.95744e-05, 6.61125e-05, 0, 0, 0)),
    "distal": ((0.0098, 0.01375, 0.01335), 0.01335, 0.131691,
               (7.04217e-05, 3.95744e-05, 6.61125e-05, 0, 0, 0)),
}

# (finger index f, chain spec): base-attached fingers 0..2 then thumb
# joints: (xyz, rpy, axis, (lower, upper))
_ALLEGRO_FINGERS = {
    # index (links 0-3)
    0: {
        "root_xyz": (0.0, -0.0435, -0.001542),
        "root_rpy": (0.08726646255, 0.0, 0.0),
    },
    # middle (links 4-7)
    1: {
        "root_xyz": (0.0, 0.0, 0.0007),
        "root_rpy": (0.0, 0.0, 0.0),
    },
    # ring (links 8-11)
    2: {
        "root_xyz": (0.0, 0.0435, -0.001542),
        "root_rpy": (-0.08726646255, 0.0, 0.0),
    },
}

_FINGER_JOINT_LIMITS = [
    (-0.47, 0.47),  # abduction (z axis)
    (-0.196, 1.61),  # proximal (y axis)
    (-0.174, 1.709),  # medial
    (-0.227, 1.618),  # distal
]

_THUMB_JOINT_LIMITS = [
    (0.263, 1.396),
    (-0.105, 1.163),
    (-0.189, 1.644),
    (-0.162, 1.719),
]

FINGERTIP_LINKS = ("link_3.0_tip", "link_7.0_tip", "link_11.0_tip", "link_15.0_tip")
# 12 FSR contact-sensor sites, mapped to the links whose contact force each FSR
# reads (reference sensor list `..._grasp_sim.py:182-186`)
FSR_LINKS = (
    "link_1.0", "link_2.0", "link_3.0_tip",
    "link_5.0", "link_6.0", "link_7.0_tip",
    "link_9.0", "link_10.0", "link_11.0_tip",
    "link_14.0", "link_15.0", "link_15.0_tip",
)

HAND_BASE_LINK = "base_link"  # allegro palm root; IK target frame
PALM_LINK = "palm"

# default arm pose (reference `..._grasp_sim.py:247`)
DEFAULT_ARM_QPOS = (0.0621, 0.3445, 0.3000, -2.3935, -0.2406, 2.7193, 2.1295)


def _finger_links(f: int, root_xyz, root_rpy, limits) -> list:
    """One 4-dof finger chain: hub -> proximal -> medial -> distal (+ tip)."""
    l0, l1, l2, l3 = f * 4, f * 4 + 1, f * 4 + 2, f * 4 + 3
    g = _FINGER_SEGMENTS
    mk_geom = lambda key: GeomSpec(
        GEOM_BOX, g[key][0], pos=(0, 0, g[key][1]), friction=1.2, group=0,
        point_detail=1,
    )
    links = [
        LinkSpec(
            name=f"link_{l0}.0", parent="base_link",
            joint=_rev((0, 0, 1), lim2=limits[0], armature=1e-3),
            origin_pos=root_xyz, origin_rpy=root_rpy,
            mass=g["proximal_hub"][2], com=(0, 0, 0.008), inertia=g["proximal_hub"][3],
            geoms=[mk_geom("proximal_hub")],
        ),
        LinkSpec(
            name=f"link_{l1}.0", parent=f"link_{l0}.0",
            joint=_rev((0, 1, 0), lim2=limits[1], armature=1e-3),
            origin_pos=(0, 0, 0.0164),
            mass=g["proximal"][2], com=(0, 0, 0.027), inertia=g["proximal"][3],
            geoms=[mk_geom("proximal")],
        ),
        LinkSpec(
            name=f"link_{l2}.0", parent=f"link_{l1}.0",
            joint=_rev((0, 1, 0), lim2=limits[2], armature=1e-3),
            origin_pos=(0, 0, 0.054),
            mass=g["medial"][2], com=(0, 0, 0.019), inertia=g["medial"][3],
            geoms=[mk_geom("medial")],
        ),
        LinkSpec(
            name=f"link_{l3}.0", parent=f"link_{l2}.0",
            joint=_rev((0, 1, 0), lim2=limits[3], armature=1e-3),
            origin_pos=(0, 0, 0.0384),
            mass=g["distal"][2], com=(0, 0, 0.013), inertia=g["distal"][3],
            geoms=[mk_geom("distal")],
        ),
        LinkSpec(
            name=f"link_{l3}.0_tip", parent=f"link_{l3}.0",
            joint=JointSpec(JOINT_FIXED),
            origin_pos=(0, 0, 0.060),
            mass=0.02, com=(0, 0, 0), inertia=(2e-6, 2e-6, 2e-6, 0, 0, 0),
            geoms=[
                GeomSpec(GEOM_SPHERE, (0.0135, 0, 0), pos=(0, 0, -0.004), friction=1.5, group=0),
                GeomSpec(GEOM_SPHERE, (0.012, 0, 0), pos=(0, 0, 0.012), friction=1.5, group=0),
            ],
        ),
    ]
    return links


def _rev(axis, lim4=None, lim2=None, armature=0.0, damping=0.0):
    if lim4 is not None:
        lo, hi, eff, vel = lim4
    else:
        lo, hi = lim2
        eff, vel = 10.0, 10.0
    return JointSpec(
        jtype=JOINT_REVOLUTE, axis=axis, lower=lo, upper=hi, effort=eff,
        max_velocity=vel, armature=armature, damping=damping,
    )


def franka_allegro(base_pos=(-0.35, 0.0, 0.6)) -> ArticulationSpec:
    """Franka Panda + Allegro right hand, 23 dofs, fixed base.

    Matches the reference robot (`franka_panda_allegro.urdf`, 23 dofs:
    `..._grasp_sim.py:172` num actions, `..._search.py:475`) with primitive
    collision geometry. Base placed at the reference's `arm_hand_start_pose`
    (`..._grasp_sim.py:625`).
    """
    links = [
        LinkSpec(
            name="panda_link0", parent=None, joint=JointSpec(JOINT_FIXED),
            mass=_PANDA_INERTIAL["panda_link0"][0],
            com=_PANDA_INERTIAL["panda_link0"][1],
            inertia=_PANDA_INERTIAL["panda_link0"][2],
            geoms=[GeomSpec(GEOM_SPHERE, (0.1, 0, 0), pos=(0, 0, 0.05),
                            is_collider=False, emit_points=False)],
        )
    ]
    for (name, parent, xyz, rpy, axis, lim) in _PANDA_JOINTS:
        m, com, i6 = _PANDA_INERTIAL[name]
        r = _PANDA_COLLIDER_R[name]
        links.append(
            LinkSpec(
                name=name, parent=parent,
                joint=_rev(axis, lim4=lim, armature=0.02, damping=0.0),
                origin_pos=xyz, origin_rpy=rpy,
                mass=m, com=com, inertia=i6,
                geoms=[GeomSpec(GEOM_SPHERE, (r, 0, 0), is_collider=False, group=0)],
            )
        )
    # mount plate between flange and hand (part_studio_link)
    links.append(
        LinkSpec(
            name="part_studio_link", parent="panda_link7", joint=JointSpec(JOINT_FIXED),
            origin_pos=(0.0, -0.02, 0.107), origin_rpy=(0.0, 0.0, 3.141592),
            mass=0.2, com=(0, 0, 0), inertia=(1e-4, 1e-4, 1e-4, 0, 0, 0),
            geoms=[],
        )
    )
    # camera frame (used by Search's segmentation camera and T-value obs)
    links.append(
        LinkSpec(
            name="camera_link", parent="part_studio_link", joint=JointSpec(JOINT_FIXED),
            origin_pos=(-0.03, -0.05, 0.055), origin_rpy=(-0.5, 0.0, 3.141592),
            mass=0.05, com=(0, 0, 0), inertia=(1e-5, 1e-5, 1e-5, 0, 0, 0),
            geoms=[],
        )
    )
    # allegro palm
    links.append(
        LinkSpec(
            name="base_link", parent="part_studio_link", joint=JointSpec(JOINT_FIXED),
            origin_pos=(0.0, 0.12, 0.025), origin_rpy=(0.0, -1.5707, -1.5707),
            mass=0.4154, com=(0, 0, -0.035), inertia=(1e-3, 1e-3, 1e-3, 0, 0, 0),
            geoms=[
                GeomSpec(GEOM_BOX, (0.0208, 0.057, 0.0475), pos=(-0.009, 0, -0.0475),
                         friction=1.0, group=0, point_detail=1),
            ],
        )
    )
    # three parallel fingers
    for f, spec in _ALLEGRO_FINGERS.items():
        links += _finger_links(f, spec["root_xyz"], spec["root_rpy"],
                               [_FINGER_JOINT_LIMITS[i] for i in range(4)])
    # thumb (links 12-15): different mounting + limits
    g = _FINGER_SEGMENTS
    links += [
        LinkSpec(
            name="link_12.0", parent="base_link",
            joint=_rev((-1, 0, 0), lim2=_THUMB_JOINT_LIMITS[0], armature=1e-3),
            origin_pos=(-0.0182, 0.019333, -0.045987),
            origin_rpy=(0.0, -1.65806278845, -1.5707963259),
            mass=0.005, com=(0, 0, 0), inertia=(5.1458e-05, 5.1458e-05, 6.125e-05, 0, 0, 0),
            geoms=[GeomSpec(GEOM_BOX, (0.0179, 0.0145, 0.0175), pos=(-0.0179, 0.009, 0.0145),
                            friction=1.2, group=0)],
        ),
        LinkSpec(
            name="link_13.0", parent="link_12.0",
            joint=_rev((0, 0, 1), lim2=_THUMB_JOINT_LIMITS[1], armature=1e-3),
            origin_pos=(-0.027, 0.005, 0.0399),
            mass=0.125164, com=(0, 0, 0.009), inertia=g["proximal"][3],
            geoms=[GeomSpec(GEOM_BOX, (0.0098, 0.01375, 0.00885), pos=(0, 0, 0.00885),
                            friction=1.2, group=0)],
        ),
        LinkSpec(
            name="link_14.0", parent="link_13.0",
            joint=_rev((0, 1, 0), lim2=_THUMB_JOINT_LIMITS[2], armature=1e-3),
            origin_pos=(0, 0, 0.0177),
            mass=0.131691, com=(0, 0, 0.026), inertia=g["medial"][3],
            geoms=[GeomSpec(GEOM_BOX, (0.0098, 0.01375, 0.0257), pos=(0, 0, 0.0257),
                            friction=1.2, group=0, point_detail=1)],
        ),
        LinkSpec(
            name="link_15.0", parent="link_14.0",
            joint=_rev((0, 1, 0), lim2=_THUMB_JOINT_LIMITS[3], armature=1e-3),
            origin_pos=(0, 0, 0.0514),
            mass=0.131691, com=(0, 0, 0.021), inertia=g["distal"][3],
            geoms=[GeomSpec(GEOM_BOX, (0.0098, 0.01375, 0.02115), pos=(0, 0, 0.02115),
                            friction=1.2, group=0, point_detail=1)],
        ),
        LinkSpec(
            name="link_15.0_tip", parent="link_15.0",
            joint=JointSpec(JOINT_FIXED),
            origin_pos=(0, 0, 0.075),
            mass=0.02, com=(0, 0, 0), inertia=(2e-6, 2e-6, 2e-6, 0, 0, 0),
            geoms=[
                GeomSpec(GEOM_SPHERE, (0.0135, 0, 0), pos=(0, 0, -0.004), friction=1.5, group=0),
                GeomSpec(GEOM_SPHERE, (0.012, 0, 0), pos=(0, 0, 0.012), friction=1.5, group=0),
            ],
        ),
        # named frames (sites)
        LinkSpec(name="palm", parent="base_link", joint=JointSpec(JOINT_FIXED),
                 origin_pos=(0, 0, -0.065), mass=0.0),
        LinkSpec(name="palm_center", parent="base_link", joint=JointSpec(JOINT_FIXED),
                 origin_pos=(0, 0, -0.03), mass=0.0),
    ]
    return ArticulationSpec(name="franka_allegro", links=links, base_pos=base_pos)


# ---------------------------------------------------------------------------
# LEGO bricks
# ---------------------------------------------------------------------------

LEGO_UNIT = 0.03  # module grid (m)
LEGO_BODY_HALF_H = 0.02275  # body height 0.0455
LEGO_STUD_H = 0.012
LEGO_STUD_HALF = 0.009
LEGO_DENSITY = 567.0  # from the reference brick URDFs

# the 8 brick types used by the block-assembly tasks
# (`allegro_hand_block_assembly_search.py:610`)
LEGO_TYPES = (
    "1x1", "1x2", "1x2_curve", "1x3", "1x3_curve", "1x3_curve_soft", "1x4",
    "2x2_curve_soft",
)

# footprint in modules (nx, ny) per type (curve variants share the straight
# brick's bounding footprint — mesh bounds above)
_LEGO_FOOTPRINT = {
    "1x1": (1, 1),
    "1x2": (2, 1),
    "1x2_curve": (2, 1),
    "1x3": (3, 1),
    "1x3_curve": (3, 1),
    "1x3_curve_soft": (2, 1),
    "1x4": (4, 1),
    "2x2": (2, 2),
    "2x2_curve_soft": (2, 2),
}


def lego_brick(kind: str = "1x2", with_studs: bool = True, name: str | None = None,
               cavity: bool = False) -> BodySpec:
    """`cavity=True` models the brick's hollow underside as a box compound
    (top slab + 4 rim walls) so baseplate/socket studs can enter it — the
    press-fit interlock of the reference's VHACD real-geometry bricks
    (`..._insert_sim.py:697-703` vhacd convex decomposition). Solid
    (cavity=False) bricks keep the single body box — cheaper, used for heap
    distractors where interlock never happens."""
    nx, ny = _LEGO_FOOTPRINT[kind]
    hx, hy = nx * LEGO_UNIT / 2, ny * LEGO_UNIT / 2
    # local frame: mesh center offset => body box spans z in [-0.01875, 0.02675]
    body_c = -0.01875 + LEGO_BODY_HALF_H
    vol = (2 * hx) * (2 * hy) * (2 * LEGO_BODY_HALF_H)
    mass = LEGO_DENSITY * vol
    # box inertia about com
    ex, ey, ez = 2 * hx, 2 * hy, 2 * LEGO_BODY_HALF_H
    ixx = mass / 12 * (ey**2 + ez**2)
    iyy = mass / 12 * (ex**2 + ez**2)
    izz = mass / 12 * (ex**2 + ey**2)
    if cavity:
        # rim depth = stud height (full engagement: brick bottom meets the
        # plate top when the studs bottom out inside the cavity); wall
        # thickness 4 mm leaves 22 mm interior vs the 18 mm stud — 2 mm
        # clearance per side, the press-fit slop the reference's <2 cm
        # success predicate tolerates (`..._insert_sim.py:1666-1667`)
        d = LEGO_STUD_H
        t = 0.004
        bot = body_c - LEGO_BODY_HALF_H
        slab_h = (2 * LEGO_BODY_HALF_H - d) / 2
        geoms = [
            GeomSpec(GEOM_BOX, (hx, hy, slab_h),
                     pos=(0, 0, bot + d + slab_h), friction=0.8,
                     point_detail=1),
            GeomSpec(GEOM_BOX, (t / 2, hy, d / 2),
                     pos=(-(hx - t / 2), 0, bot + d / 2), friction=0.8,
                     point_detail=0),
            GeomSpec(GEOM_BOX, (t / 2, hy, d / 2),
                     pos=(hx - t / 2, 0, bot + d / 2), friction=0.8,
                     point_detail=0),
            GeomSpec(GEOM_BOX, (hx, t / 2, d / 2),
                     pos=(0, -(hy - t / 2), bot + d / 2), friction=0.8,
                     point_detail=0),
            GeomSpec(GEOM_BOX, (hx, t / 2, d / 2),
                     pos=(0, hy - t / 2, bot + d / 2), friction=0.8,
                     point_detail=0),
        ]
    else:
        geoms = [
            GeomSpec(GEOM_BOX, (hx, hy, LEGO_BODY_HALF_H), pos=(0, 0, body_c),
                     friction=0.8, point_detail=1)
        ]
    if with_studs:
        top = body_c + LEGO_BODY_HALF_H
        for ix in range(nx):
            for iy in range(ny):
                cx = -hx + (ix + 0.5) * LEGO_UNIT
                cy = -hy + (iy + 0.5) * LEGO_UNIT
                geoms.append(
                    GeomSpec(
                        GEOM_BOX,
                        (LEGO_STUD_HALF, LEGO_STUD_HALF, LEGO_STUD_H / 2),
                        pos=(cx, cy, top + LEGO_STUD_H / 2),
                        friction=0.8,
                        point_detail=0,
                    )
                )
    return BodySpec(
        name=name or f"lego_{kind}",
        mass=mass,
        com=(0, 0, body_c),
        inertia=(ixx, iyy, izz, 0, 0, 0),
        geoms=geoms,
    )


def goal_marker(name: str = "goal") -> BodySpec:
    """Kinematic goal-pose marker (reference creates a collision-less goal
    actor, `..._grasp_sim.py:688-698`)."""
    return BodySpec(
        name=name, mass=0.0, inertia=(0, 0, 0, 0, 0, 0),
        geoms=[], kinematic=True,
    )


# ---------------------------------------------------------------------------
# Static world geometry
# ---------------------------------------------------------------------------

TABLE_DIMS = (1.5, 1.0, 0.6)  # `..._grasp_sim.py:629`
TABLE_TOP_Z = 0.6


def table() -> StaticGeomSpec:
    hx, hy, hz = TABLE_DIMS[0] / 2, TABLE_DIMS[1] / 2, TABLE_DIMS[2] / 2
    return StaticGeomSpec(
        name="table",
        geom=GeomSpec(GEOM_BOX, (hx, hy, hz), friction=0.9, emit_points=False),
        pos=(0.0, 0.0, hz),
    )


def ground() -> StaticGeomSpec:
    return StaticGeomSpec(
        name="ground",
        geom=GeomSpec(GEOM_PLANE, (0, 0, 0), friction=1.0, emit_points=False),
    )


def bin_walls(box_xyz=(0.6, 0.4, 0.45), box_offset=(0.25, 0.19), thin=0.01):
    """5 thin boxes forming the lego bin on the table
    (`allegro_hand_block_assembly_search.py` bin construction; grasp_sim
    `:659-674`)."""
    bx, by, bz = box_xyz
    ox, oy = box_offset
    z0 = TABLE_TOP_Z
    out = [
        StaticGeomSpec(
            "bin_bottom",
            GeomSpec(GEOM_BOX, (bx / 2, by / 2, thin / 2), friction=0.7, emit_points=False),
            pos=(ox, oy, z0 + thin / 2),
        ),
        StaticGeomSpec(
            "bin_left",
            GeomSpec(GEOM_BOX, (bx / 2, thin / 2, bz / 2), friction=0.7, emit_points=False),
            pos=(ox, (by - thin) / 2 + oy, z0 + bz / 2),
        ),
        StaticGeomSpec(
            "bin_right",
            GeomSpec(GEOM_BOX, (bx / 2, thin / 2, bz / 2), friction=0.7, emit_points=False),
            pos=(ox, -(by - thin) / 2 + oy, z0 + bz / 2),
        ),
        StaticGeomSpec(
            "bin_front",
            GeomSpec(GEOM_BOX, (thin / 2, by / 2, bz / 2), friction=0.7, emit_points=False),
            pos=((bx - thin) / 2 + ox, oy, z0 + bz / 2),
        ),
        StaticGeomSpec(
            "bin_back",
            GeomSpec(GEOM_BOX, (thin / 2, by / 2, bz / 2), friction=0.7, emit_points=False),
            pos=(-(bx - thin) / 2 + ox, oy, z0 + bz / 2),
        ),
    ]
    return out


def socket_plate(n: int = 4, layers: int = 1, name: str = "socket",
                 friction: float = 0.0) -> BodySpec:
    """Fixed n x n studded socket plate — the reference InsertSim's "extra
    lego" insertion base (`..._insert_sim.py:750-756,973-996`:
    `4x4x1_real`/`4x4x2_real`, fix_base_link=True, shape friction 0.0).

    Origin at the plate's BOTTOM face center (rests on the table when
    body_pos.z = table top). Studs on the module grid; a cavity brick
    pressed onto them interlocks laterally via stud-rim contact and bottoms
    out on the plate top (full LEGO_STUD_H engagement)."""
    hx = hy = n * LEGO_UNIT / 2
    base_h = 0.0095 * layers  # reference x1/x2 plate heights
    geoms = [GeomSpec(GEOM_BOX, (hx, hy, base_h), pos=(0, 0, base_h),
                      friction=friction, emit_points=False)]
    top = 2 * base_h
    for ix in range(n):
        for iy in range(n):
            cx = -hx + (ix + 0.5) * LEGO_UNIT
            cy = -hy + (iy + 0.5) * LEGO_UNIT
            # studs EMIT contact points (corner detail): stud corners vs the
            # cavity-brick's slab/rim colliders generate the press-fit
            # contacts at any misalignment — point coverage independent of
            # where the brick's own sparse points land
            geoms.append(GeomSpec(
                GEOM_BOX, (LEGO_STUD_HALF, LEGO_STUD_HALF, LEGO_STUD_H / 2),
                pos=(cx, cy, top + LEGO_STUD_H / 2), friction=friction,
                emit_points=True, point_detail=0))
    return BodySpec(name=name, mass=0.0, inertia=(0, 0, 0, 0, 0, 0),
                    geoms=geoms, kinematic=True)


def baseplate(n=12, name="baseplate", pos=(0.25, -0.19, 0.618)) -> BodySpec:
    """12x12 stud baseplate for insertion (reference
    `assets_for_insertion/urdf/12x12x1_real.urdf`, loaded at
    `..._insert_sim.py` / extra lego at `..._grasp_sim.py:836-838`).
    Modeled kinematic: a thin box with a stud grid."""
    half = n * LEGO_UNIT / 2 / 2  # reference plate is half-module pitch; keep module grid
    hx = hy = n * LEGO_UNIT / 4
    geoms = [GeomSpec(GEOM_BOX, (hx, hy, 0.009), friction=0.8, emit_points=False)]
    return BodySpec(
        name=name, mass=0.0, inertia=(0, 0, 0, 0, 0, 0), geoms=geoms,
        kinematic=True,
    )
