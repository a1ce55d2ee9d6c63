"""BlockAssemblyInsertSim — press the grasped block onto the baseplate studs.

TPU-native re-implementation of
`tasks/block_assembly/allegro_hand_block_assembly_insert_sim.py` (1725 LoC):
75-dim single-frame observations (`:174-177` num_obs_dict), 188-dim
asymmetric states, 23 actions with wrist orientation LOCKED to
`target_euler = (0, pi, 1.571)` (rot_err from `orientation_error`,
`:1533-1535`), reward = exp(-rot_dist - 20*pos_dist) + success bonus with the
180-degree z-flip symmetry (`compute_hand_reward`, `:1640-1694`), resets on
finger slip (dist >= 0.6) / wrist error (>= 0.03) / timeout (`:1672-1677`).

Reset pulls (hand dof, block pose) from a grasp terminal-state reservoir when
provided (reference loads grasping terminal pickles, `:372-375,1448-1455`);
otherwise a synthetic "block held above the socket" distribution.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import builders
from ...core.math import (
    orientation_error,
    quat_apply,
    quat_conjugate,
    quat_from_angle_axis,
    quat_from_euler_xyz,
    quat_mul,
    scale_to_limits,
    tf_combine,
    tf_inverse,
    unscale_from_limits,
)
from ...sim.scene import compile_scene
from ...sim.simulator import SimConfig, make_sim
from ..base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree
from .grasp_sim import control_ik

ONE_FRAME_OBS = 75
ONE_FRAME_STATES = 188
STACK = 1
NUM_ACTIONS = 23


@dataclasses.dataclass(frozen=True)
class InsertSimConfig:
    episode_length: int = 125
    # domain-randomization engine (base_task.py:229-423 schema): physical
    # scales sampled per reset into the SimState DR fields
    randomize: bool = False
    action_moving_average: float = 1.0
    vel_obs_scale: float = 0.2
    # "all" = reference multi-type scene (runtime brick geometry for both the
    # held block and the socket, see envs/block_assembly/multitype.py)
    lego_type: str = "all"
    substeps: int = 2
    solver_iterations: int = 16
    max_contacts: int = 48
    # success predicate (`..._insert_sim.py:1666-1667`)
    success_pos_tol: float = 0.02
    success_rot_tol: float = 0.2
    # real-aligned variant (`allegro_hand_block_assembly_insert.py`): its own
    # 156-dim x 3-stacked obs protocol (`insert.py:172-187,1221-1246`) instead
    # of InsertSim's 75 x 1
    real_obs: bool = False
    # T-value input protocol: "rot" = 4-dim camera-frame rotation (the
    # offline trainer's default), "pos_rot" = 7-dim pos+rot — the env's own
    # online-trainable GraspInsertTValue(input_dim=7)
    # (`..._insert_sim.py:391-399`), "temporal" = 62x10 stacked-obs variant
    # (`:462-463`)
    tvalue_input: str = "rot"
    # online T-value trainer wired as Env.post_epoch_hook (the reference's
    # in-env `train_t_value` path, `..._insert_sim.py:391,398-399`)
    train_t_value: bool = False
    # insertion base:
    #  "union"   — kinematic union-slot brick re-typed per env (fast; the
    #              block mates stud-on-stud without interlock)
    #  "studded" — the reference's fixed 4x4 studded plate
    #              (`..._insert_sim.py:750-756,973-996` "extra lego"
    #              4x4x1_real, fix_base_link, friction 0) + a CAVITY target
    #              brick: real stud press-fit, lateral interlock via
    #              stud-rim contact (SURVEY hard part #2)
    socket: str = "union"
    # the reference also parks the 8 lego types ~1 m outside the workspace
    # (`..._insert_sim.py:981-985`: x = 1.13.., dynamically irrelevant);
    # scene-budget parity for the studded eval variant
    parked_bricks: bool = False


class InsertTaskState(NamedTuple):
    sim: object
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs_stack: jnp.ndarray
    state_stack: jnp.ndarray
    prev_targets: jnp.ndarray
    extra_target_pos: jnp.ndarray  # (3,) socket target position (stud-aligned)
    extra_target_rot: jnp.ndarray  # (4,)
    successes: jnp.ndarray
    actions: jnp.ndarray
    init_cam_rot: jnp.ndarray  # (4,) camera-frame block rot at reset (T-value input)
    init_cam_pos: jnp.ndarray  # (3,) camera-frame block pos at reset ("pos_rot")
    tvalue_buf: jnp.ndarray  # (10, 62) temporal T-value obs ("temporal") or (1, 1)
    lego_type: jnp.ndarray  # i32 scalar


# wrist orientation lock (`..._insert_sim.py` target_euler, same constant as
# grasp_sim `:470` target_euler = [0, 3.1415, 1.571])
_TARGET_EULER = (0.0, 3.1415, 1.571)

# arm pose holding the block above the plate: the reference's SECOND
# insertion-prepare pose (`..._grasp_sim.py:281`) — the scripted grasp
# retract ends here, so grasp terminals and the synthetic stand-in share
# the same arm state
_HOLD_ARM_QPOS = (-0.1800, -0.1604, -0.2770, -2.2674, -0.0533, 2.1049,
                  1.1696)


def make_insert_sim_env(cfg: InsertSimConfig = InsertSimConfig(),
                        reservoir=None) -> Env:
    one_frame_obs = 156 if cfg.real_obs else ONE_FRAME_OBS
    stack = 3 if cfg.real_obs else STACK
    multi = cfg.lego_type == "all"
    from . import multitype

    union_kind = multitype.UNION_BRICK_KIND if multi else cfg.lego_type
    art_spec = builders.franka_allegro()
    studded = cfg.socket == "studded"
    brick = builders.lego_brick(union_kind, name="target", cavity=studded)
    if studded:
        # reference insertion base: fixed 4x4 studded plate, friction 0
        socket = builders.socket_plate(4, layers=1, name="socket")
    else:
        # kinematic brick already on the plate that the block mates to
        socket = builders.lego_brick(union_kind, name="socket")
        socket = dataclasses.replace(socket, kinematic=True)
    bodies = [brick, socket]
    if cfg.parked_bricks:
        bodies += [builders.lego_brick(builders.LEGO_TYPES[i], name=f"parked{i}")
                   for i in range(len(builders.LEGO_TYPES))]
    scene = compile_scene(
        art_spec,
        bodies=bodies,
        statics=[builders.table(), builders.ground()],
    )
    if not multi:
        type_tables = None
    elif studded:
        # the plate is type-independent (always 4x4, like the reference's
        # extra lego); only the held block is re-typed — with its cavity
        type_tables = multitype.build_type_tables(
            scene, "target", brick_kwargs={"cavity": True})
    else:
        type_tables = multitype.build_type_tables(scene, ("target", "socket"))
    num_types = len(builders.LEGO_TYPES)
    art = scene.art
    _force_links = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            # studded/parked scene: 8 parked bricks x ~4 support contacts +
            # stud engagement rows + the held brick exceed the clean-scene
            # budget — a global top-K below the rest demand free-falls
            # unsupported bodies (see search.py max_contacts)
            max_contacts=(cfg.max_contacts
                          if not (cfg.socket == "studded" or cfg.parked_bricks)
                          else max(cfg.max_contacts, 160)),
            force_links=_force_links,
        ),
    )
    D = art.ndof
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    hand_lower, hand_upper = lower[7:23], upper[7:23]

    hand_base = art.link_index(builders.HAND_BASE_LINK)
    mount = art.link_index("panda_link7")
    tips = tuple(art.link_index(n) for n in builders.FINGERTIP_LINKS)
    fsr = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    target_body = scene.body_index("target")
    socket_body = scene.body_index("socket")
    type_idx_static = (0 if multi
                       else builders.LEGO_TYPES.index(cfg.lego_type))

    from ...seqdex import reservoir as reslib

    def init_ctx():
        """Runtime shared context (see envs/base.Env.init_ctx)."""
        res = (reservoir.res if reservoir is not None
               else reslib.create(
                   {"q": jnp.zeros(D),
                    "pos": jnp.zeros(3),
                    "rot": jnp.asarray([0.0, 0.0, 0.0, 1.0])},
                   capacity=4096, num_types=num_types))
        return {"reservoir": res}

    # wrist camera extrinsics (same mount frame as grasp_sim `:887-889`);
    # the camera-frame block rotation at reset is the Grasp->Insert T-value
    # input this env labels with its own insertion outcome
    cam_offset_quat = quat_from_euler_xyz(
        jnp.float32(0.0), jnp.float32(-3.141 + 0.5), jnp.float32(1.571)
    )
    cam_offset_pos = jnp.asarray([0.03, 0.107 - 0.098, 0.067 + 0.107],
                                 dtype=jnp.float32)

    z_flip = jnp.asarray([0.0, 0.0, 1.0, 0.0], dtype=jnp.float32)  # 180 deg about z

    hold_q = jnp.zeros(D, dtype=jnp.float32)
    hold_q = hold_q.at[:7].set(jnp.asarray(_HOLD_ARM_QPOS, dtype=jnp.float32))
    # fingers part-closed around the brick
    hold_q = hold_q.at[7:23].set(hand_lower + 0.55 * (hand_upper - hand_lower))

    # wrist orientation lock. The reference hardcodes euler (0, pi, 1.571)
    # (`..._insert_sim.py:444`) — valid in ITS URDF hand_base frame; our
    # procedural model's hand_base carries a different local frame, so the
    # semantically identical lock ("hold the insertion-prepare wrist
    # orientation; early-reset when it drifts", `:1674` rot_err^2 >= 0.03)
    # is DERIVED from the FK of the canonical prepare pose. With the euler
    # constant applied verbatim in our frame, every episode died at step 1
    # (wrist_err^2 ~ 0.75 >= 0.03 at every reachable reset state) — the
    # r3 insert runs' done_rate 1.0.
    with jax.ensure_compile_time_eval():
        _fk_hold = sim.fk(hold_q, jnp.zeros(D, dtype=jnp.float32))
        target_rot_lock = jnp.asarray(np.asarray(_fk_hold.quat[hand_base]))

    def _tip_pos(fk_res):
        idx = jnp.asarray(tips)
        p = fk_res.pos[idx, :]
        q = fk_res.quat[idx, :]
        off = quat_apply(q, jnp.tile(jnp.asarray([0.0, 0.0, 0.04], dtype=jnp.float32), (4, 1)))
        return p + off

    # per-type lateral slot offset on the stud grid (half a module on each
    # odd footprint axis — even footprints center between studs, odd ones
    # center on a stud)
    _slot_offset = jnp.asarray(
        [[0.015 * (builders._LEGO_FOOTPRINT[k][0] % 2),
          0.015 * (builders._LEGO_FOOTPRINT[k][1] % 2)]
         for k in builders.LEGO_TYPES], dtype=jnp.float32)  # (8, 2)

    # reference parked-brick poses (`..._insert_sim.py:981-985`): the 8 lego
    # types ~1 m outside the workspace, resting on the ground plane
    if cfg.parked_bricks:
        _parked_bodies = jnp.asarray(
            [scene.body_index(f"parked{i}") for i in range(8)])
        _parked_pos = jnp.asarray(
            [[1.23 + 0.13 * (i % 3), -0.23 + 0.23 * (i // 3), 0.0188]
             for i in range(8)], dtype=jnp.float32)

    def _reset_sim(key, ctx):
        k1, k2, k3, kt = jax.random.split(key, 4)
        s = sim.init_state(hold_q)
        if cfg.parked_bricks:
            s = s._replace(
                body_pos=s.body_pos.at[_parked_bodies].set(_parked_pos))
        if cfg.randomize:
            from ...envs.randomization import randomize_sim_state

            s = randomize_sim_state(s, jax.random.fold_in(k3, 7), D)
        if multi:
            t = jax.random.randint(kt, (), 0, num_types)
            s = s._replace(geom=multitype.geom_for_type(type_tables, t))
        else:
            t = jnp.int32(type_idx_static)
        # socket on the table near (0.25, -0.2) with yaw in {0, 90 deg}
        # (`..._insert_sim.py:1437-1445`)
        ri = jax.random.randint(k1, (3,), 0, 2)
        sp = jnp.stack([
            0.25 + ri[0] * 0.03,
            -0.2 + ri[1] * 0.03,
            jnp.int32(0) + 0.618,
        ])
        yaw = ri[2].astype(jnp.float32) * 1.57
        sq = quat_from_angle_axis(yaw, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
        if studded:
            # interlocked pose on the plate: brick bottom meets the plate
            # top with studs fully inside the cavity; lateral slot offset =
            # half a module on each ODD footprint axis so the cavity centers
            # over the stud grid (type-dependent, runtime gather)
            tgt = sp + quat_apply(sq, jnp.concatenate(
                [_slot_offset[t], jnp.asarray([0.03775], dtype=jnp.float32)]))
        else:
            # stud-aligned mate target: one brick height up, half-module
            # lateral (`..._insert_sim.py:1123-1129`)
            tgt = sp + quat_apply(sq, jnp.asarray([0.0, 0.0, 0.0375], dtype=jnp.float32))
            tgt = tgt + quat_apply(sq, jnp.asarray([0.0, 0.015, 0.0], dtype=jnp.float32))

        # synthetic hold pose
        fk0 = sim.fk(hold_q, jnp.zeros(D, dtype=jnp.float32))
        palm = fk0.pos[art.link_index("palm_center")]
        nz = (jax.random.uniform(k3, (3,)) * 2 - 1) * 0.005
        # 4.5 cm below the palm center, inside the finger cage (-0.02 left
        # the 4-tip distance sum at ~0.6 = exactly the slip-reset threshold)
        pos_syn = palm + jnp.asarray([0.0, 0.0, -0.045], dtype=jnp.float32) + nz
        rot_syn = quat_mul(
            fk0.quat[hand_base],
            quat_from_euler_xyz(jnp.float32(jnp.pi), jnp.float32(0.0), jnp.float32(0.0)),
        )
        # grasp terminal (hand dof + held-block pose) from the per-type
        # reservoir bucket when filled (`..._insert_sim.py:372-375,1448-1455`)
        samp = reslib.sample(ctx["reservoir"], k2, t)
        have = ctx["reservoir"].count[t] > 0
        q0 = jnp.where(have, samp["q"], hold_q)
        block_pos = jnp.where(have, samp["pos"], pos_syn)
        block_rot = jnp.where(have, samp["rot"], rot_syn)
        s = s._replace(
            q=q0,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=q0,
            body_pos=s.body_pos.at[target_body].set(block_pos).at[socket_body].set(sp),
            body_quat=s.body_quat.at[target_body].set(block_rot).at[socket_body].set(sq),
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        return s, tgt, sq, t

    def _observe(state: InsertTaskState, fk_res):
        """75-dim frame (`..._insert_sim.py:1281-1298`) + 188 states
        (`:1220-1283`, same family as grasp_sim)."""
        s = state.sim
        q, qd = s.q, s.qd
        hb_pos = fk_res.pos[hand_base]
        hb_rot = fk_res.quat[hand_base]
        tgt_pos = s.body_pos[target_body]
        tgt_rot = s.body_quat[target_body]

        tp = _tip_pos(fk_res)
        if cfg.real_obs:
            # real-aligned 156-dim frame (`insert.py:1221-1246`)
            idxr = jnp.asarray(tips)
            tip13 = jnp.concatenate(
                [tp, fk_res.quat[idxr, :], fk_res.linvel[idxr, :],
                 fk_res.angvel[idxr, :]], axis=-1)
            obs = jnp.zeros(one_frame_obs, dtype=jnp.float32)
            obs = obs.at[0:23].set(unscale_from_limits(q, lower, upper))
            obs = obs.at[23:46].set(state.actions)
            obs = obs.at[46:53].set(jnp.concatenate([hb_pos, hb_rot]))
            obs = obs.at[53:56].set(tgt_pos)
            obs = obs.at[56:60].set(tgt_rot)
            obs = obs.at[61:64].set(state.extra_target_pos)
            obs = obs.at[64:68].set(state.extra_target_rot)
            obs = obs.at[68:71].set(tgt_pos - state.extra_target_pos)
            obs = obs.at[71:75].set(
                quat_mul(tgt_rot, quat_conjugate(state.extra_target_rot)))
            obs = obs.at[75:88].set(tip13[0])
            obs = obs.at[88:101].set(tip13[2])
            obs = obs.at[101:114].set(tip13[1])
            obs = obs.at[114:127].set(tip13[3])
            obs = obs.at[127:150].set(cfg.vel_obs_scale * qd)
            obs = obs.at[150:153].set(s.body_linvel[target_body])
            obs = obs.at[153:156].set(s.body_angvel[target_body])
        else:
            obs = jnp.zeros(one_frame_obs, dtype=jnp.float32)
            obs = obs.at[0:16].set(unscale_from_limits(q[7:23], hand_lower, hand_upper))
            obs = obs.at[23:46].set(state.actions)
            obs = obs.at[46:49].set(hb_pos - state.extra_target_pos)
            obs = obs.at[49:53].set(quat_mul(hb_rot, quat_conjugate(state.extra_target_rot)))
            obs = obs.at[53:56].set(hb_pos - tgt_pos)
            obs = obs.at[56:60].set(quat_mul(hb_rot, quat_conjugate(tgt_rot)))
            obs = obs.at[61:64].set(state.extra_target_pos)
            obs = obs.at[64:68].set(state.extra_target_rot)
            obs = obs.at[68:71].set(tgt_pos - state.extra_target_pos)
            obs = obs.at[71:75].set(quat_mul(tgt_rot, quat_conjugate(state.extra_target_rot)))

        idx = jnp.asarray(tips)
        tip_rot = fk_res.quat[idx, :]
        tip_lv = fk_res.linvel[idx, :]
        tip_av = fk_res.angvel[idx, :]
        st = jnp.zeros(ONE_FRAME_STATES, dtype=jnp.float32)
        st = st.at[0:23].set(unscale_from_limits(q, lower, upper))
        st = st.at[23:46].set(cfg.vel_obs_scale * qd)
        st = st.at[46:49].set(tp[0])
        st = st.at[49:52].set(tp[2])
        st = st.at[52:55].set(tp[1])
        st = st.at[55:58].set(tp[3])
        st = st.at[58:81].set(state.actions)
        st = st.at[81:84].set(hb_pos)
        st = st.at[84:88].set(hb_rot)
        st = st.at[88:91].set(tgt_pos)
        st = st.at[91:95].set(tgt_rot)
        st = st.at[95:98].set(fk_res.linvel[hand_base])
        st = st.at[98:101].set(fk_res.angvel[hand_base])
        st = st.at[101:105].set(tip_rot[0])
        st = st.at[105:108].set(tip_lv[0])
        st = st.at[108:111].set(tip_av[0])
        st = st.at[111:115].set(tip_rot[1])
        st = st.at[115:118].set(tip_lv[1])
        st = st.at[118:121].set(tip_av[1])
        st = st.at[121:125].set(tip_rot[2])
        st = st.at[125:128].set(tip_lv[2])
        st = st.at[128:131].set(tip_av[2])
        st = st.at[131:135].set(tip_rot[3])
        st = st.at[135:138].set(tip_lv[3])
        st = st.at[138:141].set(tip_av[3])
        st = st.at[142:145].set(s.body_linvel[target_body])
        st = st.at[145:148].set(s.body_angvel[target_body])
        st = st.at[148:151].set(state.extra_target_pos)
        st = st.at[151:154].set(tgt_pos - state.extra_target_pos)
        st = st.at[154:157].set(hb_pos - tgt_pos)
        st = st.at[157:161].set(quat_mul(hb_rot, quat_conjugate(tgt_rot)))
        st = st.at[161:164].set(tgt_pos - tp[0])
        st = st.at[164:167].set(tgt_pos - tp[2])
        st = st.at[167:170].set(tgt_pos - tp[1])
        st = st.at[170:173].set(tgt_pos - tp[3])
        return obs, st

    def _cam_rot(fk_res, tgt_rot, tgt_pos):
        q_cam, p_cam = tf_combine(
            fk_res.quat[mount], fk_res.pos[mount], cam_offset_quat, cam_offset_pos
        )
        qc_inv, pc_inv = tf_inverse(q_cam, p_cam)
        cam_tgt_rot, cam_tgt_pos = tf_combine(qc_inv, pc_inv, tgt_rot, tgt_pos)
        return cam_tgt_rot, cam_tgt_pos

    _TVBUF_SHAPE = (10, 62) if cfg.tvalue_input == "temporal" else (1, 1)

    def reset_ctx(key, ctx) -> InsertTaskState:
        k0, k1 = jax.random.split(key)
        s, tgt, sq, t = _reset_sim(k0, ctx)
        fk0 = sim.fk(s.q, s.qd)
        init_cam_rot, init_cam_pos = _cam_rot(
            fk0, s.body_quat[target_body], s.body_pos[target_body])
        state = InsertTaskState(
            sim=s,
            key=k1,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((stack, one_frame_obs), dtype=jnp.float32),
            state_stack=jnp.zeros((stack, ONE_FRAME_STATES), dtype=jnp.float32),
            prev_targets=s.ctrl,
            extra_target_pos=tgt,
            extra_target_rot=sq,
            successes=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
            init_cam_rot=init_cam_rot,
            init_cam_pos=init_cam_pos,
            tvalue_buf=jnp.zeros(_TVBUF_SHAPE, dtype=jnp.float32),
            lego_type=t,
        )
        fk_res = fk0
        obs, st = _observe(state, fk_res)
        return state._replace(
            obs_stack=push_frame(state.obs_stack, obs),
            state_stack=push_frame(state.state_stack, st),
        )

    def step_ctx(state: InsertTaskState, action: jnp.ndarray, ctx):
        fresh = reset_ctx(state.key, ctx)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        s = state.sim
        fk_res = sim.fk(s.q, s.qd)

        fingers = scale_to_limits(action[7:23], hand_lower, hand_upper)
        fingers = (
            cfg.action_moving_average * fingers
            + (1.0 - cfg.action_moving_average) * state.prev_targets[7:23]
        )
        # wrist orientation locked to target_euler (`..._insert_sim.py:1533-1535`)
        pos_err = action[0:3] * 0.64
        rot_err = orientation_error(target_rot_lock, fk_res.quat[hand_base])
        dpose = jnp.concatenate([pos_err, rot_err])
        J = sim.site_jacobian(fk_res, hand_base)[:, :7]
        delta = control_ik(J, dpose)
        arm_targets = s.q[:7] + delta

        targets = jnp.clip(jnp.concatenate([arm_targets, fingers]), lower, upper)
        s = s._replace(ctrl=targets)
        s = sim.step(s, fk0=fk_res)
        prog = state.progress + 1
        state = state._replace(sim=s, progress=prog, prev_targets=targets, actions=action)

        fk2 = sim.fk(s.q, s.qd)
        obs, st = _observe(state, fk2)
        obs_stack = push_frame(state.obs_stack, obs)
        state_stack = push_frame(state.state_stack, st)

        # reward (`compute_hand_reward` `..._insert_sim.py:1640-1694`)
        tp = _tip_pos(fk2)
        tgt_pos = s.body_pos[target_body]
        tgt_rot = s.body_quat[target_body]
        finger_dist = (
            jnp.linalg.norm(tgt_pos - tp[0])
            + jnp.linalg.norm(tgt_pos - tp[1])
            + jnp.linalg.norm(tgt_pos - tp[2])
            + 3.0 * jnp.linalg.norm(tgt_pos - tp[3])
        )
        qd1 = quat_mul(tgt_rot, quat_conjugate(state.extra_target_rot))
        rot1 = 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(qd1[:3]), None, 1.0))
        sym_rot = quat_mul(state.extra_target_rot, z_flip)
        qd2 = quat_mul(tgt_rot, quat_conjugate(sym_rot))
        rot2 = 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(qd2[:3]), None, 1.0))
        rot_dist = jnp.minimum(rot1, rot2)
        pos_dist = jnp.linalg.norm(tgt_pos - state.extra_target_pos)

        insert_reward = jnp.exp(-1.0 * rot_dist - 20.0 * pos_dist)
        bonus = jnp.where(
            (pos_dist < cfg.success_pos_tol) & (rot_dist < cfg.success_rot_tol), 1.0, 0.0
        )
        reward = insert_reward + bonus

        wrist_err = orientation_error(target_rot_lock, fk2.quat[hand_base])
        timed_out = prog >= cfg.episode_length - 1
        slipped = finger_dist >= 0.6
        wrist_off = jnp.sum(wrist_err**2) >= 0.03
        done = timed_out | slipped | wrist_off
        success = bonus

        if cfg.tvalue_input == "temporal":
            # 62x10 stacked-obs variant (`..._insert_sim.py:462-463`):
            # roll the first 62 obs dims into the temporal buffer
            tvbuf = jnp.concatenate(
                [state.tvalue_buf[1:], obs[None, :62]], axis=0)
        else:
            tvbuf = state.tvalue_buf
        state = state._replace(
            obs_stack=obs_stack,
            state_stack=state_stack,
            reset_flag=done,
            successes=success,
            tvalue_buf=tvbuf,
        )
        if cfg.tvalue_input == "pos_rot":
            # the env's own online GraspInsertTValue(input_dim=7): camera-
            # frame block pos+rot of the handed-off state (`:391-399`)
            tv_in = jnp.concatenate([state.init_cam_pos, state.init_cam_rot])
        elif cfg.tvalue_input == "temporal":
            tv_in = tvbuf.reshape(-1)
        else:
            tv_in = state.init_cam_rot
        out = StepOutput(
            obs=clip_obs(obs_stack.reshape(-1)),
            states=clip_obs(state_stack.reshape(-1)),
            reward=reward,
            done=done,
            info={
                "successes": success,
                "pos_dist": pos_dist,
                "rot_dist": rot_dist,
                "contact_forces": s.link_contact_force[jnp.asarray(fsr)],
                # Grasp->Insert T-value training row: camera-frame block rot
                # of the handed-off reset state, labelled by the insertion
                # outcome (the env's HDF5 dump, `..._insert_sim.py` save_hdf5)
                "tvalue_valid": done,
                "tvalue_input": tv_in,
                "tvalue_label": success,
                "terminal_valid": done & (success > 0.0),
                "terminal_pos": tgt_pos,
                "terminal_rot": tgt_rot,
                "terminal_type": state.lego_type,
            },
        )
        return state, out

    _default_ctx = init_ctx()

    def reset(key) -> InsertTaskState:  # ctx-unaware binding
        return reset_ctx(key, _default_ctx)

    def step(state: InsertTaskState, action: jnp.ndarray):
        return step_ctx(state, action, _default_ctx)

    # online T-value trainer (`..._insert_sim.py:391-399` train_t_value):
    # every log interval, harvest labelled (handoff-state, outcome) rows
    # from a short rollout of the CURRENT policy and take BCE steps
    post_epoch_hook = None
    if cfg.train_t_value:
        from ...seqdex import tvalue as tvlib2

        _tv_in_dim = {"rot": 4, "pos_rot": 7, "temporal": 620}[cfg.tvalue_input]
        _tv_state = {}

        def post_epoch_hook(policy_params, epoch):
            if not _tv_state:
                init_t, train_step, accuracy = tvlib2.make_tvalue_trainer(
                    _tv_in_dim, tvlib2.GRASP_INSERT_HIDDEN)
                _tv_state["ts"] = init_t(jax.random.PRNGKey(7))
                _tv_state["step"] = jax.jit(train_step)
                _tv_state["acc"] = jax.jit(accuracy)
            succ, fail = collect_tvalue_data(
                policy_params, num_envs=32, steps=cfg.episode_length + 1,
                seed=epoch)
            if len(succ) == 0 or len(fail) == 0:
                return {"insert_tvalue_classes": float(
                    (len(succ) > 0) + (len(fail) > 0))}
            import numpy as _np

            ksucc = jnp.asarray(_np.resize(succ, (64, _tv_in_dim)))
            kfail = jnp.asarray(_np.resize(fail, (64, _tv_in_dim)))
            _tv_state["ts"], loss = _tv_state["step"](
                _tv_state["ts"], jax.random.PRNGKey(epoch), ksucc, kfail)
            xs = jnp.concatenate([ksucc, kfail])
            labels = jnp.concatenate([jnp.ones(64), jnp.zeros(64)])
            acc = _tv_state["acc"](_tv_state["ts"].params, xs, labels)
            return {"insert_tvalue_loss": float(loss),
                    "insert_tvalue_acc": float(acc)}

        post_epoch_hook.state = _tv_state

    env = Env(
        name="BlockAssemblyInsert" if cfg.real_obs else "BlockAssemblyInsertSim",
        num_obs=one_frame_obs * stack,
        num_states=ONE_FRAME_STATES * stack,
        num_actions=NUM_ACTIONS,
        episode_length=cfg.episode_length,
        reset=reset,
        step=step,
        sim=sim,
        init_ctx=init_ctx,
        reset_ctx=reset_ctx,
        step_ctx=step_ctx,
    )

    def collect_tvalue_data(params, num_envs=64, steps=None, seed=0, ctx=None,
                           stochastic=False):
        """(succ, fail) camera-frame block rotations labelled by insertion
        outcome — trains the Grasp->Insert T-value that gates GraspSim's
        terminal saving (`..._grasp_sim.py:1404-1407`)."""
        from ...seqdex.handoff import rollout_collect, split_tvalue_data

        steps = steps or cfg.episode_length + 2
        data = rollout_collect(
            env, params, num_envs, steps, seed=seed,
            keys=("tvalue_input", "tvalue_label"), valid_key="tvalue_valid",
            ctx=ctx, stochastic=stochastic,
        )
        return split_tvalue_data(data)

    return dataclasses.replace(env, collect_tvalue_data=collect_tvalue_data,
                               post_epoch_hook=post_epoch_hook)
