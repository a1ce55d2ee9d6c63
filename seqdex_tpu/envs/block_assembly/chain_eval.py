"""Chained BlockAssembly evaluation env — the headless GUI analog.

TPU-native, scripted re-implementation of `BlockAssemblyGUI`'s
assemble-one-lego loop (`tasks/block_assembly/allegro_hand_block_assembly_gui.py`:
`assemble_one_lego` `:2755-2775`, phase-windowed control in
`pre_physics_step` — dig 101-241, spin 241-361, grasp 361-536, insert
536-636 `:2822-2939`, per-phase `run_*_policy` closed loops `:2048-2313`)
minus the interactive viewer/keyboard UI (`set_lego_target_interface`).

One scene holds the whole pipeline: robot + brick heap + baseplate socket.
Each step emits ALL four sub-policy observation stacks (dig 65x3, spin 62x3,
grasp 132x3, insert 75x1); the caller (`seqdex.evaluation.evaluate_gui_chain`)
selects the phase's policy and feeds its action back — exactly how the GUI
env drives its four NNControllers.

Success = the Insert predicate on the target brick at the socket
(`..._insert_sim.py:1666-1667`: pos < 2 cm, rot < 0.2 rad with z-flip
symmetry).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

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
from ...sim.camera import make_segmentation_camera
from ...sim.scene import compile_scene
from ...sim.simulator import SimConfig, make_sim
from ..base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree
from .grasp_sim import control_ik
from .search import SearchConfig, _settle_heaps

_TARGET_EULER = (0.0, 3.1415, 1.571)

# phase lengths (offsets of the reference's, which start after a 101-step
# settle the pre-settled heap makes unnecessary: dig 140, spin 120, grasp
# 175, insert 100 steps — `gui.py:2822,2853,2891,2939`). Phases ADVANCE on
# success and RETRY on failure (the `assemble_one_lego` retry loops,
# `gui.py:2755-2775`), so the episode length is a cap, not a schedule.
PHASE_LEN = (140, 120, 175, 100)  # dig, spin, grasp, insert
MAX_RETRIES = 2  # per phase, mirroring the GUI retry-until-success loops
# scripted pre-grasp window at the head of the grasp phase during which
# hand<->target collisions are filtered off (the GUI sets filter=1 on both
# actors for the descent, `gui.py:2154-2155`, restoring at `:2229`)
PREGRASP_STEPS = 20
EPISODE_LENGTH = 535 + 300  # schedule + retry allowance

OBS_DIMS = {"dig": 65, "spin": 62, "grasp": 132, "insert": 75}
STACKS = {"dig": 3, "spin": 3, "grasp": 3, "insert": 1}


@dataclasses.dataclass(frozen=True)
class ChainEvalConfig:
    heap_bricks: int = 12
    heap_pool: int = 16
    settle_steps: int = 50
    # "all" (default): the heap carries mixed brick types (type = i % 8 like
    # Search, `search.py:610`) and the kinematic socket is the union slot
    # re-typed per env to the target brick's type via the multitype runtime
    # tables; a single name compiles the old single-type scene
    lego_type: str = "all"
    substeps: int = 2
    solver_iterations: int = 16
    max_contacts: int = 128
    camera_res: int = 64


class ChainTaskState(NamedTuple):
    sim: object
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs: dict  # per-policy stacked obs
    prev_targets: jnp.ndarray
    target_brick: jnp.ndarray
    target_init_pos: jnp.ndarray
    socket_pos: jnp.ndarray
    socket_rot: jnp.ndarray
    successes: jnp.ndarray
    actions: jnp.ndarray
    phase_idx: jnp.ndarray  # i32: 0 dig, 1 spin, 2 grasp, 3 insert
    phase_timer: jnp.ndarray  # i32 steps inside the current phase
    retries: jnp.ndarray  # i32 retries used in the current phase
    inserted: jnp.ndarray  # bool: insert succeeded; brick snapped to mate


def phase_of(progress):
    """Legacy fixed-schedule phase lookup (retained for callers that drive
    open-loop; the env itself tracks `phase_idx` with retries)."""
    bounds = (PHASE_LEN[0], PHASE_LEN[0] + PHASE_LEN[1],
              PHASE_LEN[0] + PHASE_LEN[1] + PHASE_LEN[2])
    p = jnp.int32(0)
    p = jnp.where(progress >= bounds[0], 1, p)
    p = jnp.where(progress >= bounds[1], 2, p)
    p = jnp.where(progress >= bounds[2], 3, p)
    return p


def make_chain_eval_env(cfg: ChainEvalConfig = ChainEvalConfig()) -> Env:
    from . import multitype

    multi = cfg.lego_type == "all"
    art_spec = builders.franka_allegro()
    brick_types = [
        (builders.LEGO_TYPES[i % 8] if multi else cfg.lego_type)
        for i in range(cfg.heap_bricks)
    ]
    bricks = [
        builders.lego_brick(t, name=f"brick{i}")
        for i, t in enumerate(brick_types)
    ]
    socket_kind = multitype.UNION_BRICK_KIND if multi else cfg.lego_type
    socket = dataclasses.replace(
        builders.lego_brick(socket_kind, name="socket"), kinematic=True
    )
    scene = compile_scene(
        art_spec,
        bodies=bricks + [socket],
        statics=[builders.table(), builders.ground()] + builders.bin_walls(),
    )
    type_tables = (multitype.build_type_tables(scene, "socket")
                   if multi else None)
    art = scene.art
    _force_links = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            max_contacts=cfg.max_contacts,
            force_links=_force_links,
        ),
    )
    D = art.ndof
    NB = cfg.heap_bricks
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    hand_lower, hand_upper = lower[7:23], upper[7:23]
    hand_base = art.link_index(builders.HAND_BASE_LINK)
    mount = art.link_index("panda_link7")
    camera_link = art.link_index("camera_link")
    tips = tuple(art.link_index(n) for n in builders.FINGERTIP_LINKS)
    fsr = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    socket_body = scene.body_index("socket")

    target_rot_lock = quat_from_euler_xyz(*[jnp.float32(v) for v in _TARGET_EULER])
    z_flip = jnp.asarray([0.0, 0.0, 1.0, 0.0], dtype=jnp.float32)
    base_pos_w = jnp.asarray(art.base_pos, dtype=jnp.float32)
    base_quat_w = jnp.asarray(art.base_quat, dtype=jnp.float32)
    cam_offset_quat = quat_from_euler_xyz(
        jnp.float32(0.0), jnp.float32(-3.141 + 0.5), jnp.float32(1.571)
    )
    cam_offset_pos = jnp.asarray([0.03, 0.009, 0.174], dtype=jnp.float32)
    seg_camera = make_segmentation_camera(cfg.camera_res, cfg.camera_res)
    cam_scale = (128 / cfg.camera_res) ** 2
    # per-body camera bounding halves (mixed types; socket row = the largest
    # footprint — it only occludes, it is never the segmentation target)
    brick_half = jnp.asarray(
        [[builders._LEGO_FOOTPRINT[t][0] * builders.LEGO_UNIT / 2,
          builders._LEGO_FOOTPRINT[t][1] * builders.LEGO_UNIT / 2,
          builders.LEGO_BODY_HALF_H] for t in brick_types]
        + [[max(builders._LEGO_FOOTPRINT[t][0] for t in set(brick_types))
            * builders.LEGO_UNIT / 2,
            max(builders._LEGO_FOOTPRINT[t][1] for t in set(brick_types))
            * builders.LEGO_UNIT / 2,
            builders.LEGO_BODY_HALF_H]], dtype=jnp.float32,
    )  # (NB + 1, 3)
    brick_type_idx = jnp.asarray(
        [builders.LEGO_TYPES.index(t) if t in builders.LEGO_TYPES else 0
         for t in brick_types], dtype=jnp.int32)
    # per-type emergence pixel thresholds at 128x128 (`search.py:1289`)
    from .search import _SEG_SUCCESS_THRESHOLD
    seg_threshold = jnp.asarray(_SEG_SUCCESS_THRESHOLD, dtype=jnp.float32)

    search_like = SearchConfig(
        heap_bricks=NB, heap_pool=cfg.heap_pool, settle_steps=cfg.settle_steps,
        substeps=cfg.substeps,
        solver_iterations=cfg.solver_iterations, max_contacts=cfg.max_contacts,
    )
    import numpy as _np

    heap_pos_np, heap_quat_np = _settle_heaps(sim, search_like)
    # pad kinematic socket slot
    heap_pos = jnp.asarray(heap_pos_np)
    heap_quat = jnp.asarray(heap_quat_np)

    default_q = jnp.zeros(D, dtype=jnp.float32)
    default_q = default_q.at[:7].set(jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32))

    def _tip_pos(fk_res):
        idx = jnp.asarray(tips)
        p = fk_res.pos[idx, :]
        q = fk_res.quat[idx, :]
        off = quat_apply(q, jnp.tile(jnp.asarray([0.0, 0.0, 0.04], dtype=jnp.float32), (4, 1)))
        return p + off

    def _empty_obs():
        return {
            name: jnp.zeros((STACKS[name], OBS_DIMS[name]), dtype=jnp.float32)
            for name in OBS_DIMS
        }

    def _observe(state: ChainTaskState, fk_res):
        s = state.sim
        q, qd = s.q, s.qd
        hb_pos = fk_res.pos[hand_base]
        hb_rot = fk_res.quat[hand_base]
        tb = state.target_brick
        tgt_pos = s.body_pos[tb]
        tgt_rot = s.body_quat[tb]
        tp = _tip_pos(fk_res)
        hand_q = unscale_from_limits(q[7:23], hand_lower, hand_upper)

        qb_inv, pb_inv = tf_inverse(base_quat_w, base_pos_w)
        hb_rot_b, hb_pos_b = tf_combine(qb_inv, pb_inv, hb_rot, hb_pos)
        q_cam, p_cam = tf_combine(
            fk_res.quat[mount], fk_res.pos[mount], cam_offset_quat, cam_offset_pos
        )
        qc_inv, pc_inv = tf_inverse(q_cam, p_cam)
        cam_tgt_rot, cam_tgt_pos = tf_combine(qc_inv, pc_inv, tgt_rot, tgt_pos)

        cam_pos = fk_res.pos[camera_link]
        cam_quat = fk_res.quat[camera_link]
        count, cx, cy = seg_camera(
            cam_pos, cam_quat, tb, s.body_pos, s.body_quat, brick_half
        )
        count = count * cam_scale

        # dig (65 = search 62 + seg stats, `gui.py` dig obs / `search.py:1156-1166`)
        dig = jnp.zeros(65, dtype=jnp.float32)
        dig = dig.at[0:16].set(hand_q)
        dig = dig.at[30:46].set(state.actions[7:23] - hand_q)
        dig = dig.at[46:62].set(state.actions[7:23])
        dig = dig.at[62:63].set(cx[None] / 128.0)
        dig = dig.at[63:64].set(cy[None] / 128.0)
        dig = dig.at[64:65].set(count[None] / 100.0)

        # spin (62, orient layout head)
        spin = jnp.zeros(62, dtype=jnp.float32)
        spin = spin.at[0:16].set(hand_q)
        spin = spin.at[16:19].set(hb_pos_b)
        spin = spin.at[19:23].set(hb_rot_b)
        spin = spin.at[23:26].set(cam_tgt_pos)
        spin = spin.at[26:30].set(cam_tgt_rot)
        spin = spin.at[30:46].set(0.2 * qd[7:23])

        # grasp (132, grasp_sim layout)
        idx = jnp.asarray(tips)
        tip13 = jnp.concatenate(
            [tp, fk_res.quat[idx, :], fk_res.linvel[idx, :], fk_res.angvel[idx, :]],
            axis=-1,
        )
        tgt13 = jnp.concatenate(
            [tgt_pos, tgt_rot, s.body_linvel[tb], s.body_angvel[tb]]
        )
        grasp = jnp.zeros(132, dtype=jnp.float32)
        grasp = grasp.at[0:16].set(hand_q)
        grasp = grasp.at[16:19].set(hb_pos_b)
        grasp = grasp.at[19:23].set(hb_rot_b)
        grasp = grasp.at[23:26].set(cam_tgt_pos)
        grasp = grasp.at[26:30].set(cam_tgt_rot)
        grasp = grasp.at[30:46].set(0.2 * qd[7:23])
        grasp = grasp.at[46:59].set(tip13[0])
        grasp = grasp.at[59:72].set(tip13[2])
        grasp = grasp.at[72:85].set(tip13[1])
        grasp = grasp.at[85:98].set(tip13[3])
        grasp = grasp.at[98:111].set(tgt13)
        grasp = grasp.at[111:114].set(hb_pos)
        grasp = grasp.at[114:118].set(hb_rot)
        grasp = grasp.at[118:121].set(state.target_init_pos)
        grasp = grasp.at[125:128].set(tgt_pos - state.target_init_pos)
        grasp = grasp.at[128:131].set(hb_pos - tgt_pos)

        # insert (75, insert_sim layout)
        sock_tgt = state.socket_pos + quat_apply(
            state.socket_rot, jnp.asarray([0.0, 0.015, 0.0375], dtype=jnp.float32)
        )
        ins = jnp.zeros(75, dtype=jnp.float32)
        ins = ins.at[0:16].set(hand_q)
        ins = ins.at[23:46].set(state.actions)
        ins = ins.at[46:49].set(hb_pos - sock_tgt)
        ins = ins.at[49:53].set(quat_mul(hb_rot, quat_conjugate(state.socket_rot)))
        ins = ins.at[53:56].set(hb_pos - tgt_pos)
        ins = ins.at[56:60].set(quat_mul(hb_rot, quat_conjugate(tgt_rot)))
        ins = ins.at[61:64].set(sock_tgt)
        ins = ins.at[64:68].set(state.socket_rot)
        ins = ins.at[68:71].set(tgt_pos - sock_tgt)
        ins = ins.at[71:75].set(quat_mul(tgt_rot, quat_conjugate(state.socket_rot)))

        return ({"dig": dig, "spin": spin, "grasp": grasp, "insert": ins},
                sock_tgt, count)

    def reset(key) -> ChainTaskState:
        k0, k1, k2, k3 = jax.random.split(key, 4)
        s = sim.init_state(default_q)
        h = jax.random.randint(k0, (), 0, cfg.heap_pool)
        target = jax.random.randint(k1, (), 0, NB)
        sp = jnp.asarray([0.25, -0.2, 0.618], dtype=jnp.float32)
        sq = quat_from_angle_axis(
            jax.random.randint(k2, (), 0, 2).astype(jnp.float32) * 1.57,
            jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32),
        )
        body_pos = jnp.concatenate([heap_pos[h], sp[None]], axis=0)
        body_quat = jnp.concatenate([heap_quat[h], sq[None]], axis=0)
        if type_tables is not None:
            # re-type the union socket slot to the target brick's type
            s = s._replace(geom=multitype.geom_for_type(
                type_tables, brick_type_idx[target]))
        s = s._replace(
            q=default_q, qd=jnp.zeros(D, dtype=jnp.float32), ctrl=default_q,
            body_pos=body_pos, body_quat=body_quat,
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
            # runtime per-phase collision-filter words (0 robot, 1..B
            # bodies, B+1 statics) — all-collide at reset
            collision_filter=jnp.zeros(s.body_pos.shape[0] + 2,
                                       dtype=jnp.int32),
        )
        state = ChainTaskState(
            sim=s, key=k3, progress=jnp.int32(0), reset_flag=jnp.bool_(False),
            obs=_empty_obs(), prev_targets=default_q, target_brick=target,
            target_init_pos=s.body_pos[target], socket_pos=sp, socket_rot=sq,
            successes=jnp.float32(0.0),
            actions=jnp.zeros(23, dtype=jnp.float32),
            phase_idx=jnp.int32(0),
            phase_timer=jnp.int32(0),
            retries=jnp.int32(0),
            inserted=jnp.bool_(False),
        )
        fk_res = sim.fk(s.q, s.qd)
        frames, _, _ = _observe(state, fk_res)
        obs = {k: push_frame(state.obs[k], v) for k, v in frames.items()}
        return state._replace(obs=obs)

    def step(state: ChainTaskState, action: jnp.ndarray):
        fresh = reset(state.key)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        s = state.sim
        fk_res = sim.fk(s.q, s.qd)
        prog = state.progress
        phase = state.phase_idx
        tb = state.target_brick
        tgt_pos = s.body_pos[tb]

        fingers = scale_to_limits(action[7:23], hand_lower, hand_upper)

        # per-phase arm control (mirrors gui.py phase windows):
        # dig/spin: object-centric tracking; grasp: policy IK deltas;
        # insert: wrist-locked policy position control
        track_err = tgt_pos - fk_res.pos[hand_base] + jnp.asarray(
            [-0.18, 0.0, 0.24], dtype=jnp.float32
        )
        policy_err = action[0:3] * 0.64
        pos_err = jnp.where(phase <= 1, track_err, policy_err)
        rot_err_lock = orientation_error(target_rot_lock, fk_res.quat[hand_base])
        rot_err = jnp.where(phase == 2, action[3:6] * 0.2, rot_err_lock)
        dpose = jnp.concatenate([pos_err, rot_err])
        J = sim.site_jacobian(fk_res, hand_base)[:, :7]
        delta = control_ik(J, dpose)
        targets = jnp.clip(
            jnp.concatenate([s.q[:7] + delta, fingers]), lower, upper
        )
        # ---- per-phase collision-filter + DOF drive switching
        # (`gui.py:3074-3092`): during the pre-grasp descent window the hand
        # and the target brick carry filter word 1 (their pairs AND to
        # nonzero -> no contact, so the scripted descent can't knock the
        # oriented brick over, `gui.py:2154-2229`); the spin phase raises
        # the hand drive stiffness 50 -> 70 (`set_dof_effort(..., 5, 70)`,
        # `gui.py:2050`)
        in_pregrasp = (phase == 2) & (state.phase_timer < PREGRASP_STEPS)
        w = jnp.where(in_pregrasp, 1, 0)
        words = jnp.zeros(s.body_pos.shape[0] + 2, dtype=jnp.int32)
        words = words.at[0].set(w).at[1 + tb].set(w)
        kp_sc = jnp.ones(D, dtype=jnp.float32).at[7:23].set(
            jnp.where(phase == 1, 70.0 / 50.0, 1.0))
        s = s._replace(ctrl=targets, collision_filter=words, kp_scale=kp_sc)
        s = sim.step(s, fk0=fk_res)
        prog = prog + 1
        state = state._replace(sim=s, progress=prog, prev_targets=targets, actions=action)

        fk2 = sim.fk(s.q, s.qd)
        frames, sock_tgt, seg_count = _observe(state, fk2)
        obs = {k: push_frame(state.obs[k], v) for k, v in frames.items()}

        tgt_pos = s.body_pos[tb]
        tgt_rot = s.body_quat[tb]
        pos_dist = jnp.linalg.norm(tgt_pos - sock_tgt)
        qd1 = quat_mul(tgt_rot, quat_conjugate(state.socket_rot))
        rot1 = 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(qd1[:3]), None, 1.0))
        qd2 = quat_mul(tgt_rot, quat_conjugate(quat_mul(state.socket_rot, z_flip)))
        rot2 = 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(qd2[:3]), None, 1.0))
        rot_dist = jnp.minimum(rot1, rot2)
        insert_ok = (pos_dist < 0.02) & (rot_dist < 0.2)
        success = jnp.where(insert_ok | state.inserted, 1.0, 0.0)

        # ---- retry state machine (`assemble_one_lego`, `gui.py:2755-2775`):
        # a phase advances when its success predicate holds at the end of
        # its window; otherwise it retries (up to MAX_RETRIES) ----
        phase_len = jnp.asarray(PHASE_LEN, dtype=jnp.int32)[phase]
        timer = state.phase_timer + 1
        window_over = timer >= phase_len
        lift = tgt_pos[2] - state.target_init_pos[2]
        z_axis = quat_apply(tgt_rot, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
        z_align = jnp.sign(z_axis[2]) * z_axis[2] ** 2
        # per-phase completion predicates. dig advances on the reference GUI
        # criterion — hand base within L1 reach of the target
        # (`is_search_success`, `gui.py:2714-2721`: sum |pos_err| < 0.03 +
        # 0.24 + 0.18) — AND the target's segmentation emergence above its
        # per-type pixel threshold (`search.py:1289` success table), i.e.
        # the block is actually dug out and visible, not merely nearby
        reach_err = jnp.sum(jnp.abs(tgt_pos - fk2.pos[hand_base]))
        emerged = seg_count >= seg_threshold[brick_type_idx[tb]]
        dug = (reach_err < 0.45) & emerged
        phase_ok = jnp.stack([
            dug,                           # dig (`is_search_success` + emergence)
            z_align > 0.8,                 # spin: face-up (`is_spin_success`)
            (lift > 0.08),                 # grasp: lifted (`is_grasping_success`)
            insert_ok,                     # insert (`is_insertion_success`)
        ])[phase]
        # insert succeeds mid-window too (no need to wait the window out)
        advance = (window_over & phase_ok) | ((phase == 3) & insert_ok)
        retry = window_over & ~phase_ok & (state.retries < MAX_RETRIES)
        give_up = window_over & ~phase_ok & (state.retries >= MAX_RETRIES)

        new_phase = jnp.where(advance, jnp.minimum(phase + 1, 3), phase)
        new_timer = jnp.where(advance | retry, 0, timer)
        new_retries = jnp.where(advance, 0,
                                jnp.where(retry, state.retries + 1, state.retries))
        inserted = state.inserted | ((phase == 3) & insert_ok)

        # inserted-mesh swap trick (`change_inserted_lego_mesh`,
        # `gui.py:2474-2566`): once inserted, snap the brick to the exact
        # mate pose and kill its velocity so later motion can't knock it off
        snap_pos = jnp.where(inserted, sock_tgt, s.body_pos[tb])
        snap_rot = jnp.where(inserted, state.socket_rot, s.body_quat[tb])
        s = s._replace(
            body_pos=s.body_pos.at[tb].set(snap_pos),
            body_quat=s.body_quat.at[tb].set(snap_rot),
            body_linvel=jnp.where(
                inserted, s.body_linvel.at[tb].set(0.0), s.body_linvel),
            body_angvel=jnp.where(
                inserted, s.body_angvel.at[tb].set(0.0), s.body_angvel),
        )

        timed_out = prog >= EPISODE_LENGTH - 1
        done = timed_out | inserted | give_up
        state = state._replace(
            sim=s, obs=obs, reset_flag=done, successes=success,
            phase_idx=new_phase, phase_timer=new_timer, retries=new_retries,
            inserted=inserted,
        )

        out = StepOutput(
            obs=clip_obs(obs["grasp"].reshape(-1)),  # default stream
            states=clip_obs(obs["grasp"].reshape(-1)),
            reward=success,
            done=done,
            info={
                "successes": success,
                "phase": phase,
                "retries": state.retries,
                "inserted": inserted.astype(jnp.float32),
                "terminal_type": brick_type_idx[tb],
                "pos_dist": pos_dist,
                "rot_dist": rot_dist,
                "obs_dig": clip_obs(obs["dig"].reshape(-1)),
                "obs_spin": clip_obs(obs["spin"].reshape(-1)),
                "obs_grasp": clip_obs(obs["grasp"].reshape(-1)),
                "obs_insert": clip_obs(obs["insert"].reshape(-1)),
            },
        )
        return state, out

    return Env(
        name="BlockAssemblyChainEval",
        num_obs=132 * 3,
        num_states=132 * 3,
        num_actions=23,
        episode_length=EPISODE_LENGTH,
        reset=reset,
        step=step,
        sim=sim,
    )
