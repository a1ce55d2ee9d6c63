"""BlockAssemblyOrient — spin/flip the grasped block until it lies face-up.

TPU-native re-implementation of
`tasks/block_assembly/allegro_hand_block_assembly_orient.py` (1934 LoC):
62-dim x 3 stacked observations, 188-dim states, finger-only policy control
with an object-centric tracking arm (pos_err = block - hand_base + (-0.18,
0, +0.22) offsets, wrist locked to `target_euler`, `:1735-1747`), reward
exp(-(5*z-align-err + 5*finger-dist-err)) (`compute_hand_reward`,
`:1843-1907`).

The reference resets into a Search terminal heap and runs a 50-step scripted
IK descent (`post_reset`, `:1655-1695`). Here the descent is solved
*kinematically* (iterated FK+damped-LS IK, no contact involved — the hand
only meets the block afterwards), which removes 50 simulated steps from
every reset while landing the same pre-grasp pose; block pose comes from a
reservoir or a random-orientation-on-table distribution.
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

ONE_FRAME_OBS = 62
ONE_FRAME_STATES = 188
STACK = 3
NUM_ACTIONS = 23

# scripted finger spread at reset (`..._orient.py:1590-1596`): unscaled units
_RESET_FINGER_UNSCALED = (0, 0, -1, 0.5, 1, 0, -1, 0.5, 0, 0, -1, 0.5, 0, 0, -1, 0.5)
_TARGET_EULER = (0.0, 3.1415, 1.571)


@dataclasses.dataclass(frozen=True)
class OrientConfig:
    episode_length: int = 75
    # domain-randomization engine (base_task.py:229-423 schema): physical
    # scales sampled per reset into the SimState DR fields
    randomize: bool = False
    action_moving_average: float = 1.0
    vel_obs_scale: float = 0.2
    # "all" = reference multi-type scene (runtime brick geometry, see
    # envs/block_assembly/multitype.py); a type name compiles single-type
    lego_type: str = "all"
    substeps: int = 2
    solver_iterations: int = 16
    max_contacts: int = 48
    descent_iters: int = 12  # kinematic IK iterations replacing the scripted descent
    obs_noise: bool = True
    # OrientOnce variant (`allegro_hand_block_assembly_orient_once.py`):
    # block starts a single axis-rotation away from face-up
    single_rotation: bool = False
    # reference scene budget: the reference Orient resets into the Search
    # terminal heap — 108 lego actors per env (`..._orient.py:1465`) — and
    # descends into it through physics (`:1655-1695`). clutter=True builds
    # `heap_bricks` mixed-type distractors + bin walls (settled pool,
    # reset-sampled) and runs `descent_steps` simulated steps of IK-tracked
    # descent after the kinematic solve, so the hand meets the pile the way
    # the reference's scripted descent does. The registry's
    # "BlockAssemblyOrient" enables this; clutter=False keeps the clean
    # table (fast; used by unit tests and the OrientOnce variant)
    clutter: bool = False
    heap_bricks: int = 107
    heap_pool: int = 8
    descent_steps: int = 24


class OrientTaskState(NamedTuple):
    sim: object
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs_stack: jnp.ndarray
    state_stack: jnp.ndarray
    prev_targets: jnp.ndarray
    target_init_pos: jnp.ndarray
    target_init_rot: jnp.ndarray
    successes: jnp.ndarray
    actions: jnp.ndarray
    lego_type: jnp.ndarray  # i32 scalar


def make_orient_env(cfg: OrientConfig = OrientConfig(), reservoir=None,
                    tvalue_params=None) -> Env:
    """reservoir: `handoff.BlockPoseSampler` of Search terminal block poses
    (reference loads the Search terminal heap pickle, `..._orient.py:419-420`).
    tvalue_params: GraspInsertTValue params — when provided, success is gated
    on sigmoid(t_value(cam_rot))[1] > 0.99 (`..._orient.py:1201-1203`,
    binarised then thresholded at 0.6 in `:1408`) and the binarised
    confidence is added to the reward (the bi-opt fine-tune shaping term,
    `..._orient.py:1887`)."""
    multi = cfg.lego_type == "all"
    from . import multitype

    art_spec = builders.franka_allegro()
    brick = builders.lego_brick(
        multitype.UNION_BRICK_KIND if multi else cfg.lego_type, name="target")
    bodies = [brick]
    statics = [builders.table(), builders.ground()]
    if cfg.clutter:
        bodies += [
            builders.lego_brick(builders.LEGO_TYPES[i % 8], name=f"heap{i}")
            for i in range(cfg.heap_bricks)
        ]
        statics += builders.bin_walls()
    scene = compile_scene(art_spec, bodies=bodies, statics=statics)
    type_tables = multitype.build_type_tables(scene) if multi else None
    num_types = len(builders.LEGO_TYPES)
    type_idx_static = (0 if multi
                       else builders.LEGO_TYPES.index(cfg.lego_type))

    from ...seqdex import reservoir as reslib
    from ...seqdex import tvalue as tvlib

    def init_ctx():
        """Runtime shared context (see envs/base.Env.init_ctx)."""
        res = (reservoir.res if reservoir is not None
               else reslib.create(
                   {"pos": jnp.zeros(3),
                    "rot": jnp.asarray([0.0, 0.0, 0.0, 1.0])},
                   capacity=4096, num_types=num_types))
        tv = (tvalue_params if tvalue_params is not None
              else tvlib.init_tvalue(
                  jax.random.PRNGKey(0), tvlib.GRASP_INSERT_IN,
                  tvlib.GRASP_INSERT_HIDDEN))
        return {
            "reservoir": res,
            "tvalue": tv,
            "tvalue_on": jnp.float32(0.0 if tvalue_params is None else 1.0),
        }
    art = scene.art
    _force_links = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            # a resting 107-brick heap needs ~450 active support contacts —
            # K=192 top-K-starves it into free fall (see search.py
            # max_contacts comment; same failure, found round 5)
            max_contacts=(cfg.max_contacts if not cfg.clutter
                          else max(cfg.max_contacts, 640)),
            force_links=_force_links,
            # heap-scale contact pipeline (same settings the Search env
            # runs with; see search.py SimConfig comments)
            **({"contact_precond": "cs", "reuse_contacts": True,
                "warm_iterations": 8, "neighbor_list": True,
                "nl_candidates": 64, "nl_group_size": 64}
               if cfg.clutter else {}),
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

    base_pos_w = jnp.asarray(art.base_pos, dtype=jnp.float32)
    base_quat_w = jnp.asarray(art.base_quat, dtype=jnp.float32)
    cam_offset_quat = quat_from_euler_xyz(
        jnp.float32(0.0), jnp.float32(-3.141 + 0.5), jnp.float32(1.571)
    )
    cam_offset_pos = jnp.asarray([0.03, 0.107 - 0.098, 0.067 + 0.107], dtype=jnp.float32)

    reset_fingers = scale_to_limits(
        jnp.asarray(_RESET_FINGER_UNSCALED, dtype=jnp.float32), hand_lower, hand_upper
    )
    # factory-scope constant: init_state's warm-started mass-operator
    # inverse is evaluated at compile time and needs a concrete pose
    reset_q0_const = jnp.zeros(D, dtype=jnp.float32).at[:7].set(
        jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32)
    ).at[7:23].set(reset_fingers)
    target_rot_lock = quat_from_euler_xyz(*[jnp.float32(v) for v in _TARGET_EULER])

    # ---- Search-terminal-heap pool (host, once): the reference's Orient
    # scene (`..._orient.py:1465` — 108 lego actors from the Search terminal
    # pickle), approximated by settled mixed-type heaps; the dug-out target
    # spawns above the pile surface ----
    if cfg.clutter:
        import numpy as np

        from .search import SearchConfig as _SC
        from .search import _heap_drop_layout

        _rng = np.random.RandomState(11)
        _sc = _SC(heap_bricks=cfg.heap_bricks)
        _drops = [_heap_drop_layout(_sc, _rng) for _ in range(cfg.heap_pool)]
        _hp0 = jnp.asarray(np.stack([d[0] for d in _drops]))
        _hq0 = jnp.asarray(np.stack([d[1] for d in _drops]))
        NH = cfg.heap_bricks

        def _settle_heap(bp, bq):
            s = sim.init_state(reset_q0_const)
            body_pos = s.body_pos.at[1:1 + NH].set(bp)
            body_quat = s.body_quat.at[1:1 + NH].set(bq)
            # park the target out of the pile during the settle
            body_pos = body_pos.at[0].set(
                jnp.asarray([0.6, -0.6, 0.7], dtype=jnp.float32))
            s = s._replace(body_pos=body_pos, body_quat=body_quat)
            s = jax.lax.fori_loop(0, 50, lambda _, st: sim.step(st), s)
            return s.body_pos[1:1 + NH], s.body_quat[1:1 + NH]

        _sp, _sq = jax.jit(jax.vmap(_settle_heap))(_hp0, _hq0)
        import numpy as _np

        heap_pos = jnp.asarray(_np.asarray(_sp))
        heap_quat = jnp.asarray(_np.asarray(_sq))
        _pile_top = float(_np.asarray(_sp)[..., 2].max())

    def _tip_pos(fk_res):
        idx = jnp.asarray(tips)
        p = fk_res.pos[idx, :]
        q = fk_res.quat[idx, :]
        off = quat_apply(q, jnp.tile(jnp.asarray([0.0, 0.0, 0.04], dtype=jnp.float32), (4, 1)))
        return p + off

    def _kinematic_descent(q0, block_pos):
        """Iterated IK to the pre-grasp pose above the block
        (replaces the 50-step scripted simulate loop, `..._orient.py:1655-1695`)."""

        def body(_, q):
            fk_res = sim.fk(q, jnp.zeros(D, dtype=jnp.float32))
            pos_err = block_pos - fk_res.pos[hand_base]
            pos_err = pos_err + jnp.asarray([-0.18, 0.0, 0.22], dtype=jnp.float32)
            rot_err = orientation_error(target_rot_lock, fk_res.quat[hand_base])
            dpose = jnp.concatenate([pos_err, rot_err])
            J = sim.site_jacobian(fk_res, hand_base)[:, :7]
            delta = control_ik(J, dpose)
            q = q.at[:7].add(delta)
            return jnp.clip(q, lower, upper)

        return jax.lax.fori_loop(0, cfg.descent_iters, body, q0)

    def _reset_sim(key, ctx):
        from ...core.math import quat_from_angle_axis, random_quat

        k1, k2, k3, kt = jax.random.split(key, 4)
        s = sim.init_state(reset_q0_const)
        if cfg.randomize:
            from ...envs.randomization import randomize_sim_state

            s = randomize_sim_state(s, jax.random.fold_in(k3, 7), D)
        if multi:
            t = jax.random.randint(kt, (), 0, num_types)
            s = s._replace(geom=multitype.geom_for_type(type_tables, t))
        else:
            t = jnp.int32(type_idx_static)
        # synthetic pose on the tabletop
        xy = jnp.asarray([0.25, 0.19], dtype=jnp.float32) + 0.02 * (
            jax.random.uniform(k1, (2,)) * 2 - 1
        )
        if cfg.single_rotation:
            # OrientOnce: one 90/180-degree rotation about a lateral axis
            k2a, k2b = jax.random.split(k2)
            angle = jax.random.randint(k2a, (), 1, 3).astype(jnp.float32) * (jnp.pi / 2)
            axis = jnp.where(
                jax.random.bernoulli(k2b),
                jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32),
                jnp.asarray([0.0, 1.0, 0.0], dtype=jnp.float32),
            )
            rot_syn = quat_from_angle_axis(angle, axis)
        else:
            # arbitrary orientation resting on the table (face/edge up)
            rot_syn = random_quat(k2)
        min_z = 0.635 if not cfg.clutter else _pile_top + 0.025
        pos_syn = jnp.concatenate([xy, jnp.asarray([min_z], dtype=jnp.float32)])
        # Search terminal from the per-type reservoir bucket when filled
        # (`..._orient.py:419-420`); saved blocks may be airborne (just dug
        # out) — settle onto the tabletop/pile surface keeping xy+orientation
        samp = reslib.sample(ctx["reservoir"], k1, t)
        have = ctx["reservoir"].count[t] > 0
        block_pos = jnp.where(have,
                              samp["pos"].at[2].set(
                                  jnp.maximum(samp["pos"][2], min_z)),
                              pos_syn)
        block_rot = jnp.where(have, samp["rot"], rot_syn)
        q0 = _kinematic_descent(reset_q0_const, block_pos)
        if cfg.clutter:
            kh = jax.random.fold_in(k3, 3)
            h = jax.random.randint(kh, (), 0, cfg.heap_pool)
            s = s._replace(
                body_pos=s.body_pos.at[1:1 + NH].set(heap_pos[h]),
                body_quat=s.body_quat.at[1:1 + NH].set(heap_quat[h]),
            )
        s = s._replace(
            qd=jnp.zeros(D, dtype=jnp.float32),
            body_pos=s.body_pos.at[target_body].set(block_pos),
            body_quat=s.body_quat.at[target_body].set(block_rot),
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        if cfg.clutter and cfg.descent_steps > 0:
            # descend THROUGH physics into the pile — the reference's
            # scripted IK descent (`..._orient.py:1655-1695`): each step
            # re-solves damped-LS IK against the block's CURRENT pose and
            # drives the arm PD targets there while the heap reacts
            pregrasp_off = jnp.asarray([-0.18, 0.0, 0.22], dtype=jnp.float32)

            def dbody(_, st):
                fk_res = sim.fk(st.q, st.qd)
                blk = st.body_pos[target_body]
                pos_err = blk + pregrasp_off - fk_res.pos[hand_base]
                rot_err = orientation_error(
                    target_rot_lock, fk_res.quat[hand_base])
                dpose = jnp.concatenate([pos_err, rot_err])
                J = sim.site_jacobian(fk_res, hand_base)[:, :7]
                delta = control_ik(J, dpose)
                ctrl = jnp.clip(st.q.at[:7].add(delta), lower, upper)
                ctrl = ctrl.at[7:23].set(reset_fingers)
                return sim.step(st._replace(ctrl=ctrl), fk_res)

            s = s._replace(q=reset_q0_const, ctrl=reset_q0_const)
            s = jax.lax.fori_loop(0, cfg.descent_steps, dbody, s)
            block_pos = s.body_pos[target_body]
            block_rot = s.body_quat[target_body]
        else:
            s = s._replace(q=q0, ctrl=q0)
        return s, block_pos, block_rot, t

    def _observe(state: OrientTaskState, fk_res):
        """62-dim frame: the first 62 slots of the sim-observation layout
        (`..._orient.py:1329-1341`; the reference's writes past index 62 are
        clipped by its own 62-dim frame window)."""
        s = state.sim
        q, qd = s.q, s.qd
        key, knoise = jax.random.split(state.key)

        hb_pos = fk_res.pos[hand_base]
        hb_rot = fk_res.quat[hand_base]
        tgt_pos = s.body_pos[target_body]
        tgt_rot = s.body_quat[target_body]

        qb_inv, pb_inv = tf_inverse(base_quat_w, base_pos_w)
        hb_rot_b, hb_pos_b = tf_combine(qb_inv, pb_inv, hb_rot, hb_pos)
        q_cam, p_cam = tf_combine(
            fk_res.quat[mount], fk_res.pos[mount], cam_offset_quat, cam_offset_pos
        )
        qc_inv, pc_inv = tf_inverse(q_cam, p_cam)
        cam_tgt_rot, cam_tgt_pos = tf_combine(qc_inv, pc_inv, tgt_rot, tgt_pos)
        cam_tgt_rot_clean = cam_tgt_rot  # T-value input is noiseless (`:1200`)
        if cfg.obs_noise:
            nz = jax.random.uniform(knoise, (7,)) * 2 - 1
            cam_tgt_pos = cam_tgt_pos + nz[0:3] * 0.003
            cam_tgt_rot = cam_tgt_rot + nz[3:7] * 0.2

        obs = jnp.zeros(ONE_FRAME_OBS, dtype=jnp.float32)
        obs = obs.at[0:16].set(unscale_from_limits(q[7:23], hand_lower, hand_upper))
        obs = obs.at[16:19].set(hb_pos_b)
        obs = obs.at[19:23].set(hb_rot_b)
        obs = obs.at[23:26].set(cam_tgt_pos)
        obs = obs.at[26:30].set(cam_tgt_rot)
        obs = obs.at[30:46].set(cfg.vel_obs_scale * qd[7:23])
        tp = _tip_pos(fk_res)
        obs = obs.at[46:59].set(
            jnp.concatenate([tp[0], fk_res.quat[tips[0]], fk_res.linvel[tips[0]],
                             fk_res.angvel[tips[0]]])
        )
        obs = obs.at[59:62].set(tp[2])

        # 188-dim state frame (same family as grasp_sim asymmetric states)
        idx = jnp.asarray(tips)
        tip_rot = fk_res.quat[idx, :]
        tip_lv = fk_res.linvel[idx, :]
        tip_av = fk_res.angvel[idx, :]
        finger_dist = sum(jnp.linalg.norm(tgt_pos - tp[i]) for i in range(4))
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
        st = st.at[148:151].set(state.target_init_pos)
        st = st.at[151:154].set(tgt_pos - state.target_init_pos)
        st = st.at[154:157].set(hb_pos - tgt_pos)
        st = st.at[157:161].set(quat_mul(hb_rot, quat_conjugate(tgt_rot)))
        st = st.at[161:164].set(tgt_pos - tp[0])
        st = st.at[164:167].set(tgt_pos - tp[2])
        st = st.at[167:170].set(tgt_pos - tp[1])
        st = st.at[170:173].set(tgt_pos - tp[3])
        st = st.at[173:174].set(finger_dist[None])
        st = st.at[174:177].set(cam_tgt_pos)
        st = st.at[177:181].set(cam_tgt_rot)
        return obs, st, key, cam_tgt_rot_clean

    def reset_ctx(key, ctx) -> OrientTaskState:
        k0, k1 = jax.random.split(key)
        s, bp, bq, t = _reset_sim(k0, ctx)
        state = OrientTaskState(
            sim=s,
            key=k1,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            state_stack=jnp.zeros((STACK, ONE_FRAME_STATES), dtype=jnp.float32),
            prev_targets=s.ctrl,
            target_init_pos=bp,
            target_init_rot=bq,
            successes=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
            lego_type=t,
        )
        fk_res = sim.fk(s.q, s.qd)
        obs, st, key, _ = _observe(state, fk_res)
        return state._replace(
            obs_stack=push_frame(state.obs_stack, obs),
            state_stack=push_frame(state.state_stack, st),
            key=key,
        )

    def step_ctx(state: OrientTaskState, action: jnp.ndarray, ctx):
        fresh = reset_ctx(state.key, ctx)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        s = state.sim
        fk_res = sim.fk(s.q, s.qd)

        # fingers: policy-controlled (`..._orient.py:1727-1731`)
        fingers = scale_to_limits(action[7:23], hand_lower, hand_upper)
        fingers = (
            cfg.action_moving_average * fingers
            + (1.0 - cfg.action_moving_average) * state.prev_targets[7:23]
        )
        # arm: object-centric tracking (`:1735-1747`) — policy does NOT drive it
        tgt_pos = s.body_pos[target_body]
        pos_err = tgt_pos - fk_res.pos[hand_base]
        pos_err = pos_err + jnp.asarray([-0.18, 0.0, 0.22], dtype=jnp.float32)
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
        obs, st, key, cam_tgt_rot = _observe(state, fk2)
        obs_stack = push_frame(state.obs_stack, obs)
        state_stack = push_frame(state.state_stack, st)

        # reward (`compute_hand_reward`, `..._orient.py:1843-1907`)
        tp = _tip_pos(fk2)
        tgt_pos = s.body_pos[target_body]
        tgt_rot = s.body_quat[target_body]
        finger_dist = (
            jnp.linalg.norm(tgt_pos - tp[0])
            + jnp.linalg.norm(tgt_pos - tp[1])
            + jnp.linalg.norm(tgt_pos - tp[2])
            + 3.0 * jnp.linalg.norm(tgt_pos - tp[3])
        )
        z_axis = quat_apply(tgt_rot, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
        x_axis = quat_apply(tgt_rot, jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32))
        z_align = jnp.sign(z_axis[2]) * z_axis[2] ** 2
        x_align = jnp.sign(x_axis[0]) * x_axis[0] ** 2

        z_err = 1.0 - (z_align + 1.0) / 2.0
        dist_err = jnp.clip(finger_dist - 0.4, 0.0, None)
        reward = jnp.exp(-(5.0 * z_err + 5.0 * dist_err))

        face_up = jnp.where(
            (z_align > 0.8) & ((1.0 - jnp.abs(x_align)) > 0.8), 1.0, 0.0
        )
        success = jnp.where(z_align > 0.8, 1.0, 0.0)

        # backward-pass T-value gate (runtime-switched via ctx["tvalue_on"]):
        # binarise sigmoid confidence at 0.99 (`..._orient.py:1201-1203`),
        # gate success (`:1408`), add the binarised confidence to the reward
        # (`:1887` shaping term)
        conf = tvlib.tvalue_confidence(ctx["tvalue"], cam_tgt_rot)
        on = ctx["tvalue_on"] > 0.5
        tvalue_bin = jnp.where(on, jnp.where(conf > 0.99, 1.0, 0.0), 1.0)
        success = success * tvalue_bin
        reward = reward + jnp.where(on, tvalue_bin, 0.0)

        timed_out = prog >= cfg.episode_length - 1
        done = timed_out

        # good-oriented terminal re-saving (`..._orient.py:1462-1515`): held
        # (finger_dist > 0.3 means the hand released/hovers by the block in
        # the reference gate `:1468`), face-up, and T-value-approved
        save_valid = done & (face_up > 0.0) & (tvalue_bin > 0.0)

        state = state._replace(
            obs_stack=obs_stack,
            state_stack=state_stack,
            key=key,
            reset_flag=done,
            successes=success,
        )
        out = StepOutput(
            obs=clip_obs(obs_stack.reshape(-1)),
            states=clip_obs(state_stack.reshape(-1)),
            reward=reward,
            done=done,
            info={
                "successes": success,
                "z_align": z_align,
                "face_up": face_up,
                "contact_forces": s.link_contact_force[jnp.asarray(fsr)],
                "terminal_valid": save_valid,
                "terminal_pos": tgt_pos,
                "terminal_rot": tgt_rot,
                "terminal_type": state.lego_type,
                "tvalue_valid": done,
                "tvalue_input": cam_tgt_rot,
                "tvalue_label": face_up,
            },
        )
        return state, out

    _default_ctx = init_ctx()

    def reset(key) -> OrientTaskState:  # ctx-unaware binding
        return reset_ctx(key, _default_ctx)

    def step(state: OrientTaskState, action: jnp.ndarray):
        return step_ctx(state, action, _default_ctx)

    env = Env(
        name="BlockAssemblyOrient",
        num_obs=ONE_FRAME_OBS * STACK,
        num_states=ONE_FRAME_STATES * STACK,
        num_actions=NUM_ACTIONS,
        episode_length=cfg.episode_length,
        reset=reset,
        step=step,
        sim=sim,
        init_ctx=init_ctx,
        reset_ctx=reset_ctx,
        step_ctx=step_ctx,
    )

    def collect_terminal_states(params, num_envs=64, steps=None, seed=0,
                                sampler=None, ctx=None,
                                stochastic=False):
        """Face-up oriented block poses -> per-type BlockPoseSampler feeding
        GraspSim resets (`..._orient.py:1462-1515`)."""
        from ...seqdex.handoff import BlockPoseSampler, rollout_collect

        steps = steps or cfg.episode_length + 2
        data = rollout_collect(
            env, params, num_envs, steps, seed=seed,
            keys=("terminal_pos", "terminal_rot", "terminal_type"),
            ctx=ctx, stochastic=stochastic,
        )
        sampler = sampler or BlockPoseSampler(num_types=len(builders.LEGO_TYPES))
        if len(data["terminal_pos"]):
            sampler.insert(
                jnp.asarray(data["terminal_pos"]),
                jnp.asarray(data["terminal_rot"]),
                jnp.ones(len(data["terminal_pos"]), dtype=bool),
                type_idx=jnp.asarray(data["terminal_type"], dtype=jnp.int32),
            )
        return sampler

    def collect_tvalue_data(params, num_envs=64, steps=None, seed=0, ctx=None,
                           stochastic=False):
        from ...seqdex.handoff import rollout_collect, split_tvalue_data

        steps = steps or cfg.episode_length + 2
        data = rollout_collect(
            env, params, num_envs, steps, seed=seed,
            keys=("tvalue_input", "tvalue_label"), valid_key="tvalue_valid",
            ctx=ctx, stochastic=stochastic,
        )
        return split_tvalue_data(data)

    return dataclasses.replace(
        env,
        collect_terminal_states=collect_terminal_states,
        collect_tvalue_data=collect_tvalue_data,
    )
