"""BlockAssemblyGraspSim — grasp the oriented block and lift it.

TPU-native re-implementation of
`tasks/block_assembly/allegro_hand_block_assembly_grasp_sim.py` (1803 LoC):
same observation layout (132-dim x 3 stacked frames, asymmetric 188-dim
states), same 23-dim action semantics (6-dof EE delta -> damped-LS IK for the
arm + 16 scaled finger position targets), same reward
(`compute_hand_reward`, `..._grasp_sim.py:1707-1776`), same scripted phase
schedule (lift > 75, retract to insertion-prepare poses > 100 / > 125,
`:1592-1606`).

Differences by design:
* Physics runs in the in-process JAX simulator instead of PhysX.
* Reset draws the block pose from a synthetic "oriented block on the table"
  distribution, or from a terminal-state reservoir when one is provided
  (reference loads Search/Orient terminal-state pickles, `:412-415,1448+`).
* The camera-frame target pose is computed analytically from FK (the
  reference composes `mount x camera_offset` the same way, `:1176-1190`).
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
from ...sim.simulator import SimConfig, SimState, make_sim
from ..base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree

ONE_FRAME_OBS = 132  # `..._grasp_sim.py:193-197` num_obs_dict["partial_contact"]
ONE_FRAME_STATES = 188
STACK = 3
NUM_ACTIONS = 23


@dataclasses.dataclass(frozen=True)
class GraspSimConfig:
    episode_length: int = 150  # cfg episodeLength
    action_moving_average: float = 1.0  # cfg actionsMovingAverage
    vel_obs_scale: float = 0.2
    # reset noise (cfg resetPositionNoise / resetDofPosRandomInterval ~ 0)
    reset_pos_noise: float = 0.01
    reset_yaw_noise: float = 3.1415926
    # "all" = the reference multi-type scene: every env samples one of the 8
    # lego types per reset (`..._grasp_sim.py:706-745,959-965` builds all 8
    # per env with `segmentation_id = i % 8`), realised here as runtime
    # brick geometry (envs/block_assembly/multitype.py). A single type name
    # compiles a fixed-geometry variant.
    lego_type: str = "all"
    # per-type reset sampling weights (multi-type scenes only; None =
    # uniform like the reference's i % 8 assignment). The harvest pipeline
    # oversamples types whose grasp success is rare so the grasp-terminal
    # reservoir fills type-balanced (the reference harvests >= 5000 PER
    # TYPE before moving on, `search.py:1304-1355`).
    type_weights: tuple = None
    # scripted phase boundaries (`..._grasp_sim.py:1592-1606`)
    lift_step: int = 75
    retract1_step: int = 100
    retract2_step: int = 125
    substeps: int = 2
    solver_iterations: int = 16
    max_contacts: int = 48
    # reference-scale scene clutter (`..._grasp_sim.py:706-745`: 9 layers x
    # 8 lego types dropped into the bin + the baseplate): adds
    # `clutter_bricks` mixed-type distractor bricks (settled pool, reset-
    # sampled), the bin walls, and the kinematic baseplate to every env.
    # Off by default (the clean scene trains faster); the flagship bench
    # reports both numbers.
    clutter: bool = False
    clutter_bricks: int = 72
    clutter_pool: int = 8
    obs_noise: bool = True
    # random-force fault injection (reference `forceScale`/`forceProbRange`
    # decay model, `..._grasp_sim.py:129-132`, applied `search.py:1578-1589`)
    force_scale: float = 0.0
    force_prob: float = 0.05
    # real-robot-aligned variant (`allegro_hand_block_assembly_grasp.py`,
    # `compute_real_observations` `..._grasp_sim.py:1285-1300`): obs frame
    # carries only proprioception + action history (no sim-privileged object
    # state) — the deployable observation protocol
    real_obs: bool = False
    # domain-randomization engine (`base_task.py:229-423` schema via
    # `envs/randomization.py`): physical scales sampled per reset into the
    # SimState DR fields
    randomize: bool = False
    # z-align-gated lift reward + terminal success bonus (divergence from
    # the reference's bare dist+lift, which decouples reward from the
    # success predicate — the round-2 success-collapse mechanism)
    align_gated_reward: bool = True


class GraspTaskState(NamedTuple):
    sim: SimState
    key: jnp.ndarray
    progress: jnp.ndarray  # i32 scalar
    reset_flag: jnp.ndarray  # bool — env needs re-init at next step
    obs_stack: jnp.ndarray  # (3, 132)
    state_stack: jnp.ndarray  # (3, 188)
    prev_targets: jnp.ndarray  # (23,)
    target_init_pos: jnp.ndarray  # (3,)
    target_init_rot: jnp.ndarray  # (4,)
    successes: jnp.ndarray
    meta_rew: jnp.ndarray
    actions: jnp.ndarray  # last actions (23,)
    lego_type: jnp.ndarray  # i32 scalar — this env's target type (ref i % 8)


# insertion-prepare arm poses (`..._grasp_sim.py` arm_hand_insertion_prepare_dof_pos_list)
# reference insertion-prepare arm poses (`..._grasp_sim.py:278,281` —
# arm_hand_insertion_prepare_dof_pos_list): the scripted retract drives the
# arm here, hovering the held block over the baseplate; these ARE the
# InsertSim reset arm states
_INSERT_PREPARE_1 = (-0.1560, -0.2140, -0.2795, -2.1806, -0.0681, 1.9730,
                     1.1735)
_INSERT_PREPARE_2 = (-0.1800, -0.1604, -0.2770, -2.2674, -0.0533, 2.1049,
                     1.1696)


def control_ik(j_eef: jnp.ndarray, dpose: jnp.ndarray, damping: float = 0.05):
    """Damped least-squares IK (reference `..._grasp_sim.py:1794-1803`)."""
    jt = j_eef.T  # (7, 6)
    lmbda = jnp.eye(6, dtype=j_eef.dtype) * damping**2
    return jt @ jnp.linalg.solve(j_eef @ jt + lmbda, dpose)


def make_grasp_sim_env(cfg: GraspSimConfig = GraspSimConfig(), reservoir=None,
                       tvalue_params=None) -> Env:
    """reservoir: `handoff.BlockPoseSampler` of Orient terminal block poses
    (reference loads Search/Orient terminal pickles at reset,
    `..._grasp_sim.py:412-415,1448+`). tvalue_params: GraspInsertTValue
    params — gates terminal-state saving at confidence > 0.8
    (`..._grasp_sim.py:1404-1407`) during the bi-opt backward pass."""
    multi = cfg.lego_type == "all"
    from . import multitype

    art_spec = builders.franka_allegro()
    brick = builders.lego_brick(
        multitype.UNION_BRICK_KIND if multi else cfg.lego_type, name="target")
    bodies = [brick]
    statics = [builders.table(), builders.ground()]
    if cfg.clutter:
        # reference scene budget: mixed-type distractor pile in the bin +
        # bin walls + baseplate (`..._grasp_sim.py:706-745`)
        bodies += [
            builders.lego_brick(builders.LEGO_TYPES[i % 8], name=f"clutter{i}")
            for i in range(cfg.clutter_bricks)
        ]
        bodies.append(builders.baseplate())
        statics += builders.bin_walls()
    scene = compile_scene(art_spec, bodies=bodies, statics=statics)
    type_tables = multitype.build_type_tables(scene) if multi else None
    num_types = len(builders.LEGO_TYPES)
    art = scene.art
    _force_links = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            # a resting 72-brick pile needs ~300 active support contacts —
            # K=160 top-K-starves it into free fall (see search.py
            # max_contacts comment; same failure, found round 5)
            max_contacts=(cfg.max_contacts if not cfg.clutter
                          else max(cfg.max_contacts, 512)),
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

    base_pos_w = jnp.asarray(art.base_pos, dtype=jnp.float32)
    base_quat_w = jnp.asarray(art.base_quat, dtype=jnp.float32)

    # camera extrinsics on the panda_link7 mount (`..._grasp_sim.py:887-889`)
    cam_offset_quat = quat_from_euler_xyz(
        jnp.float32(0.0), jnp.float32(-3.141 + 0.5), jnp.float32(1.571)
    )
    cam_offset_pos = jnp.asarray([0.03, 0.107 - 0.098, 0.067 + 0.107], dtype=jnp.float32)

    default_q = jnp.zeros(D, dtype=jnp.float32)
    default_q = default_q.at[:7].set(jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32))
    # fingers start at their upper limits (reference `..._grasp_sim.py:252-253`)
    default_q = default_q.at[7:23].set(hand_upper)

    # ---- clutter pile pool (host, once): drop + settle the distractors ----
    _plate_pos = jnp.asarray([0.25, -0.19, 0.62], dtype=jnp.float32)
    if cfg.clutter:
        from .search import SearchConfig as _SC
        from .search import _heap_drop_layout

        _rng = np.random.RandomState(7)
        _sc = _SC(heap_bricks=cfg.clutter_bricks)
        _drops = [_heap_drop_layout(_sc, _rng) for _ in range(cfg.clutter_pool)]
        _pos0 = jnp.asarray(np.stack([d[0] for d in _drops]))
        _quat0 = jnp.asarray(np.stack([d[1] for d in _drops]))
        _nclut = cfg.clutter_bricks
        _plate_body = 1 + _nclut

        def _settle_clutter(bp, bq):
            s = sim.init_state(default_q)
            body_pos = s.body_pos.at[1:1 + _nclut].set(bp)
            body_quat = s.body_quat.at[1:1 + _nclut].set(bq)
            # park the target out of the pile; pin the kinematic plate
            body_pos = body_pos.at[0].set(
                jnp.asarray([0.6, -0.6, 0.7], dtype=jnp.float32))
            body_pos = body_pos.at[_plate_body].set(_plate_pos)
            s = s._replace(q=default_q, ctrl=default_q, body_pos=body_pos,
                           body_quat=body_quat)
            s = jax.lax.fori_loop(0, 50, lambda _, st: sim.step(st), s)
            return s.body_pos[1:1 + _nclut], s.body_quat[1:1 + _nclut]

        _cp, _cq = jax.jit(jax.vmap(_settle_clutter))(_pos0, _quat0)
        clutter_pos = jnp.asarray(np.asarray(_cp))
        clutter_quat = jnp.asarray(np.asarray(_cq))
        # settled pile top: the synthetic target pose spawns above it
        _pile_top = float(np.asarray(_cp)[..., 2].max())
    else:
        _pile_top = None

    prep1 = jnp.asarray(_INSERT_PREPARE_1, dtype=jnp.float32)
    prep2 = jnp.asarray(_INSERT_PREPARE_2, dtype=jnp.float32)

    def _tip_pos(fk_res):
        """Fingertip positions with the +0.04 z-offset the reference applies
        (`..._grasp_sim.py:1160-1163`). Returns (4, 3): ff, mf, rf, th."""
        idx = jnp.asarray(tips)
        p = fk_res.pos[idx, :]
        q = fk_res.quat[idx, :]
        off = quat_apply(q, jnp.tile(jnp.asarray([0.0, 0.0, 0.04], dtype=jnp.float32), (4, 1)))
        return p + off

    type_idx_static = (0 if multi
                       else builders.LEGO_TYPES.index(cfg.lego_type))

    if cfg.randomize:
        from ...envs.randomization import RandomizationParams, sample_factors

        rand_params = RandomizationParams()

    from ...seqdex import reservoir as reslib
    from ...seqdex import tvalue as tvlib

    def init_ctx():
        """Runtime shared context: reservoir contents + T-value params.

        Contents are runtime state (threaded by the trainers as an argument)
        — refreshing them between bi-opt iterations re-runs the same
        compiled program. `tvalue_on` switches the backward pass's
        terminal-save gating (`..._grasp_sim.py:1404-1407`) at runtime.
        """
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
            "tvalue_on": jnp.float32(
                0.0 if tvalue_params is None else 1.0),
        }

    def _reset_sim(key, ctx) -> tuple:
        k1, k2, k3, kt = jax.random.split(key, 4)
        s = sim.init_state(default_q)
        if multi:
            # reference: all 8 types per env, target = i % 8
            # (`..._grasp_sim.py:959-965`); here the type is sampled per
            # reset and the brick slot's geometry gathered from the table
            if cfg.type_weights is not None:
                w = jnp.asarray(cfg.type_weights, dtype=jnp.float32)
                t = jax.random.choice(kt, num_types, p=w / w.sum())
            else:
                t = jax.random.randint(kt, (), 0, num_types)
            s = s._replace(geom=multitype.geom_for_type(type_tables, t))
        else:
            t = jnp.int32(type_idx_static)
        if cfg.randomize:
            f = sample_factors(rand_params, k3, jnp.float32(1e6), 1, 1, D)
            s = s._replace(
                kp_scale=f.kp_scale, kd_scale=f.kd_scale,
                mu_scale=f.friction_scale, mass_scale=f.mass_scale,
                gravity_offset=f.gravity_offset,
            )
        # synthetic pose: upright block near bin center, random yaw
        xy = jnp.asarray([0.25, 0.19], dtype=jnp.float32) + cfg.reset_pos_noise * (
            jax.random.uniform(k1, (2,)) * 2 - 1
        )
        yaw = cfg.reset_yaw_noise * (jax.random.uniform(k2, ()) * 2 - 1)
        bq_syn = quat_from_angle_axis(yaw, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
        _tgt_z = 0.619 if not cfg.clutter else _pile_top + 0.02
        bp_syn = jnp.concatenate([xy, jnp.asarray([_tgt_z], dtype=jnp.float32)])
        # upstream oriented-block terminal pose from the per-type reservoir
        # bucket (`..._grasp_sim.py:1448-1455`); empty bucket -> synthetic
        samp = reslib.sample(ctx["reservoir"], k1, t)
        have = ctx["reservoir"].count[t] > 0
        bp = jnp.where(have, samp["pos"], bp_syn)
        bq = jnp.where(have, samp["rot"], bq_syn)
        body_pos = s.body_pos.at[target_body].set(bp)
        body_quat = s.body_quat.at[target_body].set(bq)
        if cfg.clutter:
            kh = jax.random.randint(k2, (), 0, cfg.clutter_pool)
            body_pos = body_pos.at[1:1 + _nclut].set(clutter_pos[kh])
            body_quat = body_quat.at[1:1 + _nclut].set(clutter_quat[kh])
            body_pos = body_pos.at[_plate_body].set(_plate_pos)
        s = s._replace(
            q=default_q,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=default_q,
            body_pos=body_pos,
            body_quat=body_quat,
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        return s, bp, bq, t

    def _observe(state: GraspTaskState, fk_res):
        """One 132-dim obs frame + 188-dim state frame
        (`compute_sim_observations` `..._grasp_sim.py:1302-1332` and
        `compute_contact_asymmetric_observations` `:1221-1283`)."""
        s = state.sim
        q, qd = s.q, s.qd
        key, knoise = jax.random.split(state.key)

        hb_pos = fk_res.pos[hand_base]
        hb_rot = fk_res.quat[hand_base]
        hb_lv = fk_res.linvel[hand_base]
        hb_av = fk_res.angvel[hand_base]

        tp = _tip_pos(fk_res)  # ff, mf, rf, th
        idx = jnp.asarray(tips)
        tip_rot = fk_res.quat[idx, :]
        tip_lv = fk_res.linvel[idx, :]
        tip_av = fk_res.angvel[idx, :]

        tgt_pos = s.body_pos[target_body]
        tgt_rot = s.body_quat[target_body]
        tgt_lv = s.body_linvel[target_body]
        tgt_av = s.body_angvel[target_body]

        # robot-base-frame hand pose
        qb_inv, pb_inv = tf_inverse(base_quat_w, base_pos_w)
        hb_rot_b, hb_pos_b = tf_combine(qb_inv, pb_inv, hb_rot, hb_pos)

        # camera frame (mount = panda_link7)
        q_cam, p_cam = tf_combine(
            fk_res.quat[mount], fk_res.pos[mount], cam_offset_quat, cam_offset_pos
        )
        qc_inv, pc_inv = tf_inverse(q_cam, p_cam)
        cam_tgt_rot, cam_tgt_pos = tf_combine(qc_inv, pc_inv, tgt_rot, tgt_pos)
        cam_init_rot, cam_init_pos = tf_combine(
            qc_inv, pc_inv, state.target_init_rot, state.target_init_pos
        )
        if cfg.obs_noise:
            nz = jax.random.uniform(knoise, (7,)) * 2 - 1
            cam_tgt_pos_n = cam_tgt_pos + nz[0:3] * 0.003
            cam_tgt_rot_n = cam_tgt_rot + nz[3:7] * 0.2
        else:
            cam_tgt_pos_n, cam_tgt_rot_n = cam_tgt_pos, cam_tgt_rot

        hand_q_scaled = unscale_from_limits(q[7:23], hand_lower, hand_upper)

        tip_state = jnp.concatenate(
            [tp, tip_rot, tip_lv, tip_av], axis=-1
        )  # (4, 13) ff, mf, rf, th
        tgt_state13 = jnp.concatenate([tgt_pos, tgt_rot, tgt_lv, tgt_av])

        obs = jnp.zeros(ONE_FRAME_OBS, dtype=jnp.float32)
        obs = obs.at[0:16].set(hand_q_scaled)
        if cfg.real_obs:
            # real-aligned frame (`compute_real_observations`,
            # `..._grasp_sim.py:1285-1300`): proprioception + action history
            # only — the deployable protocol; critic states stay privileged
            obs = obs.at[30:46].set(state.actions[7:23] - hand_q_scaled)
            obs = obs.at[46:62].set(state.actions[7:23])
        else:
            obs = obs.at[16:19].set(hb_pos_b)
            obs = obs.at[19:23].set(hb_rot_b)
            obs = obs.at[23:26].set(cam_tgt_pos_n)
            obs = obs.at[26:30].set(cam_tgt_rot_n)
            obs = obs.at[30:46].set(cfg.vel_obs_scale * qd[7:23])
            obs = obs.at[46:59].set(tip_state[0])  # ff
            obs = obs.at[59:72].set(tip_state[2])  # rf
            obs = obs.at[72:85].set(tip_state[1])  # mf
            obs = obs.at[85:98].set(tip_state[3])  # th
            obs = obs.at[98:111].set(tgt_state13)
            obs = obs.at[111:114].set(hb_pos)
            obs = obs.at[114:118].set(hb_rot)
            obs = obs.at[118:121].set(state.target_init_pos)
            obs = obs.at[121:125].set(state.target_init_rot)
            obs = obs.at[125:128].set(tgt_pos - state.target_init_pos)
            obs = obs.at[128:131].set(hb_pos - tgt_pos)

        # asymmetric critic state frame (188)
        finger_dist = (
            jnp.linalg.norm(tgt_pos - tp[0])
            + jnp.linalg.norm(tgt_pos - tp[1])
            + jnp.linalg.norm(tgt_pos - tp[2])
            + jnp.linalg.norm(tgt_pos - tp[3])
        )
        st = jnp.zeros(ONE_FRAME_STATES, dtype=jnp.float32)
        st = st.at[0:23].set(unscale_from_limits(q[0:23], lower, upper))
        st = st.at[23:46].set(cfg.vel_obs_scale * qd[0:23])
        st = st.at[46:49].set(tp[0])
        st = st.at[49:52].set(tp[2])
        st = st.at[52:55].set(tp[1])
        st = st.at[55:58].set(tp[3])
        st = st.at[58:81].set(state.actions)
        st = st.at[81:84].set(hb_pos)
        st = st.at[84:88].set(hb_rot)
        st = st.at[88:91].set(tgt_pos)
        st = st.at[91:95].set(tgt_rot)
        st = st.at[95:98].set(hb_lv)
        st = st.at[98:101].set(hb_av)
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
        st = st.at[142:145].set(tgt_lv)
        st = st.at[145:148].set(tgt_av)
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
        st = st.at[181:184].set(cam_tgt_pos)
        st = st.at[184:188].set(cam_tgt_rot)
        return obs, st, key, cam_tgt_rot

    def reset_ctx(key, ctx) -> GraspTaskState:
        k0, k1 = jax.random.split(key)
        s, bp, bq, t = _reset_sim(k0, ctx)
        state = GraspTaskState(
            sim=s,
            key=k1,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            state_stack=jnp.zeros((STACK, ONE_FRAME_STATES), dtype=jnp.float32),
            prev_targets=default_q,
            target_init_pos=bp,
            target_init_rot=bq,
            successes=jnp.float32(0.0),
            meta_rew=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
            lego_type=t,
        )
        fk_res = sim.fk(s.q, s.qd)
        obs, st, key, _ = _observe(state, fk_res)
        state = state._replace(
            obs_stack=push_frame(state.obs_stack, obs),
            state_stack=push_frame(state.state_stack, st),
            key=key,
        )
        return state

    def step_ctx(state: GraspTaskState, action: jnp.ndarray, ctx):
        # fold pending reset (reference resets inside pre_physics_step)
        fresh = reset_ctx(state.key, ctx)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        s = state.sim
        fk_res = sim.fk(s.q, s.qd)
        prog = state.progress

        # finger targets: scale + EMA (`..._grasp_sim.py:1585-1589`)
        fingers = scale_to_limits(action[7:23], hand_lower, hand_upper)
        fingers = (
            cfg.action_moving_average * fingers
            + (1.0 - cfg.action_moving_average) * state.prev_targets[7:23]
        )
        # phase > lift: freeze fingers at previous targets (`:1606`)
        fingers = jnp.where(prog > cfg.lift_step, state.prev_targets[7:23], fingers)

        # arm: 6-dof EE delta -> damped-LS IK (`:1594-1602`)
        pos_err = action[0:3] * 0.64
        rot_err = action[3:6] * 0.2
        # lift phase: lock xy, command z toward lift height (`:1596-1599`)
        lift_z = 0.2 + 0.22 + (state.target_init_pos[2] - fk_res.pos[hand_base][2])
        pos_err = jnp.where(
            prog > cfg.lift_step,
            jnp.stack([0.0 * pos_err[0], 0.0 * pos_err[1], lift_z]),
            pos_err,
        )
        dpose = jnp.concatenate([pos_err, rot_err])
        J = sim.site_jacobian(fk_res, hand_base)[:, :7]  # (6, 7)
        delta = control_ik(J, dpose)
        arm_targets = s.q[:7] + delta
        arm_targets = jnp.where(prog > cfg.retract1_step, prep1, arm_targets)
        arm_targets = jnp.where(prog > cfg.retract2_step, prep2, arm_targets)

        targets = jnp.concatenate([arm_targets, fingers])
        targets = jnp.clip(targets, lower, upper)

        s = s._replace(ctrl=targets)
        if cfg.force_scale > 0.0:
            kf, kp_ = jax.random.split(state.key)
            state = state._replace(key=kp_)
            kick = jax.random.normal(kf, (3,)) * cfg.force_scale
            fire = (jax.random.uniform(jax.random.fold_in(kf, 1), ()) < cfg.force_prob)
            s = s._replace(
                body_linvel=s.body_linvel.at[target_body].add(
                    jnp.where(fire, kick, 0.0)
                )
            )
        s = sim.step(s, fk0=fk_res)
        prog = prog + 1

        state = state._replace(
            sim=s, progress=prog, prev_targets=targets, actions=action
        )

        fk_res2 = sim.fk(s.q, s.qd)
        obs, st, key, cam_tgt_rot = _observe(state, fk_res2)
        obs_stack = push_frame(state.obs_stack, obs)
        state_stack = push_frame(state.state_stack, st)

        # reward (`compute_hand_reward` `..._grasp_sim.py:1707-1776`)
        tp = _tip_pos(fk_res2)
        tgt_pos = s.body_pos[target_body]
        tgt_rot = s.body_quat[target_body]
        finger_dist = (
            jnp.linalg.norm(tgt_pos - tp[0])
            + jnp.linalg.norm(tgt_pos - tp[1])
            + jnp.linalg.norm(tgt_pos - tp[2])
            + 3.0 * jnp.linalg.norm(tgt_pos - tp[3])
        )
        z_axis = quat_apply(tgt_rot, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
        dot1 = z_axis[2]
        lego_z_align = jnp.sign(dot1) * dot1**2

        dist_rew = jnp.exp(-2.0 * jnp.clip(finger_dist - 0.5, 0.0, None)) * 0.1
        lift = tgt_pos[2] - state.target_init_pos[2]
        up_rew = jnp.clip(lift, 0.0, 0.2) * 100.0
        up_rew = jnp.clip(jnp.where(finger_dist < 0.5, up_rew, 0.0), None, 20.0)
        # Deliberate divergence from the reference's bare dist+lift sum
        # (`..._grasp_sim.py:1751`): round-2 training collapsed (21% -> 10%
        # success while reward climbed) because lifting a TIPPED brick pays
        # fully yet fails the z-align success predicate. Gate the lift term
        # by alignment and pay a terminal success bonus so the optimum of
        # the reward is the optimum of the success metric.
        if cfg.align_gated_reward:
            align_gate = jnp.clip(lego_z_align, 0.0, 1.0)
            up_rew = up_rew * (0.25 + 0.75 * align_gate)
        reward = dist_rew + up_rew

        timed_out = prog >= cfg.episode_length - 1
        slipped = (prog >= cfg.lift_step) & (finger_dist >= 0.6)
        done = timed_out | slipped
        # timeout penalty (0.5 * fall_penalty, fall_penalty = 0 in cfg)
        success = jnp.where((lift > 0.1) & (lego_z_align > 0.6), 1.0, 0.0)
        if cfg.align_gated_reward:
            reward = reward + 5.0 * success

        # terminal-state handoff + T-value gating (`..._grasp_sim.py:1399-1458`):
        # a grasp terminal is save-worthy when the episode ends held (not
        # slipped) and lifted; the backward pass additionally gates on the
        # Grasp->Insert T-value confidence > 0.8 (`:1404-1407`)
        grasp_ok = (success > 0.0) & (finger_dist < 0.6)
        conf = tvlib.tvalue_confidence(ctx["tvalue"], cam_tgt_rot)
        save_valid = done & grasp_ok & jnp.where(
            ctx["tvalue_on"] > 0.5, conf > 0.8, True)

        state = state._replace(
            obs_stack=obs_stack,
            state_stack=state_stack,
            key=key,
            reset_flag=done,
            successes=success,
            meta_rew=state.meta_rew + reward,
        )
        out = StepOutput(
            obs=clip_obs(obs_stack.reshape(-1)),
            states=clip_obs(state_stack.reshape(-1)),
            reward=reward,
            done=done,
            info={
                "successes": success,
                "finger_dist": finger_dist,
                "lift": lift,
                "contact_forces": s.link_contact_force[jnp.asarray(fsr)],
                # chain handoff snapshot (hand dofs + held-block pose,
                # `..._grasp_sim.py:1399-1402`); T-value training row =
                # (camera-frame block rot, grasp-quality label)
                "terminal_valid": save_valid,
                "terminal_q": s.q,
                "terminal_pos": tgt_pos,
                "terminal_rot": tgt_rot,
                "terminal_type": state.lego_type,
                "tvalue_valid": done,
                "tvalue_input": cam_tgt_rot,
                "tvalue_label": jnp.where(grasp_ok, 1.0, 0.0),
            },
        )
        return state, out

    _default_ctx = init_ctx()

    def reset(key) -> GraspTaskState:  # ctx-unaware binding (tests, players)
        return reset_ctx(key, _default_ctx)

    def step(state: GraspTaskState, action: jnp.ndarray):
        return step_ctx(state, action, _default_ctx)

    env = Env(
        name="BlockAssemblyGraspSim",
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
        """Harvest grasp terminals into a per-type GraspTerminalSampler for
        InsertSim resets (`..._insert_sim.py:372-375`)."""
        from ...seqdex.handoff import GraspTerminalSampler, rollout_collect

        steps = steps or cfg.episode_length + 2
        data = rollout_collect(
            env, params, num_envs, steps, seed=seed,
            keys=("terminal_q", "terminal_pos", "terminal_rot", "terminal_type"),
            ctx=ctx, stochastic=stochastic,
        )
        sampler = sampler or GraspTerminalSampler(
            ndof=D, num_types=len(builders.LEGO_TYPES))
        if len(data["terminal_q"]):
            sampler.insert(
                jnp.asarray(data["terminal_q"]),
                jnp.asarray(data["terminal_pos"]),
                jnp.asarray(data["terminal_rot"]),
                jnp.ones(len(data["terminal_q"]), dtype=bool),
                type_idx=jnp.asarray(data["terminal_type"], dtype=jnp.int32),
            )
        return sampler

    def collect_tvalue_data(params, num_envs=64, steps=None, seed=0, ctx=None,
                           stochastic=False):
        """(succ, fail) camera-frame block rotations labelled by grasp
        quality — the env's HDF5 dump (`..._grasp_sim.py:1404-1440`); trains
        the T-value that gates Orient's success."""
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
