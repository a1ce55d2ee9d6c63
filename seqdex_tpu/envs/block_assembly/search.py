"""BlockAssemblySearch — dig the target block out of the brick heap.

TPU-native re-implementation of
`tasks/block_assembly/allegro_hand_block_assembly_search.py` (1736 LoC):
62-dim x 3 stacked proprioceptive observations (`compute_contact_observations`
`:1220-1245`: hand q, action-q delta, raw finger actions), 188-dim states
with hand-position history and segmentation centroid/count, finger-only
policy control with the object-centric tracking arm (pos_err = target -
hand_base + (-0.18, 0, +0.24), wrist locked, `:1568-1577`), reward =
clamped-negative finger distance - arm-contact penalty - action penalty +
object-up reward with xy-drift penalties, emergence/heap-movement terms at
episode end (`compute_hand_reward` `:1660-1711`).

Heap: 132 bricks of the 8 mixed LEGO types (type = brick index % 8,
`search.py:610,735-742`), settled ONCE at env-build time (host loop over the
same simulator) into a reset pool the jitted reset samples from.

Camera segmentation (pixel count + centroid) comes from the analytic
ray-grid camera (`seqdex_tpu.sim.camera`) on the wrist camera frame instead
of the IsaacGym renderer. Success = per-type emergence pixel threshold
(`search.py:1289-1295`: [20, 20, 15, 20, 20, 30, 30, 20]).

Chain integration:
* temporal T-value observation buffer: 65-dim frames (obs[0:62] with
  [26:30] = camera-frame target rot, plus centroid x/128, y/128, count/100)
  x 10 stacked (`search.py:394-409,1156-1166`) — the RetriGraspTValue(650)
  input.
* per-type terminal capture at episode end gated on the emergence threshold
  (`search.py:1304-1355`); with `tvalue_params` (backward pass) additionally
  gated on RetriGraspTValue confidence (the paper's transition-feasibility
  filtering; the reference evaluates the net at `search.py:1133`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

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
from ...sim.camera import make_segmentation_camera
from ...sim.scene import compile_scene
from ...sim.simulator import SimConfig, make_sim
from ..base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree
from .grasp_sim import control_ik

ONE_FRAME_OBS = 62
ONE_FRAME_STATES = 188
STACK = 3
NUM_ACTIONS = 23
TVALUE_FRAME = 65  # `search.py:394-409`
TVALUE_STACK = 10

_TARGET_EULER = (0.0, 3.14, 1.57)  # `search.py:1571` now_euler_angle

# per-type emergence pixel-count success thresholds at 128x128
# (`search.py:1289`)
_SEG_SUCCESS_THRESHOLD = (20.0, 20.0, 15.0, 20.0, 20.0, 30.0, 30.0, 20.0)


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    episode_length: int = 75
    # domain-randomization engine (base_task.py:229-423 schema): physical
    # scales sampled per reset into the SimState DR fields
    randomize: bool = False
    action_moving_average: float = 1.0
    vel_obs_scale: float = 0.2
    heap_bricks: int = 132  # reference heap size (`search.py:735-742`)
    heap_types: int = 8  # mixed brick types, type = index % 8 (`search.py:610`)
    heap_pool: int = 16  # number of pre-settled heaps in the reset pool
    settle_steps: int = 120
    substeps: int = 2
    solver_iterations: int = 16
    # contact budget: a RESTING 132-brick pile carries ~500 active support
    # contacts (132 bricks x ~4 manifold points + bottom-layer/table rows;
    # measured ~5xx with a K=2048 probe on the settled pool) — the r4 value
    # of 192 globally top-K-starved the pile, leaving most bricks
    # unsupported: the heap free-fell through the table from the first
    # step and Search could never succeed at episode end. PhysX never hits
    # this (per-pair manifolds + an 8M-pair buffer, `utils/config.py:204`).
    max_contacts: int = 768
    # grid narrowphase (one-hot MXU candidate gathers); True by default for
    # the heap scale, False = exact dense selection
    neighbor_list: bool = True
    # pair-selection cadence in control steps during the TRAINING rollout
    # (SimConfig.select_every): heap bricks move ~mm per control step, so
    # the stored top-K pair list (with its separated-near-pair margin)
    # stays valid between re-selects; drift vs every-step selection is
    # pinned by tests/test_select_every.py. 1 = re-select every step.
    select_every: int = 4
    camera_res: int = 64  # reference renders 128x128; the 3 consumed scalars
    # survive downsampling (counts rescaled to 128x128 parity)
    # penalties (`search.py:1679-1696`)
    action_penalty_scale: float = 0.005


class SearchTaskState(NamedTuple):
    sim: object
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs_stack: jnp.ndarray
    state_stack: jnp.ndarray
    prev_targets: jnp.ndarray
    target_brick: jnp.ndarray  # i32 index into heap bodies
    target_init_pos: jnp.ndarray
    last_pixel_count: jnp.ndarray
    hand_pos_history: jnp.ndarray  # (8, 3)
    tvalue_buf: jnp.ndarray  # (10, 65) temporal T-value obs (newest last)
    successes: jnp.ndarray
    actions: jnp.ndarray


def _heap_drop_layout(cfg: SearchConfig, rng):
    """Initial brick drop grid (reference `search.py:735-742`): 4x4 grid per
    layer over the bin footprint, stacked in z."""
    B = cfg.heap_bricks
    per_layer = 16
    pos = np.zeros((B, 3), dtype=np.float32)
    quat = np.zeros((B, 4), dtype=np.float32)
    for i in range(B):
        gx = -0.17 + 0.113 * (i % 4) + 0.25
        gy = -0.11 + 0.075 * ((i // 4) % 4) + 0.19
        gz = 0.63 + 0.06 * (i // per_layer)
        pos[i] = (gx + rng.uniform(-0.02, 0.02),
                  gy + rng.uniform(-0.02, 0.02), gz)
        yaw = 0.785 + rng.uniform(-0.3, 0.3)
        quat[i] = (0, 0, np.sin(yaw / 2), np.cos(yaw / 2))
    return pos, quat


def _settle_heaps(sim, cfg: SearchConfig):
    """Host-side: drop `heap_pool` heaps and settle them. Returns
    (pool, B, 3)/(pool, B, 4) numpy arrays."""
    rng = np.random.RandomState(0)
    pos0 = np.zeros((cfg.heap_pool, cfg.heap_bricks, 3), dtype=np.float32)
    quat0 = np.zeros((cfg.heap_pool, cfg.heap_bricks, 4), dtype=np.float32)
    for h in range(cfg.heap_pool):
        pos0[h], quat0[h] = _heap_drop_layout(cfg, rng)

    # created OUTSIDE the traced settle: init_state's compile-time-evaluated
    # warm-start inverse needs a concrete pose (a constant built inside a
    # jit trace is a Tracer post-omnistaging)
    q0 = jnp.asarray(
        np.concatenate([builders.DEFAULT_ARM_QPOS, np.zeros(16)]),
        dtype=jnp.float32)

    def settle(body_pos, body_quat):
        s = sim.init_state(q0)
        # scenes may carry extra bodies beyond the heap (e.g. the chain-eval
        # socket) — keep their init poses, settle only the heap slots
        nb = s.body_pos.shape[0]
        if nb > body_pos.shape[0]:
            body_pos = jnp.concatenate([body_pos, s.body_pos[body_pos.shape[0]:]])
            body_quat = jnp.concatenate([body_quat, s.body_quat[body_quat.shape[0]:]])
        s = s._replace(
            q=q0, ctrl=q0, body_pos=body_pos, body_quat=body_quat,
        )

        def body(_, s):
            return sim.step(s)

        s = jax.lax.fori_loop(0, cfg.settle_steps, body, s)
        return (s.body_pos[: cfg.heap_bricks], s.body_quat[: cfg.heap_bricks])

    settle_j = jax.jit(jax.vmap(settle))
    pos, quat = settle_j(jnp.asarray(pos0), jnp.asarray(quat0))
    return np.asarray(pos), np.asarray(quat)


def make_search_env(cfg: SearchConfig = SearchConfig(), tvalue_params=None) -> Env:
    art_spec = builders.franka_allegro()
    types = [builders.LEGO_TYPES[i % cfg.heap_types] for i in range(cfg.heap_bricks)]
    bricks = [
        builders.lego_brick(t, name=f"brick{i}") for i, t in enumerate(types)
    ]
    scene = compile_scene(
        art_spec,
        bodies=bricks,
        statics=[builders.table(), builders.ground()] + builders.bin_walls(),
    )
    art = scene.art
    _force_links = tuple(art.link_index(n) for n in builders.FSR_LINKS) + tuple(
        art.link_index(f"panda_link{i}") for i in range(1, 8))
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            max_contacts=cfg.max_contacts,
            force_links=_force_links,
            # heap-scale solver: matrix-free iterations + Cauchy-Schwarz
            # preconditioner (never materializes the (3K,3K) Delassus;
            # measured 24.4 -> 17.0 ms/substep at 128 envs on v5e, settle
            # behavior pinned vs the dense solver by tests/test_segmented_qp)
            contact_precond="cs",
            # PhysX-parity: pair selection once per control step, substeps
            # refresh the stored pairs (tests/test_contact_reuse.py) and
            # warm-start the impulse QP from the previous substep's solution
            reuse_contacts=True,
            warm_iterations=8,
            # grid narrowphase with one-hot MXU candidate gathers: the
            # per-group top-64 colliders cover every collider within reach
            # of a 1-brick point group (verified vs dense on settled heaps
            # by scripts/check_nl_exact.py); ~5.5x fewer SDF pairs
            neighbor_list=cfg.neighbor_list,
            nl_candidates=64,
            nl_group_size=64,
            select_every=cfg.select_every,
        ),
    )
    D = art.ndof
    B = cfg.heap_bricks
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    hand_lower, hand_upper = lower[7:23], upper[7:23]

    hand_base = art.link_index(builders.HAND_BASE_LINK)
    mount = art.link_index("panda_link7")
    camera_link = art.link_index("camera_link")
    palm = art.link_index("palm")
    tips = tuple(art.link_index(n) for n in builders.FINGERTIP_LINKS)
    fsr = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    # penalised contact set = reference sensor_handles [0..6] (`search.py:
    # 919-920`): arm bodies only, NOT the link7 wrist flange — the flange
    # rides at the heap surface during digs, and penalising it taxes digging
    # itself (r4 finding: this extra -1/step drove the policy into the
    # contact-avoidance valley).
    arm_links = tuple(art.link_index(f"panda_link{i}") for i in range(1, 7))

    target_rot_lock = quat_from_euler_xyz(*[jnp.float32(v) for v in _TARGET_EULER])
    # per-brick camera bounding halves (mixed types)
    brick_half = jnp.asarray(
        [
            [builders._LEGO_FOOTPRINT[t][0] * builders.LEGO_UNIT / 2,
             builders._LEGO_FOOTPRINT[t][1] * builders.LEGO_UNIT / 2,
             builders.LEGO_BODY_HALF_H]
            for t in types
        ],
        dtype=jnp.float32,
    )  # (B, 3)
    # per-brick type index + per-type success thresholds (128x128 parity)
    brick_type = jnp.asarray(
        [i % cfg.heap_types for i in range(B)], dtype=jnp.int32)
    seg_threshold = jnp.asarray(
        [_SEG_SUCCESS_THRESHOLD[i % 8] for i in range(cfg.heap_types)],
        dtype=jnp.float32,
    )
    seg_camera = make_segmentation_camera(cfg.camera_res, cfg.camera_res)
    cam_scale = (128 / cfg.camera_res) ** 2  # pixel-count parity with 128x128

    # settled heap pool (host-side, once)
    heap_pos, heap_quat = _settle_heaps(sim, cfg)
    heap_pos = jnp.asarray(heap_pos)
    heap_quat = jnp.asarray(heap_quat)

    default_q = jnp.zeros(D, dtype=jnp.float32)
    default_q = default_q.at[:7].set(jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32))

    # ---- precomputed reset-pose tables (host, once) ----
    # step_ctx builds a `fresh` reset state EVERY step (auto-reset select);
    # at reset the robot is at default_q and the heap is one of the settled
    # pool entries, so the reset FK is a constant and the reset camera render
    # is a pure (heap, target) table — precomputing both removes a full
    # camera pass + FK from every training step (camera measured ~7 ms/step
    # at 128 envs on v5e)
    _fk0 = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)),
        jax.jit(sim.fk)(default_q, jnp.zeros(D, dtype=jnp.float32)))
    _cam0_pos = _fk0.pos[camera_link]
    _cam0_quat = _fk0.quat[camera_link]

    def _pool_seg(h):
        f = lambda t: seg_camera(_cam0_pos, _cam0_quat, t, heap_pos[h],
                                 heap_quat[h], brick_half)
        return jax.vmap(f)(jnp.arange(B))

    _pc, _px, _py = jax.jit(jax.vmap(_pool_seg))(jnp.arange(cfg.heap_pool))
    heap_seg = (jnp.asarray(np.asarray(_pc)), jnp.asarray(np.asarray(_px)),
                jnp.asarray(np.asarray(_py)))  # each (pool, B)

    def _tip_pos(fk_res):
        idx = jnp.asarray(tips)
        p = fk_res.pos[idx, :]
        q = fk_res.quat[idx, :]
        off = quat_apply(q, jnp.tile(jnp.asarray([0.0, 0.0, 0.04], dtype=jnp.float32), (4, 1)))
        return p + off

    def _seg_stats(fk_res, s, target):
        cam_pos = fk_res.pos[camera_link]
        cam_quat = fk_res.quat[camera_link]
        return seg_camera(cam_pos, cam_quat, target, s.body_pos, s.body_quat,
                          brick_half)

    def _cam_target_rot(fk_res, s, target):
        """Camera-frame target rotation (`search.py:1183-1190`)."""
        qc_inv, pc_inv = tf_inverse(
            fk_res.quat[camera_link], fk_res.pos[camera_link])
        rot, _ = tf_combine(qc_inv, pc_inv, s.body_quat[target], s.body_pos[target])
        return rot

    def _reset_sim(key):
        k1, k2, kdr = jax.random.split(key, 3)
        s = sim.init_state(default_q)
        if cfg.randomize:
            from ...envs.randomization import randomize_sim_state

            s = randomize_sim_state(s, kdr, D)
        h = jax.random.randint(k1, (), 0, cfg.heap_pool)
        target = jax.random.randint(k2, (), 0, B)
        s = s._replace(
            q=default_q,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=default_q,
            body_pos=heap_pos[h],
            body_quat=heap_quat[h],
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        return s, target, h

    def _observe(state: SearchTaskState, fk_res, seg=None):
        s = state.sim
        q = s.q
        hand_q = unscale_from_limits(q[7:23], hand_lower, hand_upper)
        obs = jnp.zeros(ONE_FRAME_OBS, dtype=jnp.float32)
        obs = obs.at[0:16].set(hand_q)
        obs = obs.at[30:46].set(state.actions[7:23] - hand_q)
        obs = obs.at[46:62].set(state.actions[7:23])

        tgt_pos = s.body_pos[state.target_brick]
        tgt_rot = s.body_quat[state.target_brick]
        hb_pos = fk_res.pos[hand_base]
        hb_rot = fk_res.quat[hand_base]
        tp = _tip_pos(fk_res)
        if seg is None:
            count, cx, cy = _seg_stats(fk_res, s, state.target_brick)
        else:
            count, cx, cy = seg
        count = count * cam_scale
        cam_rot = _cam_target_rot(fk_res, s, state.target_brick)

        st = jnp.zeros(ONE_FRAME_STATES, dtype=jnp.float32)
        st = st.at[0:23].set(unscale_from_limits(q, lower, upper))
        st = st.at[23:46].set(cfg.vel_obs_scale * s.qd)
        st = st.at[46:49].set(tp[0])
        st = st.at[49:52].set(tp[2])
        st = st.at[52:55].set(tp[1])
        st = st.at[55:58].set(tp[3])
        st = st.at[58:81].set(state.actions)
        st = st.at[81:84].set(hb_pos)
        st = st.at[84:88].set(hb_rot)
        st = st.at[88:91].set(tgt_pos)
        st = st.at[91:95].set(tgt_rot)
        st = st.at[96:120].set(state.hand_pos_history.reshape(-1))
        st = st.at[120:121].set(cx[None] / 128.0)
        st = st.at[121:122].set(cy[None] / 128.0)
        st = st.at[122:123].set(count[None] / 100.0)
        st = st.at[123:126].set(fk_res.linvel[hand_base])
        st = st.at[126:129].set(fk_res.angvel[hand_base])
        st = st.at[129:141].set(
            jnp.where(s.link_contact_force[jnp.asarray(fsr)] >= 0.1, 1.0, 0.0)
        )
        st = st.at[141:144].set(tgt_pos - state.target_init_pos)

        # temporal T-value frame (`search.py:1156-1166`): obs[0:62] with
        # [26:30] = camera-frame target rot, then centroid/count scalars
        tv_frame = jnp.zeros(TVALUE_FRAME, dtype=jnp.float32)
        tv_frame = tv_frame.at[0:62].set(obs)
        tv_frame = tv_frame.at[26:30].set(cam_rot)
        tv_frame = tv_frame.at[62].set(cx / 128.0)
        tv_frame = tv_frame.at[63].set(cy / 128.0)
        tv_frame = tv_frame.at[64].set(count / 100.0)
        return obs, st, count, tv_frame

    from ...seqdex import tvalue as tvlib

    def init_ctx():
        """Runtime shared context: the 650-dim RetriGraspTValue params
        (Search has no upstream reservoir — it is the chain's first stage)."""
        tv = (tvalue_params if tvalue_params is not None
              else tvlib.init_tvalue(
                  jax.random.PRNGKey(0), tvlib.RETRI_GRASP_IN,
                  tvlib.RETRI_GRASP_HIDDEN))
        return {"tvalue": tv,
                "tvalue_on": jnp.float32(0.0 if tvalue_params is None else 1.0)}

    def reset_ctx(key, ctx) -> SearchTaskState:
        k0, k1 = jax.random.split(key)
        s, target, h = _reset_sim(k0)
        state = SearchTaskState(
            sim=s,
            key=k1,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            state_stack=jnp.zeros((STACK, ONE_FRAME_STATES), dtype=jnp.float32),
            prev_targets=default_q,
            target_brick=target,
            target_init_pos=s.body_pos[target],
            last_pixel_count=jnp.float32(0.0),
            hand_pos_history=jnp.zeros((8, 3), dtype=jnp.float32),
            tvalue_buf=jnp.zeros((TVALUE_STACK, TVALUE_FRAME), dtype=jnp.float32),
            successes=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
        )
        # reset pose is static: constant FK + precomputed (heap, target)
        # camera table instead of a per-step render (see heap_seg above)
        seg = (heap_seg[0][h, target], heap_seg[1][h, target],
               heap_seg[2][h, target])
        obs, st, count, tv_frame = _observe(state, _fk0, seg=seg)
        return state._replace(
            obs_stack=push_frame(state.obs_stack, obs),
            state_stack=push_frame(state.state_stack, st),
            last_pixel_count=count,
            tvalue_buf=jnp.concatenate(
                [state.tvalue_buf[1:], tv_frame[None]], axis=0),
        )

    def step_ctx(state: SearchTaskState, action: jnp.ndarray, ctx):
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
        tgt_pos = s.body_pos[state.target_brick]
        pos_err = tgt_pos - fk_res.pos[hand_base]
        pos_err = pos_err + jnp.asarray([-0.18, 0.0, 0.24], dtype=jnp.float32)
        rot_err = orientation_error(target_rot_lock, fk_res.quat[hand_base])
        dpose = jnp.concatenate([pos_err, rot_err])
        J = sim.site_jacobian(fk_res, hand_base)[:, :7]
        delta = control_ik(J, dpose)
        arm_targets = s.q[:7] + delta

        targets = jnp.clip(jnp.concatenate([arm_targets, fingers]), lower, upper)
        s = s._replace(ctrl=targets)
        # `tick` (the rollout scan index, uniform across envs) drives the
        # select_every pair-persistence cadence; callers without a tick
        # (harvest/eval collectors) re-select every step
        s = sim.step(s, fk0=fk_res, tick=ctx.get("tick"))
        prog = state.progress + 1

        fk2 = sim.fk(s.q, s.qd)
        hand_hist = jnp.concatenate(
            [fk2.pos[hand_base][None], state.hand_pos_history[:-1]], axis=0
        )
        state = state._replace(
            sim=s, progress=prog, prev_targets=targets, actions=action,
            hand_pos_history=hand_hist,
        )
        obs, st, count, tv_frame = _observe(state, fk2)
        obs_stack = push_frame(state.obs_stack, obs)
        state_stack = push_frame(state.state_stack, st)
        tvalue_buf = jnp.concatenate(
            [state.tvalue_buf[1:], tv_frame[None]], axis=0)

        # reward (`compute_hand_reward` `search.py:1660-1711`)
        tp = _tip_pos(fk2)
        tgt_pos = s.body_pos[state.target_brick]
        finger_dist = (
            jnp.linalg.norm(tgt_pos - tp[0])
            + jnp.linalg.norm(tgt_pos - tp[1])
            + jnp.linalg.norm(tgt_pos - tp[2])
            + jnp.linalg.norm(tgt_pos - tp[3])
        )
        dist_rew = jnp.clip(-0.2 * finger_dist, None, -0.06)
        action_penalty = jnp.sum(action**2) * cfg.action_penalty_scale
        arm_contact_pen = jnp.sum(
            jnp.where(s.link_contact_force[jnp.asarray(arm_links)] >= 0.1, 1.0, 0.0)
        )
        lift = tgt_pos - state.target_init_pos
        up_rew = (
            jnp.clip(lift[2], 0.0, 0.1) * 1000.0
            - jnp.clip(lift[0], 0.0, 0.1) * 1000.0
            - jnp.clip(lift[1], 0.0, 0.1) * 1000.0
        )
        emergence_reward = (count - state.last_pixel_count) * 5.0
        reward = dist_rew - arm_contact_pen - action_penalty + up_rew

        timed_out = prog >= cfg.episode_length - 1
        done = timed_out
        # success = per-type emergence pixel threshold (`search.py:1289-1295`)
        tgt_type = brick_type[state.target_brick]
        success = jnp.where(count > seg_threshold[tgt_type], 1.0, 0.0)

        # per-type terminal capture (`search.py:1304-1355`): backward pass
        # additionally filters by RetriGraspTValue confidence
        save_valid = done & (success > 0.0)
        conf = tvlib.tvalue_confidence(ctx["tvalue"], tvalue_buf.reshape(-1))
        save_valid = save_valid & jnp.where(
            ctx["tvalue_on"] > 0.5, conf > 0.6, True)

        state = state._replace(
            obs_stack=obs_stack,
            state_stack=state_stack,
            reset_flag=done,
            last_pixel_count=count,
            tvalue_buf=tvalue_buf,
            successes=success,
        )
        out = StepOutput(
            obs=clip_obs(obs_stack.reshape(-1)),
            states=clip_obs(state_stack.reshape(-1)),
            reward=reward,
            done=done,
            info={
                "successes": success,
                "emergence_reward": emergence_reward,
                "pixel_count": count,
                "lift_z": lift[2],
                "terminal_valid": save_valid,
                "terminal_pos": tgt_pos,
                "terminal_rot": s.body_quat[state.target_brick],
                "terminal_q": s.q,
                "terminal_type": tgt_type,
                "tvalue_valid": done,
                "tvalue_input": tvalue_buf.reshape(-1),
                "tvalue_label": success,
            },
        )
        return state, out

    _default_ctx = init_ctx()

    def reset(key) -> SearchTaskState:  # ctx-unaware binding
        return reset_ctx(key, _default_ctx)

    def step(state: SearchTaskState, action: jnp.ndarray):
        return step_ctx(state, action, _default_ctx)

    env = Env(
        name="BlockAssemblySearch",
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
        """Per-type dug-out block poses -> BlockPoseSampler feeding Orient
        resets (`search.py:1304-1355`, read at `orient.py:419-420`)."""
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
        """(succ, fail) 650-dim temporal buffers labelled by emergence — the
        RetriGraspTValue offline dataset (`search.py:1315-1345`)."""
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
