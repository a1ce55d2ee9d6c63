"""ToolPositioning task family — grasp a tool, orient it in-hand, chain both.

TPU-native re-implementation of `tasks/tool_positioning/` (grasp 1919 LoC,
orient 1652, chain 2043):
* `ToolPositioningGrasp` — 156-dim x 3 obs (`..._grasp.py:1339-1364` layout),
  23 actions, reward = -0.1*finger_dist + z-align-gated lift with xy
  move-out penalties (`compute_hand_reward` `:1741-1801`).
* `ToolPositioningOrient` — orient the grasped tool to the goal pose; reward
  keys on z-axis alignment with the goal.
* `ToolPositioningChain` — grasp phase then orient phase in one episode,
  with physics perturbations (impulse / sine-wave force generators,
  `..._chain.py:101-129` ImpulseFunc/SinWaveFunc) — robustness training.

The hammer is a box-compound (handle + head) instead of the reference mesh
(`assets/urdf/grasp_and_orient/`).
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
    unscale_from_limits,
)
from ...core.model import GEOM_BOX, BodySpec, GeomSpec
from ...sim.scene import compile_scene
from ...sim.simulator import SimConfig, make_sim
from ..base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree
from ..block_assembly.grasp_sim import control_ik

ONE_FRAME_OBS = 156
ONE_FRAME_STATES = 188
STACK = 3
NUM_ACTIONS = 23

_TARGET_EULER = (0.0, 3.1415, 1.571)


def hammer(name: str = "tool") -> BodySpec:
    """Box-compound hammer: 24 cm handle + head bar (reference mesh
    `assets/urdf/grasp_and_orient/`, tool_positioning tasks)."""
    handle_half = (0.012, 0.012, 0.12)
    head_half = (0.045, 0.017, 0.017)
    rho = 700.0  # wood-ish handle
    m_handle = rho * 8 * handle_half[0] * handle_half[1] * handle_half[2]
    m_head = 2500.0 * 8 * head_half[0] * head_half[1] * head_half[2]
    m = m_handle + m_head
    # head sits at the +z end of the handle
    head_z = handle_half[2] + head_half[2]
    com_z = (m_head * head_z) / m
    # rough inertia: rod + point head
    ixx = m_handle * (2 * handle_half[2]) ** 2 / 12 + m_head * (head_z - com_z) ** 2
    return BodySpec(
        name=name,
        mass=m,
        com=(0, 0, com_z),
        inertia=(ixx, ixx, m * 0.0005, 0, 0, 0),
        geoms=[
            GeomSpec(GEOM_BOX, handle_half, pos=(0, 0, 0), friction=1.0, point_detail=1),
            GeomSpec(GEOM_BOX, head_half, pos=(0, 0, head_z), friction=0.9,
                     point_detail=1),
        ],
    )


@dataclasses.dataclass(frozen=True)
class ToolConfig:
    task: str = "grasp"  # "grasp" | "orient" | "chain"
    episode_length: int = 150  # grasp 150, orient 125, chain 120 (cfg yamls)
    action_moving_average: float = 1.0
    vel_obs_scale: float = 0.2
    substeps: int = 2
    solver_iterations: int = 16
    max_contacts: int = 48
    # perturbations (chain: `..._chain.py:101-129`)
    perturb: bool = False
    impulse_scale: float = 0.5
    sine_scale: float = 0.2
    sine_freq: float = 0.5
    grasp_phase_end: int = 60  # chain: grasp window before orient phase
    # domain-randomization engine (base_task.py:229-423 schema): physical
    # scales sampled per reset into the SimState DR fields
    randomize: bool = False
    # ContactSLAMer belief state in the env loop (`..._chain.py:1441-1454`):
    # when enabled, the OBS tool pose slots carry the tactile-MLP pose
    # estimate instead of the privileged sim pose; the true pose stays in the
    # critic states and in info for the online slamer update
    use_contact_slamer: bool = False


class ToolTaskState(NamedTuple):
    sim: object
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs_stack: jnp.ndarray
    state_stack: jnp.ndarray
    prev_targets: jnp.ndarray
    target_init_pos: jnp.ndarray
    target_init_rot: jnp.ndarray
    goal_pos: jnp.ndarray
    goal_rot: jnp.ndarray
    perturb_dir: jnp.ndarray  # (6,)
    successes: jnp.ndarray
    actions: jnp.ndarray


def make_tool_env(cfg: ToolConfig = ToolConfig(), slamer_params=None) -> Env:
    art_spec = builders.franka_allegro()
    tool = hammer()
    scene = compile_scene(
        art_spec, bodies=[tool], statics=[builders.table(), builders.ground()]
    )
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
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    hand_lower, hand_upper = lower[7:23], upper[7:23]
    hand_base = art.link_index(builders.HAND_BASE_LINK)
    tips = tuple(art.link_index(n) for n in builders.FINGERTIP_LINKS)
    fsr = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    tool_body = scene.body_index("tool")
    target_rot_lock = quat_from_euler_xyz(*[jnp.float32(v) for v in _TARGET_EULER])

    default_q = jnp.zeros(D, dtype=jnp.float32)
    default_q = default_q.at[:7].set(jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32))

    def _tip_state(fk_res):
        idx = jnp.asarray(tips)
        p = fk_res.pos[idx, :]
        q = fk_res.quat[idx, :]
        off = quat_apply(q, jnp.tile(jnp.asarray([0.0, 0.0, 0.04], dtype=jnp.float32), (4, 1)))
        tp = p + off
        return tp, jnp.concatenate(
            [tp, q, fk_res.linvel[idx, :], fk_res.angvel[idx, :]], axis=-1
        )

    def _reset_sim(key):
        key, kdr = jax.random.split(key)
        k1, k2, k3 = jax.random.split(key, 3)
        s = sim.init_state(default_q)
        if cfg.randomize:
            from ..randomization import randomize_sim_state

            s = randomize_sim_state(s, kdr, D)
        # tool lying on the table near the work area
        xy = jnp.asarray([0.22, 0.1], dtype=jnp.float32) + 0.03 * (
            jax.random.uniform(k1, (2,)) * 2 - 1
        )
        yaw = jnp.pi * (jax.random.uniform(k2, ()) * 2 - 1)
        # lying flat: handle along the table
        lie = quat_from_euler_xyz(jnp.float32(0.0), jnp.float32(jnp.pi / 2), jnp.float32(0.0))
        bq = quat_mul(quat_from_angle_axis(yaw, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)), lie)
        bp = jnp.concatenate([xy, jnp.asarray([0.615], dtype=jnp.float32)])
        # goal: tool upright above initial pose
        goal_pos = bp + jnp.asarray([0.0, 0.0, 0.25], dtype=jnp.float32)
        goal_rot = quat_from_angle_axis(
            jnp.pi * (jax.random.uniform(k3, ()) * 2 - 1),
            jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32),
        )
        s = s._replace(
            q=default_q,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=default_q,
            body_pos=s.body_pos.at[tool_body].set(bp),
            body_quat=s.body_quat.at[tool_body].set(bq),
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        return s, bp, bq, goal_pos, goal_rot

    def _observe(state: ToolTaskState, fk_res):
        """156-dim frame (`..._grasp.py:1339-1364`)."""
        s = state.sim
        q, qd = s.q, s.qd
        hb_pos = fk_res.pos[hand_base]
        hb_rot = fk_res.quat[hand_base]
        tgt_pos = s.body_pos[tool_body]
        tgt_rot = s.body_quat[tool_body]
        tp, tip13 = _tip_state(fk_res)

        # ContactSLAMer belief state (`..._chain.py:1441-1454`): tactile
        # contacts + hand q -> estimated tool pose replaces the privileged
        # pose in the POLICY observation
        contacts12 = jnp.where(
            s.link_contact_force[jnp.asarray(fsr)] >= 0.1, 1.0, 0.0)
        hand_q16 = unscale_from_limits(q[7:23], hand_lower, hand_upper)
        slamer_in = jnp.concatenate([contacts12, hand_q16])
        if cfg.use_contact_slamer and slamer_params is not None:
            from ...rl import networks as _nets

            pred = _nets.mlp_apply(slamer_params, slamer_in)
            pred_pos = pred[0:3]
            pq = pred[3:7]
            pred_rot = pq / jnp.maximum(jnp.linalg.norm(pq), 1e-8)
            obs_tool_pos, obs_tool_rot = pred_pos, pred_rot
        else:
            obs_tool_pos, obs_tool_rot = tgt_pos, tgt_rot

        obs = jnp.zeros(ONE_FRAME_OBS, dtype=jnp.float32)
        obs = obs.at[0:23].set(unscale_from_limits(q, lower, upper))
        obs = obs.at[23:46].set(state.actions)
        obs = obs.at[46:53].set(jnp.concatenate([hb_pos, hb_rot]))
        obs = obs.at[53:56].set(obs_tool_pos)
        obs = obs.at[56:60].set(obs_tool_rot)
        obs = obs.at[60:61].set(
            (state.progress.astype(jnp.float32) / cfg.episode_length)[None]
        )
        obs = obs.at[61:64].set(state.goal_pos)
        obs = obs.at[64:68].set(state.goal_rot)
        obs = obs.at[68:71].set(tgt_pos - state.goal_pos)
        obs = obs.at[71:75].set(quat_mul(tgt_rot, quat_conjugate(state.goal_rot)))
        obs = obs.at[75:88].set(tip13[0])
        obs = obs.at[88:101].set(tip13[2])
        obs = obs.at[101:114].set(tip13[1])
        obs = obs.at[114:127].set(tip13[3])
        obs = obs.at[127:150].set(cfg.vel_obs_scale * qd)
        obs = obs.at[150:153].set(s.body_linvel[tool_body])
        obs = obs.at[153:156].set(s.body_angvel[tool_body])

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
        st = st.at[101:104].set(state.goal_pos)
        st = st.at[104:108].set(state.goal_rot)
        st = st.at[108:120].set(
            jnp.where(s.link_contact_force[jnp.asarray(fsr)] >= 0.1, 1.0, 0.0)
        )
        st = st.at[120:123].set(tgt_pos - state.target_init_pos)
        return obs, st, slamer_in

    def reset(key) -> ToolTaskState:
        k0, k1, k2 = jax.random.split(key, 3)
        s, bp, bq, gp, gr = _reset_sim(k0)
        state = ToolTaskState(
            sim=s,
            key=k1,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            state_stack=jnp.zeros((STACK, ONE_FRAME_STATES), dtype=jnp.float32),
            prev_targets=default_q,
            target_init_pos=bp,
            target_init_rot=bq,
            goal_pos=gp,
            goal_rot=gr,
            perturb_dir=jax.random.uniform(k2, (6,)) * 2 - 1,
            successes=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
        )
        fk_res = sim.fk(s.q, s.qd)
        obs, st, _ = _observe(state, fk_res)
        return state._replace(
            obs_stack=push_frame(state.obs_stack, obs),
            state_stack=push_frame(state.state_stack, st),
        )

    def step(state: ToolTaskState, action: jnp.ndarray):
        fresh = reset(state.key)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        s = state.sim
        fk_res = sim.fk(s.q, s.qd)
        prog = state.progress

        fingers = scale_to_limits(action[7:23], hand_lower, hand_upper)
        fingers = (
            cfg.action_moving_average * fingers
            + (1.0 - cfg.action_moving_average) * state.prev_targets[7:23]
        )
        pos_err = action[0:3] * 0.64
        rot_err = action[3:6] * 0.2 + orientation_error(
            target_rot_lock, fk_res.quat[hand_base]
        ) * 0.5
        dpose = jnp.concatenate([pos_err, rot_err])
        J = sim.site_jacobian(fk_res, hand_base)[:, :7]
        delta = control_ik(J, dpose)
        targets = jnp.clip(
            jnp.concatenate([s.q[:7] + delta, fingers]), lower, upper
        )
        s = s._replace(ctrl=targets)

        # perturbations (chain robustness: impulse + sine force on the tool,
        # `..._chain.py:101-129`) — injected as velocity kicks
        if cfg.perturb:
            key, kp = jax.random.split(state.key)
            t = prog.astype(jnp.float32)
            impulse = jnp.where(
                jnp.mod(prog, 37) == 0,
                cfg.impulse_scale * state.perturb_dir[0:3],
                jnp.zeros(3),
            )
            sine = cfg.sine_scale * jnp.sin(t * cfg.sine_freq) * state.perturb_dir[3:6]
            dv = impulse + sine * sim.config.dt
            s = s._replace(body_linvel=s.body_linvel.at[tool_body].add(dv))
            state = state._replace(key=key)

        s = sim.step(s, fk0=fk_res)
        prog = prog + 1
        state = state._replace(sim=s, progress=prog, prev_targets=targets, actions=action)

        fk2 = sim.fk(s.q, s.qd)
        obs, st, slamer_in = _observe(state, fk2)
        obs_stack = push_frame(state.obs_stack, obs)
        state_stack = push_frame(state.state_stack, st)

        # reward (`..._grasp.py:1741-1801` family)
        tp, _ = _tip_state(fk2)
        tgt_pos = s.body_pos[tool_body]
        tgt_rot = s.body_quat[tool_body]
        finger_dist = (
            jnp.linalg.norm(tgt_pos - tp[0])
            + jnp.linalg.norm(tgt_pos - tp[1])
            + jnp.linalg.norm(tgt_pos - tp[2])
            + 3.0 * jnp.linalg.norm(tgt_pos - tp[3])
        )
        dist_rew = -finger_dist * 0.1
        z_axis = quat_apply(tgt_rot, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
        z_align = jnp.sign(z_axis[2]) * z_axis[2] ** 2
        lift = tgt_pos[2] - state.target_init_pos[2]
        up_rew = jnp.clip(lift, 0.0, 0.05) * 100.0
        up_rew = jnp.clip(
            jnp.where(finger_dist < 0.4, up_rew * z_align, 0.0), None, 20.0
        )
        move_out = (
            (jnp.abs(tgt_pos[0] - state.target_init_pos[0]) >= 0.05)
            | (jnp.abs(tgt_pos[1] - state.target_init_pos[1]) >= 0.05)
        ).astype(jnp.float32)
        action_penalty = jnp.sum(action**2) * 0.01

        if cfg.task == "grasp":
            reward = dist_rew + up_rew - move_out - action_penalty
            success = jnp.where((lift > 0.03) & (finger_dist < 0.4), 1.0, 0.0)
            slipped = (prog >= 150) & (z_align <= 0.75)
        else:
            # orient/chain: goal-pose alignment of the grasped tool
            goal_axis = quat_apply(state.goal_rot, jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32))
            align = jnp.sum(z_axis * goal_axis)
            align_rew = jnp.exp(-2.0 * (1.0 - jnp.clip(align, -1.0, 1.0)))
            hold = jnp.exp(-2.0 * jnp.clip(finger_dist - 0.4, 0.0, None))
            reward = align_rew * hold - action_penalty
            success = jnp.where((align > 0.9) & (finger_dist < 0.5), 1.0, 0.0)
            slipped = jnp.bool_(False)

        timed_out = prog >= cfg.episode_length - 1
        done = timed_out | slipped

        state = state._replace(
            obs_stack=obs_stack,
            state_stack=state_stack,
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
                "finger_dist": finger_dist,
                "z_align": z_align,
                "contact_forces": s.link_contact_force[jnp.asarray(fsr)],
                # online ContactSLAMer training pair (`update_contact_slamer`,
                # `..._chain.py:1447-1454`): tactile input + true pose label
                "slamer_input": slamer_in,
                "slamer_target": jnp.concatenate([tgt_pos, tgt_rot]),
            },
        )
        return state, out

    names = {
        "grasp": "ToolPositioningGrasp",
        "orient": "ToolPositioningOrient",
        "chain": "ToolPositioningChain",
    }
    return Env(
        name=names[cfg.task],
        num_obs=ONE_FRAME_OBS * STACK,
        num_states=ONE_FRAME_STATES * STACK,
        num_actions=NUM_ACTIONS,
        episode_length=cfg.episode_length,
        reset=reset,
        step=step,
        sim=sim,
    )


def make_tool_grasp_env(reservoir=None, tvalue_params=None, **kw):
    return make_tool_env(ToolConfig(task="grasp", episode_length=150, **kw))


def make_tool_orient_env(reservoir=None, tvalue_params=None, **kw):
    return make_tool_env(ToolConfig(task="orient", episode_length=125, **kw))


def make_tool_chain_env(slamer_params=None, **kw):
    """Ours-full chained env: perturbations + ContactSLAMer belief state in
    the policy obs (`..._chain.py:1441-1454`). Pass `slamer_params` (a
    `utils.controllers.ContactSlamer().params` pytree) to activate the
    belief-state observation protocol."""
    if slamer_params is None:
        from ...utils.controllers import ContactSlamer

        slamer_params = ContactSlamer().params
    return make_tool_env(
        ToolConfig(task="chain", episode_length=120, perturb=True,
                   use_contact_slamer=True, **kw),
        slamer_params=slamer_params,
    )


def make_tool_chain_pure_rl_env(**kw):
    """PureRL baseline: one monolithic policy over the full chained horizon,
    privileged obs, no belief state and no phase handoff
    (`allegro_hand_tool_positioning_chain_pure_rl.py`)."""
    return make_tool_env(
        ToolConfig(task="chain", episode_length=120, perturb=True, **kw))
