"""Standalone in-hand multi-object axis-rotation env (MOAR).

TPU-native analog of the reference's `utils/morb.py` `AllegroArmMOAR`
(`morb.py:50`, 1851 LoC — an IsaacGymEnvs-style VecTask for multi-object
in-hand SPIN-AXIS rotation, not imported by the main pipeline but shipped as
a standalone research env). This is NOT classic goal-quaternion
reorientation: the live reward ('new' reward mode, `morb.py:1618-1726`) is

    spin_coef * spinned_theta + vel_coef*||linvel|| + contact_coef*contacts
    + torque/work/action/control penalties

where `spinned_theta` is the per-step rotation angle about the commanded
spin axis, measured by rotating a basis vector normal to the axis from the
previous to the current object orientation and projecting into the normal
plane (`morb.py:812-853`); the goal-orientation reward, reach_goal_bonus,
and rot_dist success counting are disabled in the reference. Termination:
object drifts from the hold point (`goal_dist >= fall_dist`), the spin axis
itself drifts > 0.4*pi from its initial object-frame direction, or timeout
(`morb.py:1698-1716`).

Multi-object = one compiled scene per object kind, composed with
`adapters.multi_task_env` (static per-index task assignment), instead of the
reference's per-env asset lists.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..core import builders
from ..core.math import (
    quat_apply,
    quat_conjugate,
    quat_mul,
    scale_to_limits,
    unscale_from_limits,
)
from ..sim.scene import compile_scene
from ..sim.simulator import SimConfig, make_sim
from .base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree

# 16 q + 16 qd + 13 obj + 3 spin axis + 16 act + 16 tgt + 1 theta + 4 pad
ONE_FRAME_OBS = 85
STACK = 3
NUM_ACTIONS = 16


@dataclasses.dataclass(frozen=True)
class ReorientConfig:
    object_kind: str = "1x2"
    episode_length: int = 300
    fall_dist: float = 0.24
    fall_penalty: float = -50.0
    # reward coefficients — reference defaults (`morb.py:124-130,59-62`)
    spin_coef: float = 1.0
    vel_coef: float = -0.3
    contact_coef: float = 1.0
    torque_coef: float = -0.01
    work_coef: float = -0.0002
    action_penalty_scale: float = -0.001
    control_penalty_scale: float = -0.01
    axis_drift_limit: float = 0.4 * 3.1415926  # `morb.py:1707`
    # spin axis choices (`morb.py:412-434`: x/y/z family; 'free' samples any)
    spin_axes: tuple = ((1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 0.0, 1.0))
    action_moving_average: float = 0.3
    vel_obs_scale: float = 0.2
    substeps: int = 2
    solver_iterations: int = 8
    max_contacts: int = 48


class ReorientState(NamedTuple):
    sim: object
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs_stack: jnp.ndarray
    prev_targets: jnp.ndarray
    spin_axis: jnp.ndarray  # (3,) world-frame commanded spin axis
    init_rot: jnp.ndarray  # (4,) object rot at reset (axis-drift reference)
    last_rot: jnp.ndarray  # (4,) object rot at previous step
    hold_pos: jnp.ndarray  # where the object was placed (fall detection)
    spinned_total: jnp.ndarray  # accumulated spin angle (metrics)
    actions: jnp.ndarray


def _quat_rotmat(q):
    """xyzw quaternion -> 3x3 rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def spin_theta(spin_axis, last_rot, cur_rot):
    """Per-step spin angle about `spin_axis` and out-of-plane deviation
    (`morb.py:812-853`): rotate a normal basis vector v1 by the relative
    rotation R(cur) R(last)^T, project into the (v1, v2) plane."""
    v1 = jnp.cross(spin_axis, spin_axis + 1.0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1), 1e-9)
    v2 = jnp.cross(spin_axis, v1)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2), 1e-9)
    rel = _quat_rotmat(cur_rot) @ _quat_rotmat(last_rot).T
    v1n = rel @ v1
    c1 = jnp.dot(v1n, v1)
    c2 = jnp.dot(v1n, v2)
    c3 = jnp.dot(v1n, spin_axis)
    dev = jnp.abs(jnp.pi / 2 - jnp.arccos(jnp.clip(c3, -1.0, 1.0)))
    rv = jnp.stack([c1, c2])
    rv = rv / jnp.maximum(jnp.linalg.norm(rv), 1e-9)
    theta = jnp.sign(rv[1]) * jnp.arccos(jnp.clip(rv[0], -1.0, 1.0))
    return theta, dev


def axis_drift(spin_axis, init_rot, cur_rot):
    """Angle between the spin axis now vs at reset, in the object's frame
    (`morb.py:1638-1643`)."""
    cur = _quat_rotmat(cur_rot) @ (_quat_rotmat(init_rot).T @ spin_axis)
    return jnp.arccos(jnp.clip(jnp.dot(spin_axis, cur), -1.0, 1.0))


def make_reorientation_env(cfg: ReorientConfig = ReorientConfig()) -> Env:
    art_spec = builders.franka_allegro()
    obj = builders.lego_brick(cfg.object_kind, name="object")
    scene = compile_scene(
        art_spec, bodies=[obj], statics=[builders.table(), builders.ground()]
    )
    art = scene.art
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            max_contacts=cfg.max_contacts,
        ),
    )
    D = art.ndof
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    hand_lower, hand_upper = lower[7:23], upper[7:23]
    hand_base = art.link_index(builders.HAND_BASE_LINK)
    fsr = tuple(art.link_index(n) for n in builders.FSR_LINKS)
    obj_body = scene.body_index("object")
    axes = jnp.asarray(cfg.spin_axes, dtype=jnp.float32)

    # PD drive table for the torque/work penalties (the reference reads
    # measured DOF forces; here torque = the commanded implicit-PD spring
    # torque, the same quantity the drive applies)
    from ..sim.simulator import default_drive_params

    kp = jnp.asarray(default_drive_params(D)[0], dtype=jnp.float32)
    effort = jnp.asarray(default_drive_params(D)[2], dtype=jnp.float32)

    default_q = jnp.zeros(D, dtype=jnp.float32)
    default_q = default_q.at[:7].set(
        jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32)
    )
    # fingers half-open for a palm cradle
    default_q = default_q.at[7:23].set(0.5 * (hand_lower + hand_upper))

    def _hold_pos():
        fk0 = sim.fk(default_q, jnp.zeros(D, dtype=jnp.float32))
        return fk0.pos[hand_base] + jnp.asarray([0.0, 0.0, 0.06], dtype=jnp.float32)

    def _random_quat(key):
        u1, u2, u3 = jax.random.uniform(key, (3,))
        a, b = jnp.sqrt(1 - u1), jnp.sqrt(u1)
        return jnp.stack(
            [
                a * jnp.sin(2 * jnp.pi * u2),
                a * jnp.cos(2 * jnp.pi * u2),
                b * jnp.sin(2 * jnp.pi * u3),
                b * jnp.cos(2 * jnp.pi * u3),
            ]
        )

    def reset(key) -> ReorientState:
        k0, k1, k2 = jax.random.split(key, 3)
        s = sim.init_state(default_q)
        hold = _hold_pos()
        rot0 = _random_quat(k0)
        s = s._replace(
            q=default_q,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=default_q,
            body_pos=s.body_pos.at[obj_body].set(hold),
            body_quat=s.body_quat.at[obj_body].set(rot0),
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        # spin axis per episode (`morb.py:1266-1272`)
        axis = axes[jax.random.randint(k1, (), 0, axes.shape[0])]
        state = ReorientState(
            sim=s,
            key=k2,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            prev_targets=default_q,
            spin_axis=axis,
            init_rot=rot0,
            last_rot=rot0,
            hold_pos=hold,
            spinned_total=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
        )
        return state._replace(obs_stack=push_frame(state.obs_stack, _observe(state)))

    def _observe(state: ReorientState):
        s = state.sim
        obj13 = jnp.concatenate(
            [
                s.body_pos[obj_body],
                s.body_quat[obj_body],
                s.body_linvel[obj_body],
                cfg.vel_obs_scale * s.body_angvel[obj_body],
            ]
        )
        frame = jnp.concatenate(
            [
                unscale_from_limits(s.q[7:23], hand_lower, hand_upper),
                cfg.vel_obs_scale * s.qd[7:23],
                obj13,
                state.spin_axis,  # the commanded axis IS the goal signal
                # (`morb.py:1054`: obs carries spin_axis, not a goal quat)
                state.actions,
                unscale_from_limits(state.prev_targets[7:23], hand_lower, hand_upper),
                state.spinned_total[None],
                jnp.zeros(4, dtype=jnp.float32),
            ]
        )
        return frame

    def step(state: ReorientState, action: jnp.ndarray):
        fresh = reset(state.key)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        fingers = scale_to_limits(action, hand_lower, hand_upper)
        fingers = (
            cfg.action_moving_average * fingers
            + (1.0 - cfg.action_moving_average) * state.prev_targets[7:23]
        )
        targets = state.prev_targets.at[7:23].set(fingers)
        targets = jnp.clip(targets, lower, upper)

        last_rot = state.sim.body_quat[obj_body]
        s = state.sim._replace(ctrl=targets)
        s = sim.step(s)
        prog = state.progress + 1
        state = state._replace(sim=s, progress=prog, prev_targets=targets,
                               actions=action, last_rot=last_rot)

        cur_rot = s.body_quat[obj_body]
        theta, dev = spin_theta(state.spin_axis, last_rot, cur_rot)
        theta = jnp.clip(theta, -3.14, 3.14)
        drift = axis_drift(state.spin_axis, state.init_rot, cur_rot)

        # penalties (`morb.py:1674-1687`): torque/work from the PD spring
        tau = jnp.clip(kp[7:23] * (targets[7:23] - s.q[7:23]),
                       -effort[7:23], effort[7:23])
        torque_penalty = jnp.sum(tau**2)
        work_penalty = jnp.sum(jnp.abs(tau) * jnp.abs(s.qd[7:23]))
        control_error = jnp.linalg.norm(targets - s.q)
        action_penalty = jnp.sum(action**2)
        contacts = jnp.where(
            s.link_contact_force[jnp.asarray(fsr)] >= 0.1, 1.0, 0.0)
        contact_reward = jnp.clip(jnp.sum(contacts), 0.0, 5.0)
        vel_reward = jnp.linalg.norm(s.body_linvel[obj_body])

        reward = (
            cfg.spin_coef * theta
            + cfg.vel_coef * vel_reward
            + cfg.contact_coef * contact_reward
            + cfg.torque_coef * torque_penalty
            + cfg.work_coef * work_penalty
            + cfg.action_penalty_scale * action_penalty
            + cfg.control_penalty_scale * control_error
        )

        goal_dist = jnp.linalg.norm(s.body_pos[obj_body] - state.hold_pos)
        fall = goal_dist >= cfg.fall_dist
        reward = reward + jnp.where(fall, cfg.fall_penalty, 0.0)

        timed_out = prog >= cfg.episode_length - 1
        done = timed_out | fall | (drift > cfg.axis_drift_limit)

        spinned_total = state.spinned_total + theta
        state = state._replace(reset_flag=done, spinned_total=spinned_total)
        frame = _observe(state)
        obs_stack = push_frame(state.obs_stack, frame)
        state = state._replace(obs_stack=obs_stack)
        obs = clip_obs(obs_stack.reshape(-1))
        return state, StepOutput(
            obs=obs,
            states=obs,
            reward=reward,
            done=done,
            info={
                "successes": spinned_total,  # spun radians (the task metric)
                "spin_theta": theta,
                "axis_drift": drift,
                "fall": fall.astype(jnp.float32),
            },
        )

    return Env(
        name=f"AllegroArmMOAR[{cfg.object_kind}]",
        num_obs=STACK * ONE_FRAME_OBS,
        num_states=STACK * ONE_FRAME_OBS,
        num_actions=NUM_ACTIONS,
        episode_length=cfg.episode_length,
        reset=reset,
        step=step,
        sim=sim,
    )


def make_moar_env(object_kinds: Sequence[str] = ("1x2",), **kw) -> Env:
    """Multi-object variant: one env per object kind, composed with the
    multi-task adapter (static per-index assignment) when >1 kind."""
    envs = [
        make_reorientation_env(ReorientConfig(object_kind=k, **kw))
        for k in object_kinds
    ]
    if len(envs) == 1:
        return envs[0]
    from .adapters import multi_task_env

    return multi_task_env(envs, name="AllegroArmMOAR")
