"""Standalone in-hand multi-object axis-rotation env (MOAR).

TPU-native analog of the reference's `utils/morb.py` `AllegroArmMOAR`
(`morb.py:50`, 1851 LoC — an IsaacGymEnvs-style VecTask for multi-object
in-hand reorientation, not imported by the main pipeline but shipped as a
standalone research env). Semantics kept:

* the Allegro hand (here on the frozen Franka arm, palm up-ish) holds an
  object; the policy drives the 16 finger DOFs only;
* the goal is a target orientation; on success (rot distance below
  tolerance) a fresh goal is sampled in-episode (consecutive-success
  counting, the hallmark of the reorientation family);
* reward = 1/(|rot_dist| + eps) shaping + success bonus + fall penalty,
  episode ends on fall or timeout;
* multi-object = one compiled scene per object kind, composed with
  `adapters.multi_task_env` (static per-index task assignment), instead of
  the reference's per-env asset lists.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..core import builders
from ..core.math import (
    quat_conjugate,
    quat_mul,
    scale_to_limits,
    unscale_from_limits,
)
from ..sim.scene import compile_scene
from ..sim.simulator import SimConfig, make_sim
from .base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree

ONE_FRAME_OBS = 85  # 16 q + 16 qd + 13 obj + 4 goal + 4 quat-diff + 16 act + 16 tgt
STACK = 3
NUM_ACTIONS = 16


@dataclasses.dataclass(frozen=True)
class ReorientConfig:
    object_kind: str = "1x2"
    episode_length: int = 300
    success_tolerance: float = 0.2  # rad (morb.py success_tolerance family)
    fall_dist: float = 0.24
    fall_penalty: float = -50.0
    reach_goal_bonus: float = 250.0
    rot_eps: float = 0.1
    rot_reward_scale: float = 1.0
    action_moving_average: float = 0.3
    vel_obs_scale: float = 0.2
    max_consecutive_successes: int = 50
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
    goal_rot: jnp.ndarray
    hold_pos: jnp.ndarray  # where the object was placed (fall detection)
    consecutive: jnp.ndarray
    actions: jnp.ndarray


def _rot_dist(qa, qb):
    """Angle of the relative rotation (IsaacGymEnvs reorientation metric)."""
    rel = quat_mul(qa, quat_conjugate(qb))
    return 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(rel[..., :3], axis=-1), 0.0, 1.0))


def _random_quat(key):
    u1, u2, u3 = jax.random.uniform(key, (3,))
    a, b = jnp.sqrt(1 - u1), jnp.sqrt(u1)
    # uniform over SO(3), xyzw layout
    return jnp.stack(
        [
            a * jnp.sin(2 * jnp.pi * u2),
            a * jnp.cos(2 * jnp.pi * u2),
            b * jnp.sin(2 * jnp.pi * u3),
            b * jnp.cos(2 * jnp.pi * u3),
        ]
    )


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
    obj_body = scene.body_index("object")

    default_q = jnp.zeros(D, dtype=jnp.float32)
    default_q = default_q.at[:7].set(
        jnp.asarray(builders.DEFAULT_ARM_QPOS, dtype=jnp.float32)
    )
    # fingers half-open for a palm cradle
    default_q = default_q.at[7:23].set(0.5 * (hand_lower + hand_upper))

    def _hold_pos():
        fk0 = sim.fk(default_q, jnp.zeros(D, dtype=jnp.float32))
        return fk0.pos[hand_base] + jnp.asarray([0.0, 0.0, 0.06], dtype=jnp.float32)

    def reset(key) -> ReorientState:
        k0, k1, k2 = jax.random.split(key, 3)
        s = sim.init_state(default_q)
        hold = _hold_pos()
        s = s._replace(
            q=default_q,
            qd=jnp.zeros(D, dtype=jnp.float32),
            ctrl=default_q,
            body_pos=s.body_pos.at[obj_body].set(hold),
            body_quat=s.body_quat.at[obj_body].set(_random_quat(k0)),
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        state = ReorientState(
            sim=s,
            key=k2,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            prev_targets=default_q,
            goal_rot=_random_quat(k1),
            hold_pos=hold,
            consecutive=jnp.float32(0.0),
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
        quat_diff = quat_mul(s.body_quat[obj_body], quat_conjugate(state.goal_rot))
        frame = jnp.concatenate(
            [
                unscale_from_limits(s.q[7:23], hand_lower, hand_upper),
                cfg.vel_obs_scale * s.qd[7:23],
                obj13,
                state.goal_rot,
                quat_diff,
                state.actions,
                unscale_from_limits(state.prev_targets[7:23], hand_lower, hand_upper),
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

        s = state.sim._replace(ctrl=targets)
        s = sim.step(s)
        prog = state.progress + 1
        state = state._replace(sim=s, progress=prog, prev_targets=targets,
                               actions=action)

        rot_dist = _rot_dist(s.body_quat[obj_body], state.goal_rot)
        fall = jnp.linalg.norm(s.body_pos[obj_body] - state.hold_pos) > cfg.fall_dist
        reached = rot_dist < cfg.success_tolerance

        reward = cfg.rot_reward_scale / (jnp.abs(rot_dist) + cfg.rot_eps)
        reward = reward + jnp.where(reached, cfg.reach_goal_bonus, 0.0)
        reward = reward + jnp.where(fall, cfg.fall_penalty, 0.0)

        # on goal reach: sample a fresh goal, keep the episode running
        kgoal, knext = jax.random.split(state.key)
        new_goal = jnp.where(reached, _random_quat(kgoal), state.goal_rot)
        consecutive = jnp.where(reached, state.consecutive + 1.0, state.consecutive)

        timed_out = prog >= cfg.episode_length - 1
        done = (
            timed_out
            | fall
            | (consecutive >= cfg.max_consecutive_successes)
        )
        state = state._replace(
            key=knext,
            goal_rot=new_goal,
            consecutive=consecutive,
            reset_flag=done,
        )
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
                "successes": consecutive,
                "rot_dist": rot_dist,
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
