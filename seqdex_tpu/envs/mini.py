"""Minimal real-sim environment — the compile-small fixture.

A purpose-built 4-dof arm + free box + ground scene that exercises EVERY
stage of the production pipeline (FK scan, CRBA + implicit PD, SDF
narrowphase, friction-cone QP, obs/reward/reset, PPO rollout + update,
GSPMD sharding) at a fraction of the franka_allegro compile cost: the full
jitted train_epoch traces + compiles cold in seconds-to-tens-of-seconds on a
2-CPU host, vs minutes for the 40-link flagship scene.

Used by:
* `__graft_entry__.dryrun_multichip` — GSPMD correctness of the REAL physics
  stack is independent of scene size (the partitioner sees the same op mix:
  one-hot matmuls, scan-over-links FK, QP fori_loop, psum'd PPO reductions),
  so the multi-chip dry run validates the production sharding on this scene
  within the driver's budget without a compile cache.
* `tests/test_sharding.py` — sharded-vs-single-device equality on real
  physics.
* fast physics-mechanics tests (`tests/` suites that don't specifically
  target franka_allegro behavior).

The task itself is a miniature GraspSim: reach the box, lift it. Same Env
API, same info keys (`successes`), same obs-stack layout contract.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import (
    GEOM_BOX,
    GEOM_PLANE,
    JOINT_REVOLUTE,
    ArticulationSpec,
    BodySpec,
    GeomSpec,
    JointSpec,
    LinkSpec,
    StaticGeomSpec,
)
from ..sim.scene import compile_scene
from ..sim.simulator import SimConfig, SimState, make_sim
from .base import Env, StepOutput, clip_actions, clip_obs, push_frame, select_tree

ONE_FRAME_OBS = 18
ONE_FRAME_STATES = 24
STACK = 1
NUM_ACTIONS = 4


def mini_arm(n_links: int = 4) -> ArticulationSpec:
    """A tiny fixed-base arm: `n_links` revolute links with alternating
    y/z axes, 0.12 m each; only the end link emits contact points."""
    links = []
    seg = 0.12
    for i in range(n_links):
        last = i == n_links - 1
        links.append(
            LinkSpec(
                name=f"link{i}",
                parent=None if i == 0 else f"link{i-1}",
                joint=JointSpec(
                    jtype=JOINT_REVOLUTE,
                    axis=(0.0, 1.0, 0.0) if i % 2 == 0 else (0.0, 0.0, 1.0),
                    lower=-2.0,
                    upper=2.0,
                    effort=20.0,
                ),
                origin_pos=(0.0, 0.0, 0.0 if i == 0 else seg),
                mass=0.4,
                com=(0.0, 0.0, seg / 2),
                inertia=(2e-3, 2e-3, 5e-4, 0.0, 0.0, 0.0),
                geoms=[
                    GeomSpec(
                        GEOM_BOX,
                        (0.02, 0.02, seg / 2),
                        pos=(0.0, 0.0, seg / 2),
                        friction=0.9,
                        emit_points=last,
                        is_collider=False,
                        point_detail=0,
                    )
                ],
            )
        )
    return ArticulationSpec(name="mini_arm", links=links, base_pos=(0.0, 0.0, 0.02))


def mini_box(name: str = "box", half: float = 0.03) -> BodySpec:
    m = 0.1
    i = m / 12 * (2 * (2 * half) ** 2)
    return BodySpec(
        name=name,
        mass=m,
        inertia=(i, i, i, 0.0, 0.0, 0.0),
        geoms=[GeomSpec(GEOM_BOX, (half, half, half), friction=0.9, point_detail=0)],
    )


@dataclasses.dataclass(frozen=True)
class MiniConfig:
    episode_length: int = 32
    substeps: int = 1
    solver_iterations: int = 2
    max_contacts: int = 8
    n_links: int = 4
    lift_target: float = 0.05


class MiniTaskState(NamedTuple):
    sim: SimState
    key: jnp.ndarray
    progress: jnp.ndarray
    reset_flag: jnp.ndarray
    obs_stack: jnp.ndarray  # (1, 18)
    state_stack: jnp.ndarray  # (1, 24)
    box_init_pos: jnp.ndarray  # (3,)
    successes: jnp.ndarray
    actions: jnp.ndarray  # (4,)


def make_mini_env(cfg: MiniConfig = MiniConfig()) -> Env:
    scene = compile_scene(
        mini_arm(cfg.n_links),
        bodies=[mini_box()],
        statics=[
            StaticGeomSpec(
                name="ground",
                geom=GeomSpec(GEOM_PLANE, (0, 0, 0), friction=1.0, emit_points=False),
            )
        ],
    )
    art = scene.art
    D = art.ndof
    sim = make_sim(
        scene,
        SimConfig(
            substeps=cfg.substeps,
            solver_iterations=cfg.solver_iterations,
            max_contacts=cfg.max_contacts,
            stiffness=(30.0,) * D,
            damping=(3.0,) * D,
            effort=(20.0,) * D,
        ),
    )
    lower = jnp.asarray(art.lower, dtype=jnp.float32)
    upper = jnp.asarray(art.upper, dtype=jnp.float32)
    ee = art.nlinks - 1
    box = scene.body_index("box")
    default_q = jnp.asarray([0.6, 0.0, -0.9, 0.0][: D] + [0.0] * max(0, D - 4),
                            dtype=jnp.float32)

    def init_ctx():
        """Tiny runtime context (mirrors the block-assembly envs' ctx
        mechanism so the fast suite exercises the trainers' ctx threading):
        a shift added to the box reset position."""
        return {"target_shift": jnp.zeros(3, dtype=jnp.float32)}

    def _reset_sim(key, ctx):
        k1, _ = jax.random.split(key)
        s = sim.init_state(default_q)
        xy = 0.12 + 0.04 * jax.random.uniform(k1, (2,))
        bp = (jnp.concatenate([xy, jnp.asarray([0.03], dtype=jnp.float32)])
              + ctx["target_shift"])
        s = s._replace(
            body_pos=s.body_pos.at[box].set(bp),
            body_linvel=jnp.zeros_like(s.body_linvel),
            body_angvel=jnp.zeros_like(s.body_angvel),
        )
        return s, bp

    def _ee_pos(fk_res):
        p = fk_res.pos[ee]
        q = fk_res.quat[ee]
        from ..core.math import quat_apply

        return p + quat_apply(q, jnp.asarray([0.0, 0.0, 0.12], dtype=jnp.float32))

    def _observe(state: MiniTaskState, fk_res):
        s = state.sim
        eep = _ee_pos(fk_res)
        bp = s.body_pos[box]
        obs = jnp.concatenate([
            s.q, s.qd, bp, s.body_quat[box], eep, bp - eep,
        ])[:ONE_FRAME_OBS]
        obs = jnp.pad(obs, (0, ONE_FRAME_OBS - obs.shape[0]))
        st = jnp.concatenate([
            obs, s.body_linvel[box], state.actions[:3],
        ])[:ONE_FRAME_STATES]
        st = jnp.pad(st, (0, ONE_FRAME_STATES - st.shape[0]))
        return obs, st

    def reset_ctx(key, ctx) -> MiniTaskState:
        k0, k1 = jax.random.split(key)
        s, bp = _reset_sim(k0, ctx)
        state = MiniTaskState(
            sim=s,
            key=k1,
            progress=jnp.int32(0),
            reset_flag=jnp.bool_(False),
            obs_stack=jnp.zeros((STACK, ONE_FRAME_OBS), dtype=jnp.float32),
            state_stack=jnp.zeros((STACK, ONE_FRAME_STATES), dtype=jnp.float32),
            box_init_pos=bp,
            successes=jnp.float32(0.0),
            actions=jnp.zeros(NUM_ACTIONS, dtype=jnp.float32),
        )
        fk_res = sim.fk(s.q, s.qd)
        obs, st = _observe(state, fk_res)
        return state._replace(
            obs_stack=push_frame(state.obs_stack, obs),
            state_stack=push_frame(state.state_stack, st),
        )

    def step_ctx(state: MiniTaskState, action, ctx):
        fresh = reset_ctx(state.key, ctx)
        state = select_tree(state.reset_flag, fresh, state)

        action = clip_actions(action)
        s = state.sim
        targets = jnp.clip(s.q[:D] + 0.2 * action[:D], lower, upper)
        s = sim.step(s._replace(ctrl=targets))
        prog = state.progress + 1
        state = state._replace(sim=s, progress=prog, actions=action)

        fk_res = sim.fk(s.q, s.qd)
        obs, st = _observe(state, fk_res)
        obs_stack = push_frame(state.obs_stack, obs)
        state_stack = push_frame(state.state_stack, st)

        eep = _ee_pos(fk_res)
        bp = s.body_pos[box]
        dist = jnp.linalg.norm(bp - eep)
        lift = bp[2] - state.box_init_pos[2]
        reward = jnp.exp(-4.0 * dist) + 10.0 * jnp.clip(lift, 0.0, 0.1)
        success = jnp.where(lift > cfg.lift_target, 1.0, 0.0)
        done = prog >= cfg.episode_length - 1

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
            info={"successes": success, "dist": dist, "lift": lift},
        )
        return state, out

    _default_ctx = init_ctx()

    def reset(key) -> MiniTaskState:  # ctx-unaware binding
        return reset_ctx(key, _default_ctx)

    def step(state: MiniTaskState, action):
        return step_ctx(state, action, _default_ctx)

    return Env(
        name="MiniReach",
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
