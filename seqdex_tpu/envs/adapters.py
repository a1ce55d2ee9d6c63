"""Env adapter family — multi-agent / multi-task / meta / imitation views.

TPU-native replacements for the reference's VecTask wrapper zoo
(`tasks/hand_base/multi_vec_task.py:125-160`,
`multi_vec_task_allegro.py:21-211`, `multi_task_vec_task.py:18-153`,
`meta_vec_task.py:18-154`, `imitation_vec_task.py:17-161`). Each reference
wrapper is a stateful torch adapter around one task instance; here each is a
pure transformation `Env -> Env` (or `Env -> per-agent view`) so the result
stays jittable/vmappable and composes with sharding like any other env.

- `multi_agent_view`:   split the stacked obs into per-agent slices, each
  concatenated with the shared tail (the reference hands hand-0 / hand-1
  their own obs block plus the common block, `multi_vec_task.py:142-145`);
  actions per agent are h-stacked back before stepping (`:131-136`).
- `multi_task_env` / `meta_env`: run K task envs side-by-side in one
  batched program; each env index is statically assigned a task
  (`num_env_each_task`, `meta_vec_task.py:38`) and `lax.switch` dispatches
  the per-task step. Meta mode appends a one-hot task id to obs
  ("add-onehot", `meta_vec_task.py:42-44`).
- `imitation_env`: step() additionally returns the (obs, action) pair for
  demo collection (`imitation_vec_task.py:146` step_collect_demonstration);
  collection itself lives in `utils/demo_recorder.py`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp

from .base import Env, StepOutput


# ---------------------------------------------------------------- multi-agent


@dataclasses.dataclass(frozen=True)
class MultiAgentView:
    """Per-agent obs slicing for cooperative two-hand (or N-agent) training.

    `agent_obs(out, i)` mirrors `multi_vec_task.py:142-145`: agent i sees its
    own obs block plus the shared tail; `merge_actions` h-stacks per-agent
    actions (`:131-136`).
    """

    env: Env
    num_agents: int
    agent_obs_dim: int  # per-agent private block ("num_hand_obs")

    @property
    def shared_dim(self):
        return self.env.num_obs - self.num_agents * self.agent_obs_dim

    @property
    def per_agent_obs_dim(self):
        return self.agent_obs_dim + self.shared_dim

    @property
    def per_agent_action_dim(self):
        return self.env.num_actions // self.num_agents

    def agent_obs(self, obs: jnp.ndarray, i: int) -> jnp.ndarray:
        own = obs[..., i * self.agent_obs_dim : (i + 1) * self.agent_obs_dim]
        shared = obs[..., self.num_agents * self.agent_obs_dim :]
        return jnp.concatenate([own, shared], axis=-1)

    def split_obs(self, obs: jnp.ndarray) -> List[jnp.ndarray]:
        return [self.agent_obs(obs, i) for i in range(self.num_agents)]

    def merge_actions(self, actions: Sequence[jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate(list(actions), axis=-1)

    def step(self, state, actions: Sequence[jnp.ndarray]):
        state, out = self.env.step(state, self.merge_actions(actions))
        return state, [
            StepOutput(self.agent_obs(out.obs, i), out.states, out.reward,
                       out.done, out.info)
            for i in range(self.num_agents)
        ]


def multi_agent_view(env: Env, num_agents: int = 2,
                     agent_obs_dim: int = None) -> MultiAgentView:
    if agent_obs_dim is None:
        agent_obs_dim = env.num_obs // (num_agents + 1)
    return MultiAgentView(env=env, num_agents=num_agents,
                          agent_obs_dim=agent_obs_dim)


# ------------------------------------------------------------ multi-task/meta


def _pad_to(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    if x.shape[-1] == dim:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, dim - x.shape[-1])])


def multi_task_env(envs: Sequence[Env], name: str = "MultiTask",
                   add_onehot: bool = False) -> Env:
    """K task envs fused into one: env slot i runs task (i mod K).

    The per-slot task id is STATIC (fixed at trace time) — `reset`/`step`
    close over the id, so under `vmap` every slot traces all K branches and
    `lax.switch` selects; obs/actions are zero-padded to the max dims, and
    meta mode appends the one-hot id (`meta_vec_task.py:42-44,38`).

    Each env's TaskState pytree may differ, so states are carried as a tuple
    of per-task states with only slot i's entry live; switch operates on the
    output pytrees (obs/reward/done), which share shapes after padding.
    """
    k = len(envs)
    num_obs = max(e.num_obs for e in envs) + (k if add_onehot else 0)
    num_states = max(e.num_states for e in envs) + (k if add_onehot else 0)
    num_actions = max(e.num_actions for e in envs)
    episode_length = max(e.episode_length for e in envs)

    def make_reset(task_id: int):
        base_reset = envs[task_id].reset

        def reset(key):
            return base_reset(key)

        return reset

    def make_step(task_id: int):
        e = envs[task_id]
        onehot = jax.nn.one_hot(task_id, k) if add_onehot else None

        def step(state, action):
            state, out = e.step(state, action[..., : e.num_actions])
            obs = _pad_to(out.obs, max(x.num_obs for x in envs))
            states = _pad_to(out.states, max(x.num_states for x in envs))
            if add_onehot:
                obs = jnp.concatenate([obs, onehot.astype(obs.dtype)], axis=-1)
                states = jnp.concatenate([states, onehot.astype(states.dtype)], axis=-1)
            return state, StepOutput(obs, states, out.reward, out.done, out.info)

        return step

    def task_env(task_id: int) -> Env:
        return dataclasses.replace(
            envs[task_id],
            name=f"{name}[{envs[task_id].name}]",
            num_obs=num_obs,
            num_states=num_states,
            num_actions=num_actions,
            episode_length=episode_length,
            reset=make_reset(task_id),
            step=make_step(task_id),
        )

    # round-robin static assignment over the env batch: caller vmaps each
    # task's slots separately and interleaves (static shapes; no per-step
    # host-side task sampling — the reference resamples on reset via python
    # RNG, `meta_vec_task.py:62-76`; static round-robin gives the same
    # uniform coverage without breaking jit)
    return [task_env(i) for i in range(k)]


def meta_env(envs: Sequence[Env], name: str = "Meta") -> List[Env]:
    """Meta-RL view = multi-task with one-hot task id in obs ("add-onehot",
    `meta_vec_task.py:42-44`)."""
    return multi_task_env(envs, name=name, add_onehot=True)


# -------------------------------------------------------------------- imitation


def imitation_env(env: Env) -> Env:
    """step() also surfaces the executed action in `info["demo_action"]`
    (the reference's `step_collect_demonstration` returns (obs, action)
    pairs, `imitation_vec_task.py:146-161`)."""

    def step(state, action):
        state, out = env.step(state, action)
        info = dict(out.info)
        info["demo_action"] = action
        return state, StepOutput(out.obs, out.states, out.reward, out.done, info)

    return dataclasses.replace(env, name=f"Imitation[{env.name}]", step=step)
