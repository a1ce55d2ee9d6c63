"""Bi-directional optimization — the SeqDex outer loop.

TPU-native re-implementation of `scripts/bi_optimization.py:110-124`:

    for iteration in range(10):
        FORWARD:  train Search -> Orient -> GraspSim -> InsertSim
                  (each env's resets consume its predecessor's terminal-state
                  reservoir)
        BACKWARD: re-train InsertSim with T-value shaping, fit the
                  Grasp->Insert T-value on its success/failure terminal data,
                  then GraspSim + T-value, then Orient + T-value

The reference shuttles state between stages via pickle/HDF5 files on disk;
here the reservoirs are in-memory pytrees handed directly to the next stage
(and `.npz`-saveable for cross-job handoff).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..distributed.checkpoint import Checkpointer, save_params
from ..rl.ppo import PPOConfig, make_ppo
from . import reservoir as reslib
from . import tvalue as tvlib


@dataclasses.dataclass
class StageSpec:
    """One sub-policy stage in the chain."""

    name: str
    env_factory: Callable  # (reservoir=None, tvalue_params=None) -> Env
    num_envs: int
    train_epochs: int
    tvalue_in_dim: int = tvlib.GRASP_INSERT_IN
    tvalue_hidden: tuple = tvlib.GRASP_INSERT_HIDDEN


@dataclasses.dataclass
class BiOptConfig:
    iterations: int = 10  # `scripts/bi_optimization.py:110`
    tvalue_rollouts: int = 10000  # `:120` transition_value_trainer rollout arg
    logdir: str = "runs/bi_opt"
    seed: int = 42


class BiOptimizer:
    """Drives the forward/backward chain over a list of StageSpecs ordered
    Search -> Orient -> GraspSim -> InsertSim."""

    def __init__(self, stages, cfg: BiOptConfig = BiOptConfig()):
        self.stages = stages
        self.cfg = cfg
        self.policies: Dict[str, object] = {}
        self.reservoirs: Dict[str, object] = {}
        self.tvalues: Dict[str, object] = {}

    def _train_stage(self, stage: StageSpec, iteration: int, use_t_value: bool,
                     init_params=None):
        upstream = None
        if self.stages.index(stage) > 0:
            upstream = self.reservoirs.get(self.stages[self.stages.index(stage) - 1].name)
        tv = self.tvalues.get(stage.name) if use_t_value else None
        env = stage.env_factory(reservoir=upstream, tvalue_params=tv)
        ppo_cfg = PPOConfig(num_envs=stage.num_envs)
        init, train_epoch, act = make_ppo(env, ppo_cfg)
        ts = init(jax.random.PRNGKey(self.cfg.seed + iteration))
        if init_params is not None:
            ts = ts._replace(params=init_params)
        train_epoch = jax.jit(train_epoch, donate_argnums=(0,))
        ckpt = Checkpointer(
            os.path.join(self.cfg.logdir, f"it{iteration}_{stage.name}")
        )
        for epoch in range(stage.train_epochs):
            ts, metrics = train_epoch(ts)
            if epoch % 50 == 0:
                ckpt.maybe_save(ts, epoch, float(metrics["reward_mean"]), stage.name)
        self.policies[stage.name] = ts.params
        # harvest terminal states for the next stage (env exposes a
        # collect_terminal_states hook when it supports reservoir output)
        collect = getattr(env, "collect_terminal_states", None)
        if collect is not None:
            self.reservoirs[stage.name] = collect(ts)
        return ts

    def _train_tvalue(self, stage: StageSpec, succ: np.ndarray, fail: np.ndarray):
        ts, acc = tvlib.train_offline(
            succ, fail, stage.tvalue_in_dim, stage.tvalue_hidden,
            rollouts=self.cfg.tvalue_rollouts,
            ckpt_dir=os.path.join(self.cfg.logdir, f"tvalue_{stage.name}"),
        )
        self.tvalues[stage.name] = ts.params
        return acc

    def run(self, tvalue_data: Optional[Callable] = None):
        """tvalue_data(stage_name, policies) -> (succ, fail) arrays — the
        rollout-labelled terminal data (produced by evaluation rollouts)."""
        for it in range(self.cfg.iterations):
            # forward pass (`bi_optimization.py:113-116`)
            for stage in self.stages:
                self._train_stage(stage, it, use_t_value=False,
                                  init_params=self.policies.get(stage.name))
            # backward pass (`:119-124`): last stage first, with T-values
            for stage in reversed(self.stages[1:]):
                if tvalue_data is not None:
                    succ, fail = tvalue_data(stage.name, self.policies)
                    if len(succ) and len(fail):
                        self._train_tvalue(stage, succ, fail)
                self._train_stage(stage, it, use_t_value=True,
                                  init_params=self.policies.get(stage.name))
        return self.policies
