"""Domain randomization engine.

TPU-native mirror of `tasks/hand_base/base_task.py:229-423`
(`apply_randomizations`) driven by the same config schema
(`cfg/allegro_hand_block_assembly_grasp_sim.yaml` task.randomization_params):
gaussian/uniform/loguniform draws, additive/scaling operations, linear or
constant schedules, over observations, actions, gravity, DOF drive
stiffness/damping, and body mass/friction.

Functional formulation: `sample_factors(key, step)` draws one `RandFactors`
pytree per env (refreshed per reset / every `frequency` steps); the env
applies obs/action noise, and the simulator consumes the physical scales via
`SimState` fields (kp/kd/friction/gravity multipliers) — no mutation of
static scene tables.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RandSpec:
    """One randomized quantity (mirrors the per-key YAML block)."""

    range: Tuple[float, float] = (0.0, 0.0)
    operation: str = "additive"  # "additive" | "scaling"
    distribution: str = "gaussian"  # "gaussian" | "uniform" | "loguniform"
    schedule: str = "linear"  # "linear" | "constant"
    schedule_steps: int = 30000

    def draw(self, key, shape, step):
        lo, hi = self.range
        if self.distribution == "gaussian":
            # reference semantics: range = [mu, var] for gaussian
            x = lo + hi * jax.random.normal(key, shape)
        elif self.distribution == "uniform":
            x = jax.random.uniform(key, shape, minval=lo, maxval=hi)
        else:  # loguniform
            x = jnp.exp(
                jax.random.uniform(
                    key, shape, minval=jnp.log(lo), maxval=jnp.log(hi)
                )
            )
        sched = jnp.clip(step / max(self.schedule_steps, 1), 0.0, 1.0)
        if self.schedule == "constant":
            sched = (step >= self.schedule_steps).astype(jnp.float32)
        if self.operation == "scaling":
            # interpolate multiplier toward 1 when schedule is cold
            return 1.0 + (x - 1.0) * sched
        return x * sched


@dataclasses.dataclass(frozen=True)
class RandomizationParams:
    """Defaults match the reference grasp cfg block."""

    frequency: int = 1000
    observations: RandSpec = RandSpec((0.0, 0.002), "additive", "gaussian")
    actions: RandSpec = RandSpec((0.0, 0.05), "additive", "gaussian")
    gravity: RandSpec = RandSpec((0.0, 0.4), "additive", "gaussian")
    dof_stiffness: RandSpec = RandSpec((0.75, 1.5), "scaling", "loguniform")
    dof_damping: RandSpec = RandSpec((0.3, 3.0), "scaling", "loguniform")
    body_mass: RandSpec = RandSpec((0.5, 1.5), "scaling", "uniform")
    friction: RandSpec = RandSpec((0.7, 1.3), "scaling", "uniform")


class RandFactors(NamedTuple):
    """Per-env randomization state (refreshed at reset / every frequency)."""

    obs_noise_corr: jnp.ndarray  # (num_obs,) correlated obs noise
    act_noise_corr: jnp.ndarray  # (num_actions,)
    kp_scale: jnp.ndarray  # (D,)
    kd_scale: jnp.ndarray  # (D,)
    mass_scale: jnp.ndarray  # () — free-body mass multiplier
    friction_scale: jnp.ndarray  # ()
    gravity_offset: jnp.ndarray  # (3,)


def identity_factors(num_obs: int, num_actions: int, ndof: int) -> RandFactors:
    return RandFactors(
        obs_noise_corr=jnp.zeros(num_obs),
        act_noise_corr=jnp.zeros(num_actions),
        kp_scale=jnp.ones(ndof),
        kd_scale=jnp.ones(ndof),
        mass_scale=jnp.ones(()),
        friction_scale=jnp.ones(()),
        gravity_offset=jnp.zeros(3),
    )


def sample_factors(
    params: RandomizationParams, key, step, num_obs: int, num_actions: int, ndof: int
) -> RandFactors:
    ks = jax.random.split(key, 7)
    return RandFactors(
        obs_noise_corr=params.observations.draw(ks[0], (num_obs,), step),
        act_noise_corr=params.actions.draw(ks[1], (num_actions,), step),
        kp_scale=params.dof_stiffness.draw(ks[2], (ndof,), step),
        kd_scale=params.dof_damping.draw(ks[3], (ndof,), step),
        mass_scale=params.body_mass.draw(ks[4], (), step),
        friction_scale=params.friction.draw(ks[5], (), step),
        gravity_offset=params.gravity.draw(ks[6], (3,), step)
        * jnp.asarray([0.0, 0.0, 1.0]),
    )


def randomize_sim_state(s, key, ndof: int, step=1e6,
                        params: Optional[RandomizationParams] = None):
    """Sample physical DR factors into a SimState's per-env fields — the
    uniform per-reset hook every task env calls when `cfg.randomize` is set
    (the reference applies its schema to every task yaml,
    `base_task.py:229-423`)."""
    params = params or RandomizationParams()
    f = sample_factors(params, key, jnp.float32(step), 1, 1, ndof)
    return s._replace(
        kp_scale=f.kp_scale,
        kd_scale=f.kd_scale,
        mu_scale=f.friction_scale,
        mass_scale=f.mass_scale,
        gravity_offset=f.gravity_offset,
    )


def apply_obs_noise(params: RandomizationParams, key, step, obs, factors: RandFactors):
    white = params.observations.draw(key, obs.shape, step)
    return obs + white + factors.obs_noise_corr


def apply_action_noise(params: RandomizationParams, key, step, action, factors: RandFactors):
    white = params.actions.draw(key, action.shape, step)
    return action + white + factors.act_noise_corr
