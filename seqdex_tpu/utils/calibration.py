"""Real-robot calibration / sysid utilities.

TPU-native analog of `utils/calibration.py` (AllegroArm standalone sim for
PD-gain sysid vs real traces, `:29+`) and `utils/sysid.py` (joint-trace
comparison): fit per-dof drive gains so the simulated step response matches
recorded hardware traces, leaning on JAX autodiff through the simulator
instead of manual sweeps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SysidResult:
    kp: np.ndarray
    kd: np.ndarray
    loss: float


def simulate_joint_response(kp, kd, q0, target, inertia, dt=1.0 / 120.0, steps=120,
                            effort=10.0):
    """Single-dof implicit-PD rollout (the integrator's joint model):
    returns the q trace (steps,)."""

    def body(carry, _):
        q, qd = carry
        tau = jnp.clip(kp * (target - q), -effort, effort)
        qd = (inertia * qd + dt * tau) / (inertia + dt * (kd + dt * kp))
        q = q + dt * qd
        return (q, qd), q

    (_, _), trace = jax.lax.scan(body, (q0, 0.0), None, length=steps)
    return trace


def fit_pd_gains(
    real_traces: np.ndarray,  # (N, steps) recorded joint positions
    targets: np.ndarray,  # (N,) commanded step targets
    q0s: np.ndarray,  # (N,) initial positions
    inertia: float,
    dt: float = 1.0 / 120.0,
    iters: int = 500,
    lr: float = 0.05,
    kp0: float = 50.0,
    kd0: float = 1.0,
) -> SysidResult:
    """Gradient-descent fit of (kp, kd) through the differentiable joint
    model — replaces the reference's manual gain sweeps."""
    real = jnp.asarray(real_traces)
    tg = jnp.asarray(targets)
    q0 = jnp.asarray(q0s)
    steps = real.shape[1]

    def loss_fn(log_gains):
        kp, kd = jnp.exp(log_gains[0]), jnp.exp(log_gains[1])
        sim = jax.vmap(
            lambda q, t: simulate_joint_response(kp, kd, q, t, inertia, dt, steps)
        )(q0, tg)
        return jnp.mean((sim - real) ** 2)

    g = jnp.log(jnp.asarray([kp0, kd0]))
    val_grad = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(iters):
        loss, grad = val_grad(g)
        g = g - lr * grad
    kp, kd = np.exp(np.asarray(g))
    return SysidResult(kp=kp, kd=kd, loss=float(loss))


def compare_traces(sim_trace: np.ndarray, real_trace: np.ndarray) -> dict:
    """Joint-trace comparison metrics (utils/sysid.py analog)."""
    err = sim_trace - real_trace
    return {
        "rmse": float(np.sqrt(np.mean(err**2))),
        "max_abs": float(np.abs(err).max()),
        "bias": float(err.mean()),
    }
