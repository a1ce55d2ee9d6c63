"""Pallas TPU kernel: projected-Jacobi friction-cone QP iterations.

The solver's hot loop is `iterations` x (A @ lam) with A a per-env
(3K, 3K) Delassus matrix. Under plain XLA each iteration re-reads A from HBM
(~600 MB per batched matvec at 4096 envs x K=64); this kernel grids over
envs, parks A in VMEM once (192x192 fp32 = 147 KB), and runs the whole
iteration loop on-chip — one HBM read of A total.

Falls back to the pure-jnp loop off-TPU (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _project_cone_bm(lam3, mu):
    """Cone projection on basis-major (3, K) impulses."""
    ln = lam3[0]
    ltx, lty = lam3[1], lam3[2]
    tn = jnp.sqrt(ltx * ltx + lty * lty)
    inside = tn <= mu * ln
    below = mu * tn <= -ln
    scale = jnp.maximum(mu * tn + ln, 0.0) / (mu * mu + 1.0)
    inv_tn = 1.0 / jnp.maximum(tn, 1e-9)
    ln_out = jnp.where(inside, ln, jnp.where(below, 0.0, scale))
    f = jnp.where(inside, 1.0, jnp.where(below, 0.0, mu * scale * inv_tn))
    return jnp.stack([ln_out, ltx * f, lty * f])


def qp_first_iterate(b, alpha, mu, act):
    """Closed form of the first projected-Jacobi step from lam = 0:
    lam_1 = project(-alpha * b) — skips one full operator application."""
    K = mu.shape[0]
    lam = _project_cone_bm(-alpha[None, :] * b.reshape(3, K), mu)
    return jnp.where(act[None, :], lam, 0.0).reshape(3 * K)


def qp_iterations_reference(A, b, alpha, mu, act, *, iterations: int, reg: float):
    """Pure-jnp per-env loop (vmapped by the caller). A: (3K, 3K), rest (K,)/(3K,)."""
    K = mu.shape[0]

    def body(_, lam):
        g = (jnp.dot(A, lam, precision=jax.lax.Precision.HIGHEST) + reg * lam + b)
        lam2 = lam.reshape(3, K) - alpha[None, :] * g.reshape(3, K)
        lam2 = _project_cone_bm(lam2, mu)
        lam2 = jnp.where(act[None, :], lam2, 0.0)
        return lam2.reshape(3 * K)

    return jax.lax.fori_loop(0, iterations - 1, body,
                             qp_first_iterate(b, alpha, mu, act))


def _qp_kernel(A_ref, b_ref, alpha_ref, mu_ref, act_ref, lam_ref, *,
               iterations: int, reg: float, K: int):
    A = A_ref[0]  # (3K, 3K) resident in VMEM
    b = b_ref[:]  # (1, 3K)
    alpha = alpha_ref[:]  # (1, K)
    mu = mu_ref[:]  # (1, K)
    act = act_ref[:]  # (1, K) float

    def body(_, lam):  # lam: (1, 3K) basis-major
        g = jax.lax.dot_general(
            lam, A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + reg * lam + b  # (1, 3K)
        # basis-major slices along lanes (static)
        ln = lam[:, 0:K] - alpha * g[:, 0:K]
        ltx = lam[:, K:2 * K] - alpha * g[:, K:2 * K]
        lty = lam[:, 2 * K:3 * K] - alpha * g[:, 2 * K:3 * K]
        # friction-cone projection
        tn = jnp.sqrt(ltx * ltx + lty * lty)
        inside = tn <= mu * ln
        below = mu * tn <= -ln
        scale = jnp.maximum(mu * tn + ln, 0.0) / (mu * mu + 1.0)
        inv_tn = 1.0 / jnp.maximum(tn, 1e-9)
        ln2 = jnp.where(inside, ln, jnp.where(below, 0.0, scale))
        f = jnp.where(inside, 1.0, jnp.where(below, 0.0, mu * scale * inv_tn))
        on = act > 0.0
        ln2 = jnp.where(on, ln2, 0.0)
        ltx2 = jnp.where(on, ltx * f, 0.0)
        lty2 = jnp.where(on, lty * f, 0.0)
        return jnp.concatenate([ln2, ltx2, lty2], axis=1)

    # first iterate from lam = 0 in closed form (see qp_first_iterate)
    ln0 = -alpha * b[:, 0:K]
    ltx0 = -alpha * b[:, K:2 * K]
    lty0 = -alpha * b[:, 2 * K:3 * K]
    tn0 = jnp.sqrt(ltx0 * ltx0 + lty0 * lty0)
    inside0 = tn0 <= mu * ln0
    below0 = mu * tn0 <= -ln0
    scale0 = jnp.maximum(mu * tn0 + ln0, 0.0) / (mu * mu + 1.0)
    f0 = jnp.where(inside0, 1.0,
                   jnp.where(below0, 0.0,
                             mu * scale0 / jnp.maximum(tn0, 1e-9)))
    on0 = act > 0.0
    lam0 = jnp.concatenate(
        [jnp.where(on0, jnp.where(inside0, ln0,
                                  jnp.where(below0, 0.0, scale0)), 0.0),
         jnp.where(on0, ltx0 * f0, 0.0),
         jnp.where(on0, lty0 * f0, 0.0)], axis=1)
    lam_ref[:] = jax.lax.fori_loop(0, iterations - 1, body, lam0)


def qp_iterations(A, b, alpha, mu, act, *, iterations: int, reg: float,
                  use_pallas: bool):
    """Per-env solve (vmap batches it — pallas_call's batching rule turns the
    vmapped axis into a grid dimension): A (3K, 3K), b (3K,), alpha/mu/act
    (K,). Returns lam (3K,), basis-major.
    """
    threeK = A.shape[-1]
    K = threeK // 3
    if not (use_pallas and _HAVE_PALLAS):
        return qp_iterations_reference(
            A, b, alpha, mu, act, iterations=iterations, reg=reg
        )

    kernel = functools.partial(_qp_kernel, iterations=iterations, reg=reg, K=K)
    lam = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, threeK), jnp.float32),
    )(
        A[None],
        b[None],
        alpha[None],
        mu[None],
        act.astype(jnp.float32)[None],
    )
    return lam[0]
