#!/usr/bin/env python
"""Timing of the contact-QP internals (assembly vs iterations) on the chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.sim.kernels.qp import qp_iterations_reference


def timeit(name, fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms")
    return dt


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    K = 48
    threeK = 3 * K
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    G = jax.random.normal(ks[0], (num_envs, threeK, threeK)) * 0.1
    A = jnp.einsum("eij,ekj->eik", G, G) + jnp.eye(threeK) * 0.5
    b = jax.random.normal(ks[1], (num_envs, threeK))
    alpha = jnp.abs(jax.random.normal(ks[2], (num_envs, K))) * 0.1 + 0.01
    mu = jnp.full((num_envs, K), 0.8)
    act = jax.random.uniform(ks[3], (num_envs, K)) < 0.3

    f = jax.jit(jax.vmap(lambda A, b, al, m, ac: qp_iterations_reference(
        A, b, al, m, ac, iterations=16, reg=1e-4)))
    timeit("qp iterations x16 (XLA)", f, A, b, alpha, mu, act)

    # assembly-ish: the three big matmuls of solve_contact_qp
    D = 23
    JrT = jax.random.normal(ks[4], (num_envs, D, threeK))
    Minv = jnp.tile(jnp.eye(D)[None], (num_envs, 1, 1))
    HI = jax.lax.Precision.HIGHEST

    def assemble(JrT, Minv):
        WrT = jnp.einsum("eij,ejk->eik", Minv, JrT, precision=HI)
        A = jnp.einsum("eji,ejk->eik", JrT, WrT, precision=HI)
        return A
    timeit("A assembly matmuls (D->3K)", jax.jit(assemble), JrT, Minv)

    def rowsum(A, act):
        act_cols = jnp.tile(act, (1, 3)).astype(A.dtype)
        rs = jnp.sum(jnp.abs(A) * act_cols[:, None, :], axis=2)
        rs = jnp.max(rs.reshape(num_envs, 3, K), axis=1)
        return 1.0 / (jnp.maximum(rs, 1e-6) + 1e-4)
    timeit("row-sum precond", jax.jit(rowsum), A, act)


if __name__ == "__main__":
    main()
