"""Fused Pallas contact solver vs the default XLA path.

The kernel (sim/kernels/fused_contact.py) must reproduce the reference
solver's dynamics bit-closely: same Delassus assembly, same preconditioned
projected-Jacobi iterations, same cone projection. Runs in Pallas interpret
mode on CPU (the TPU path compiles the same kernel body).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.envs.mini import MiniConfig, make_mini_env


@pytest.mark.parametrize("mode", ["factored", "pallas"])
def test_fused_substep_matches_xla_path(mode):
    from seqdex_tpu.core.model import (GEOM_BOX, GEOM_PLANE, GeomSpec,
                                       StaticGeomSpec)
    from seqdex_tpu.envs.mini import mini_arm, mini_box
    from seqdex_tpu.sim.scene import compile_scene
    from seqdex_tpu.sim.simulator import SimConfig, make_sim

    scene = compile_scene(
        mini_arm(),
        bodies=[mini_box()],
        statics=[StaticGeomSpec(
            name="ground",
            geom=GeomSpec(GEOM_PLANE, (0, 0, 0), friction=1.0,
                          emit_points=False))],
    )
    base = dict(substeps=1, solver_iterations=4, max_contacts=8,
                stiffness=(30.0,) * 4, damping=(3.0,) * 4, effort=(20.0,) * 4)
    sim_ref = make_sim(scene, SimConfig(use_pallas=False, **base))
    sim_fus = make_sim(scene, SimConfig(use_pallas=True, pallas_env_block=4,
                                        contact_solver_mode=mode, **base))

    N = 6  # deliberately not a multiple of env_block (exercises padding)
    keys = jax.random.split(jax.random.PRNGKey(0), N)

    def init_one(key):
        s = sim_ref.init_state()
        bp = jnp.asarray([0.13, 0.13, 0.2]) + 0.02 * jax.random.normal(key, (3,))
        return s._replace(
            body_pos=s.body_pos.at[0].set(bp),
            body_linvel=s.body_linvel.at[0].set(
                0.3 * jax.random.normal(jax.random.fold_in(key, 1), (3,))),
        )

    states = jax.vmap(init_one)(keys)
    step_ref = jax.jit(jax.vmap(sim_ref.step))
    step_fus = jax.jit(jax.vmap(sim_fus.step))

    s_r, s_f = states, states
    for _ in range(30):  # through free fall, impact, and settling
        s_r = step_ref(s_r)
        s_f = step_fus(s_f)

    np.testing.assert_allclose(
        np.asarray(s_f.body_pos), np.asarray(s_r.body_pos), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(s_f.q), np.asarray(s_r.q), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(s_f.body_linvel), np.asarray(s_r.body_linvel), atol=2e-3)
    # contact forces fired in both
    assert float(np.asarray(s_r.link_contact_force).sum() +
                 np.asarray(s_r.body_contact_force).sum()) >= 0.0


def test_fused_single_env_fallback_matches():
    """Unbatched call takes the custom_vmap fallback (pure-jnp reference) —
    it must agree with the batched Pallas path."""
    from seqdex_tpu.core.model import GEOM_PLANE, GeomSpec, StaticGeomSpec
    from seqdex_tpu.envs.mini import mini_arm, mini_box
    from seqdex_tpu.sim.scene import compile_scene
    from seqdex_tpu.sim.simulator import SimConfig, make_sim

    scene = compile_scene(
        mini_arm(), bodies=[mini_box()],
        statics=[StaticGeomSpec(
            name="ground",
            geom=GeomSpec(GEOM_PLANE, (0, 0, 0), friction=1.0,
                          emit_points=False))],
    )
    sim = make_sim(scene, SimConfig(
        use_pallas=True, pallas_env_block=4, substeps=1, solver_iterations=4,
        max_contacts=8, stiffness=(30.0,) * 4, damping=(3.0,) * 4,
        effort=(20.0,) * 4))
    s0 = sim.init_state()._replace(
        body_pos=jnp.asarray([[0.13, 0.13, 0.05]], dtype=jnp.float32))
    single = jax.jit(sim.step)(s0)
    batched = jax.jit(jax.vmap(sim.step))(
        jax.tree_util.tree_map(lambda x: x[None], s0))
    np.testing.assert_allclose(
        np.asarray(batched.q[0]), np.asarray(single.q), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batched.body_pos[0]), np.asarray(single.body_pos),
        atol=1e-5)
