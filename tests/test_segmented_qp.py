"""Matrix-free (segmented) contact QP vs the dense Delassus path.

A 12-box mini-heap + 4-dof arm scene (B > 8 so the production auto-select
would pick the segmented path) stepped for 60 substeps:
* precond="exact": identical Jacobi step sizes -> trajectories must match
  the dense path tightly.
* precond="cs": upper-bound step sizes -> physically equivalent behavior
  (boxes settle on the ground, nothing explodes, resting heights equal).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.envs.mini import mini_arm, mini_box
from seqdex_tpu.core.model import StaticGeomSpec, GeomSpec, GEOM_PLANE
from seqdex_tpu.sim.scene import compile_scene
from seqdex_tpu.sim.simulator import SimConfig, make_sim


def _heap_scene(n_boxes=12):
    boxes = [mini_box(name=f"box{i}", half=0.03) for i in range(n_boxes)]
    return compile_scene(
        mini_arm(),
        bodies=boxes,
        statics=[StaticGeomSpec(
            name="ground",
            geom=GeomSpec(GEOM_PLANE, (0, 0, 0), emit_points=False),
        )],
    )


def _drop_state(sim, n_boxes=12, seed=0):
    s = sim.init_state()
    rng = np.random.RandomState(seed)
    # 3x4 grid of boxes, two layers, slight jitter -> a small pile
    pos = []
    for i in range(n_boxes):
        x = 0.25 + 0.065 * (i % 3) + rng.uniform(-5e-3, 5e-3)
        y = -0.1 + 0.065 * ((i // 3) % 2) + rng.uniform(-5e-3, 5e-3)
        z = 0.05 + 0.07 * (i // 6)
        pos.append([x, y, z])
    s = s._replace(body_pos=jnp.asarray(pos, dtype=jnp.float32))
    return s


def _rollout(cfg_kwargs, steps=30):
    scene = _heap_scene()
    sim = make_sim(scene, SimConfig(max_contacts=96, **cfg_kwargs))
    s = _drop_state(sim)
    step = jax.jit(sim.step)
    traj = []
    for _ in range(steps):
        s = step(s)
        traj.append(np.asarray(s.body_pos))
    return np.stack(traj), s


def test_segmented_exact_matches_dense():
    t_dense, sd = _rollout(dict(contact_segmented=False))
    t_seg, ss = _rollout(dict(contact_segmented=True, contact_precond="exact"))
    # identical step sizes + same operator: fp-association differences only
    np.testing.assert_allclose(t_seg, t_dense, atol=2e-3)
    assert bool(jnp.all(jnp.isfinite(ss.body_pos)))


def test_segmented_cs_physically_sane():
    t_dense, _ = _rollout(dict(contact_segmented=False), steps=60)
    t_cs, s = _rollout(dict(contact_segmented=True, contact_precond="cs"),
                       steps=60)
    assert bool(jnp.all(jnp.isfinite(s.body_pos)))
    assert bool(jnp.all(jnp.isfinite(s.qd)))
    # boxes rest on/near the ground plane, no tunnelling, no launch
    z_cs = t_cs[-1][:, 2]
    z_dn = t_dense[-1][:, 2]
    assert np.all(z_cs > 0.0), z_cs.min()
    assert np.all(z_cs < 0.25), z_cs.max()
    # settled heights comparable to the dense solver (cm-level)
    np.testing.assert_allclose(np.sort(z_cs), np.sort(z_dn), atol=0.02)
