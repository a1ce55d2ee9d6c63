"""PhysX-parity contact reuse (`SimConfig.reuse_contacts`).

PhysX generates contact pairs once per `gym.simulate` control step and the
TGS substeps reuse them (reference sim budget: dt=1/60, substeps=2 —
`utils/config.py:188`). The TPU analog selects pairs once in `step` and each
substep recomputes depth/normal/position for the stored pairs with O(K) math
(`contact.py::refresh`). Checks:
* refresh at the SAME pose reproduces the full narrowphase contact set
  (pairs, depths, normals, positions);
* the mini-heap settles to the same resting state with reuse on;
* an arm-driven sweep through the heap stays finite and close to the exact
  per-substep trajectory.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_segmented_qp import _drop_state, _heap_scene
from seqdex_tpu.sim.simulator import SimConfig, make_sim


def _sim(**kw):
    return make_sim(_heap_scene(), SimConfig(max_contacts=96, **kw))


def test_refresh_matches_narrowphase_at_same_pose():
    sim = _sim()
    s = _drop_state(sim)
    # settle a bit so there are real contacts of every flavor
    step = jax.jit(sim.step)
    for _ in range(20):
        s = step(s)
    from seqdex_tpu.sim.contact import make_narrowphase

    nf, _ = make_narrowphase(sim.scene, sim.config.max_contacts)
    fk_res = sim.fk(s.q, s.qd)
    args = (fk_res.pos, fk_res.quat, s.body_pos, s.body_quat)
    full = nf(*args, None, None)
    sel = nf.select(*args, None, None)
    re = nf.refresh(*args, None, sel)
    np.testing.assert_array_equal(np.asarray(full.pt_idx), np.asarray(re.pt_idx))
    np.testing.assert_array_equal(np.asarray(full.col_idx), np.asarray(re.col_idx))
    act = np.asarray(full.active)
    assert act.any()
    np.testing.assert_allclose(np.asarray(re.depth)[act],
                               np.asarray(full.depth)[act], atol=1e-5)
    np.testing.assert_allclose(np.asarray(re.normal)[act],
                               np.asarray(full.normal)[act], atol=1e-5)
    np.testing.assert_allclose(np.asarray(re.pos)[act],
                               np.asarray(full.pos)[act], atol=1e-5)
    # selection-masked padding rows must stay inactive after refresh
    pad = np.asarray(sel[0]) < -1e8
    assert not np.asarray(re.active)[pad].any()


def _settle(reuse, steps=60, **kw):
    sim = _sim(reuse_contacts=reuse, **kw)
    s = _drop_state(sim)
    step = jax.jit(sim.step)
    for _ in range(steps):
        s = step(s)
    return s


def test_reuse_settles_like_exact():
    se = _settle(False)
    sr = _settle(True)
    assert bool(jnp.all(jnp.isfinite(sr.body_pos)))
    # resting pile: same heights / horizontal layout within ~1 cm (pile
    # settling is chaotic between solver schedules; exact is pinned by
    # test_refresh_matches_narrowphase_at_same_pose instead)
    np.testing.assert_allclose(np.asarray(sr.body_pos),
                               np.asarray(se.body_pos), atol=1.2e-2)
    # nothing fell through the ground or exploded upward
    z = np.asarray(sr.body_pos)[:, 2]
    assert (z > 0.0).all() and (z < 0.5).all()


def test_reuse_warm_start_half_budget_settles():
    """The production heap config: warm-started substep 2 at half the
    iteration budget (PhysX-style impulse caching) still settles the pile
    to the exact path's resting state."""
    se = _settle(False)
    sw = _settle(True, warm_iterations=8)
    assert bool(jnp.all(jnp.isfinite(sw.body_pos)))
    # resting HEIGHTS match tightly (solver quality: no sink-through, no
    # float); lateral positions are chaotic between schedules — bound loosely
    np.testing.assert_allclose(np.asarray(sw.body_pos)[:, 2],
                               np.asarray(se.body_pos)[:, 2], atol=3e-3)
    np.testing.assert_allclose(np.asarray(sw.body_pos)[:, :2],
                               np.asarray(se.body_pos)[:, :2], atol=2.5e-2)
    assert float(jnp.max(jnp.abs(sw.body_linvel))) < 0.05


def test_reuse_arm_sweep_stays_close():
    sim_e = _sim(reuse_contacts=False)
    sim_r = _sim(reuse_contacts=True)
    se = _drop_state(sim_e)
    sr = _drop_state(sim_r)
    step_e = jax.jit(sim_e.step)
    step_r = jax.jit(sim_r.step)
    # drive the arm through the pile region while the boxes settle
    for t in range(40):
        ctrl = se.ctrl.at[0].set(0.4 * np.sin(t / 8.0))
        se = step_e(se._replace(ctrl=ctrl))
        sr = step_r(sr._replace(ctrl=ctrl))
    assert bool(jnp.all(jnp.isfinite(sr.body_pos)))
    assert bool(jnp.all(jnp.isfinite(sr.q)))
    # the moving-robot trajectories track closely (pair set staleness is
    # at most one substep — O(mm) at these velocities)
    np.testing.assert_allclose(np.asarray(sr.q), np.asarray(se.q), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sr.body_pos),
                               np.asarray(se.body_pos), atol=2e-2)
