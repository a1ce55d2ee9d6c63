"""Cross-control-step pair persistence (`SimConfig.select_every`).

The Search heap runs pair selection every N control steps during training
(the rollout scan threads a uniform tick); in between, the stored top-K pair
list is refreshed with O(K) math. Heap bricks move ~mm per control step and
the top-K list carries separated near-pairs as margin, so staleness must
only introduce bounded drift vs every-step selection. Checks:
* tick-driven settle matches the every-step-selection settle;
* no tick (harvest/eval path) exactly equals select_every=1 behavior;
* a moving-arm sweep with a 4-step cadence stays finite and close;
* a reset (teleport) recovers: the stale list misses new pairs for at most
  N-1 steps and the pile still settles instead of sinking through.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_segmented_qp import _drop_state, _heap_scene
from seqdex_tpu.sim.simulator import SimConfig, make_sim


def _sim(**kw):
    return make_sim(_heap_scene(),
                    SimConfig(max_contacts=96, reuse_contacts=True, **kw))


def _settle(sim, steps=60, tick=None):
    s = _drop_state(sim)
    if tick is None:
        step = jax.jit(sim.step)
        for _ in range(steps):
            s = step(s)
    else:
        step = jax.jit(lambda s, t: sim.step(s, tick=t))
        for t in range(steps):
            s = step(s, jnp.int32(t))
    return s


def test_select_every_settles_like_every_step():
    ref = _settle(_sim())
    per = _settle(_sim(select_every=4), tick=0)
    assert bool(jnp.all(jnp.isfinite(per.body_pos)))
    np.testing.assert_allclose(np.asarray(per.body_pos),
                               np.asarray(ref.body_pos), atol=1.2e-2)
    z = np.asarray(per.body_pos)[:, 2]
    assert (z > 0.0).all() and (z < 0.5).all()


def test_no_tick_is_exact_every_step_selection():
    """Collector/eval path: select_every configured but no tick passed —
    must be bit-identical to the select_every=1 program."""
    s1 = _settle(_sim(select_every=1))
    s4 = _settle(_sim(select_every=4))  # no tick
    np.testing.assert_array_equal(np.asarray(s4.body_pos),
                                  np.asarray(s1.body_pos))
    np.testing.assert_array_equal(np.asarray(s4.q), np.asarray(s1.q))


def test_select_every_arm_sweep_stays_close():
    sim_e = _sim()
    sim_p = _sim(select_every=4)
    se = _drop_state(sim_e)
    sp = _drop_state(sim_p)
    step_e = jax.jit(sim_e.step)
    step_p = jax.jit(lambda s, t: sim_p.step(s, tick=t))
    for t in range(40):
        ctrl = se.ctrl.at[0].set(0.4 * np.sin(t / 8.0))
        se = step_e(se._replace(ctrl=ctrl))
        sp = step_p(sp._replace(ctrl=ctrl), jnp.int32(t))
    assert bool(jnp.all(jnp.isfinite(sp.body_pos)))
    assert bool(jnp.all(jnp.isfinite(sp.q)))
    np.testing.assert_allclose(np.asarray(sp.q), np.asarray(se.q), atol=3e-2)
    np.testing.assert_allclose(np.asarray(sp.body_pos),
                               np.asarray(se.body_pos), atol=3e-2)


def test_select_every_recovers_after_teleport():
    """Masked-reset analog: teleport the settled pile up 5 cm mid-run with a
    stale pair list; within one cadence the fresh selection resumes and the
    pile must re-settle (no sink-through from the missed-new-pairs window)."""
    sim = _sim(select_every=4)
    s = _settle(sim, tick=0)
    s = s._replace(body_pos=s.body_pos + jnp.asarray([0.0, 0.0, 0.05]),
                   body_linvel=jnp.zeros_like(s.body_linvel))
    step = jax.jit(lambda s, t: sim.step(s, tick=t))
    # worst case: the teleport lands just after a re-select tick
    for t in range(1, 61):
        s = step(s, jnp.int32(t))
    z = np.asarray(s.body_pos)[:, 2]
    assert bool(jnp.all(jnp.isfinite(s.body_pos)))
    assert (z > 0.0).all() and (z < 0.5).all()
    assert float(jnp.max(jnp.abs(s.body_linvel))) < 0.1


def test_vmapped_scalar_tick_branches():
    """The production shape: vmapped envs + an UNBATCHED tick. Must compile
    and run (the cond predicate stays scalar under vmap) and match the
    single-env result."""
    sim = _sim(select_every=4)
    s0 = _drop_state(sim)
    sb = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), s0)
    step_b = jax.jit(jax.vmap(lambda s, t: sim.step(s, tick=t),
                              in_axes=(0, None)))
    step_1 = jax.jit(lambda s, t: sim.step(s, tick=t))
    s1 = s0
    for t in range(12):
        sb = step_b(sb, jnp.int32(t))
        s1 = step_1(s1, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(sb.body_pos[0]),
                               np.asarray(s1.body_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sb.body_pos[1]),
                               np.asarray(sb.body_pos[0]), atol=1e-6)
