"""Neighbor-list narrowphase vs the dense reference.

Uses the 12-box mini-heap (forced `neighbor_list=True` — the scene is small
enough to also run dense). Checks:
* every ACTIVE contact the dense path finds is also found by the grid path
  (same (point, collider) pair, same depth) on settling heap states;
* full-step trajectories agree;
* the collision-filter words gate the grid path identically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_segmented_qp import _drop_state, _heap_scene
from seqdex_tpu.sim.simulator import SimConfig, make_sim


def _sims():
    scene = _heap_scene()
    dense = make_sim(scene, SimConfig(max_contacts=96, neighbor_list=False))
    nl = make_sim(scene, SimConfig(max_contacts=96, neighbor_list=True,
                                   nl_candidates=24, nl_group_size=16))
    return dense, nl


def _active_pairs(sim, s):
    from seqdex_tpu.sim.contact import make_narrowphase
    fk_res = sim.fk(s.q, s.qd)
    nf, _ = make_narrowphase(sim.scene, sim.config.max_contacts,
                             neighbor_list=(sim.config.neighbor_list),
                             nl_candidates=sim.config.nl_candidates,
                             nl_group_size=sim.config.nl_group_size)
    c = nf(fk_res.pos, fk_res.quat, s.body_pos, s.body_quat, None, None)
    act = np.asarray(c.active)
    return {(int(p), int(q)): float(d) for p, q, d, a in zip(
        np.asarray(c.pt_idx), np.asarray(c.col_idx), np.asarray(c.depth), act)
        if a}


def test_nl_finds_all_dense_contacts():
    dense, nl = _sims()
    s = _drop_state(dense)
    step = jax.jit(dense.step)
    for i in range(40):
        s = step(s)
        if i % 8 != 0:
            continue
        pd = _active_pairs(dense, s)
        pn = _active_pairs(nl, s)
        missing = {k: v for k, v in pd.items() if k not in pn}
        # grid path must not drop any active contact the dense path found
        assert not missing, (i, missing)
        for k, v in pd.items():
            assert abs(pn[k] - v) < 1e-5, (k, v, pn[k])


def test_nl_trajectory_matches_dense():
    dense, nl = _sims()
    s0 = _drop_state(dense)
    sd, sn = s0, s0
    stepd = jax.jit(dense.step)
    stepn = jax.jit(nl.step)
    for _ in range(30):
        sd = stepd(sd)
        sn = stepn(sn)
    np.testing.assert_allclose(np.asarray(sn.body_pos),
                               np.asarray(sd.body_pos), atol=2e-3)
    assert bool(jnp.all(jnp.isfinite(sn.body_pos)))


def test_nl_collision_filter_gates():
    dense, nl = _sims()
    s = _drop_state(dense)
    B = s.body_pos.shape[0]
    # filter word: box0 (entity 1) vs statics (entity B+1) filtered out
    words = np.zeros(B + 2, dtype=np.int32)
    words[1] = 1
    words[B + 1] = 1
    s = s._replace(collision_filter=jnp.asarray(words))
    from seqdex_tpu.sim.contact import make_narrowphase
    for sim in (dense, nl):
        fk_res = sim.fk(s.q, s.qd)
        nf, _ = make_narrowphase(sim.scene, sim.config.max_contacts,
                                 neighbor_list=sim.config.neighbor_list,
                                 nl_candidates=sim.config.nl_candidates,
                                 nl_group_size=sim.config.nl_group_size)
        c = nf(fk_res.pos, fk_res.quat, s.body_pos, s.body_quat, None,
               jnp.asarray(words))
        act = np.asarray(c.active)
        body_pt = np.asarray(c.body_pt)[act]
        body_col = np.asarray(c.body_col)[act]
        link_col = np.asarray(c.link_col)[act]
        # no active contact may pair box0 with a static collider
        static_side = (body_col < 0) & (link_col < 0)
        assert not np.any((body_pt == 0) & static_side)
