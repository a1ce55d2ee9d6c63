#!/usr/bin/env python
"""Verify the grid narrowphase misses NO dense-path contact at Search scale.

Builds the 132-brick Search scene, settles one heap, then compares the
neighbor-list selection against the exact dense selection on (a) the settled
heap, (b) states along a scripted dig descent into the heap. Also reports
the worst-case number of colliders within reach of any point group — the
lower bound `nl_candidates` must exceed for exact culling.

Run: JAX_PLATFORMS=cpu python scripts/check_nl_exact.py   (or on the chip)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.envs.block_assembly.search import SearchConfig, make_search_env
from seqdex_tpu.sim.contact import make_narrowphase


def active_pairs(nf, fk_res, s):
    c = nf(fk_res.pos, fk_res.quat, s.body_pos, s.body_quat, None, None)
    act = np.asarray(c.active)
    return {(int(p), int(q)): float(d) for p, q, d, a in zip(
        np.asarray(c.pt_idx), np.asarray(c.col_idx), np.asarray(c.depth),
        act) if a}


def main():
    cfg = SearchConfig(heap_pool=1, settle_steps=40)
    env = make_search_env(cfg)
    sim = env.sim
    nf_dense, _ = make_narrowphase(sim.scene, sim.config.max_contacts,
                                   neighbor_list=False)
    nf_grid, _ = make_narrowphase(sim.scene, sim.config.max_contacts,
                                  neighbor_list=True,
                                  nl_candidates=sim.config.nl_candidates,
                                  nl_group_size=sim.config.nl_group_size)
    print("grid shape (G, M, S):", nf_grid.grid_shape, flush=True)

    key = jax.random.PRNGKey(0)
    s = env.reset(key)
    worst_missing = 0
    states = []
    sim_state = s.sim
    states.append(sim_state)
    # scripted dig: drive the arm's z target down into the heap center
    step = jax.jit(sim.step)
    for t in range(30):
        ctrl = sim_state.ctrl.at[1].add(0.012)  # shoulder dip -> descent
        sim_state = step(sim_state._replace(ctrl=ctrl))
        if t % 6 == 0:
            states.append(sim_state)

    for i, st in enumerate(states):
        fk_res = sim.fk(st.q, st.qd)
        pd = active_pairs(nf_dense, fk_res, st)
        pg = active_pairs(nf_grid, fk_res, st)
        missing = {k: v for k, v in pd.items() if k not in pg}
        worst_missing = max(worst_missing, len(missing))
        print(f"state {i}: dense active={len(pd)} grid active={len(pg)} "
              f"missing={len(missing)}", flush=True)
        if missing:
            worst = sorted(missing.items(), key=lambda kv: -kv[1])[:5]
            print("  deepest missing:", worst, flush=True)
    print("RESULT:", "EXACT" if worst_missing == 0 else
          f"MISSING up to {worst_missing} contacts — raise nl_candidates",
          flush=True)
    sys.exit(0 if worst_missing == 0 else 1)


if __name__ == "__main__":
    main()
