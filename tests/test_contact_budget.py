"""Contact-budget adequacy: a pile whose support demand exceeds the global
top-K budget free-falls (unsupported bricks sink through everything); an
adequate budget holds it at rest.

This is the round-5 root cause of Search's at-episode-end 0%: the 132-brick
heap carries ~500 active support contacts at rest, and `max_contacts=192`
silently dropped most of them — the heap collapsed through the table from
the first step of every episode (while per-step emergence metrics still
flickered from the post-reset transient). PhysX never exhibits this mode:
it keeps per-pair manifolds in an 8M-pair buffer (`utils/config.py:204`),
so scene-level budgets must scale with pile size here.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_segmented_qp import _heap_scene
from seqdex_tpu.sim.simulator import SimConfig, make_sim

N_BOXES = 36  # 3 x 4 x 3 layers; ~5 support contacts each at rest


def _pile_state(sim, seed=0):
    s = sim.init_state()
    rng = np.random.RandomState(seed)
    pos = []
    for i in range(N_BOXES):
        x = 0.25 + 0.065 * (i % 3) + rng.uniform(-4e-3, 4e-3)
        y = -0.1 + 0.065 * ((i // 3) % 4) + rng.uniform(-4e-3, 4e-3)
        z = 0.04 + 0.065 * (i // 12)
        pos.append([x, y, z])
    return s._replace(body_pos=jnp.asarray(pos, dtype=jnp.float32))


def _settle(max_contacts, steps=80):
    sim = make_sim(_heap_scene(n_boxes=N_BOXES),
                   SimConfig(max_contacts=max_contacts))
    s = _pile_state(sim)
    step = jax.jit(sim.step)
    for _ in range(steps):
        s = step(s)
    return np.asarray(s.body_pos)


def test_starved_budget_drops_the_pile():
    """The failure mode this file exists for: a budget far below the pile's
    support demand lets bricks sink through the ground."""
    pos = _settle(max_contacts=12)
    assert (pos[:, 2] < -0.05).any(), (
        "expected the starved pile to lose support (if this now holds, the "
        "narrowphase gained per-pair manifolds — update the budgets note)")


def test_adequate_budget_holds_the_pile():
    pos = _settle(max_contacts=512)
    z = pos[:, 2]
    assert np.isfinite(pos).all()
    # every box rests at or above ground level (box half = 0.03, allow
    # compliance penetration), none launched
    assert (z > 0.02).all(), f"boxes below ground: {z.min()}"
    assert (z < 0.5).all()


def test_scene_budget_covers_rest_demand():
    """Count the pile's actual active contacts with an oversized probe and
    assert the production-style budget rule (demand + margin) holds."""
    sim = make_sim(_heap_scene(n_boxes=N_BOXES),
                   SimConfig(max_contacts=1024))
    s = _pile_state(sim)
    step = jax.jit(sim.step)
    for _ in range(80):
        s = step(s)
    from seqdex_tpu.sim.contact import make_narrowphase
    nf, _ = make_narrowphase(sim.scene, 1024)
    fk = sim.fk(s.q, s.qd)
    cs = nf(fk.pos, fk.quat, s.body_pos, s.body_quat, None, None)
    active = int(jnp.sum(cs.depth > 0))
    assert active > N_BOXES * 2, "pile should rest on real contacts"
    assert active < 512, "512 budget must cover this pile with margin"
