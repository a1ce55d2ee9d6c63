"""Orient heap-clutter scene (reference `..._orient.py:1465`: reset into the
Search terminal heap; `:1655-1695` scripted descent through physics).

Scaled-down build (16 bricks, pool 1) so the CPU suite stays fast; the
full 107-brick variant is what the registry's canonical name builds and
what bench.py measures on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.envs.block_assembly.orient import OrientConfig, make_orient_env


@pytest.fixture(scope="module")
def env():
    return make_orient_env(OrientConfig(
        clutter=True, heap_bricks=16, heap_pool=1, descent_steps=20,
        lego_type="1x2"))


def test_clutter_scene_builds_and_steps(env):
    st = env.reset(jax.random.PRNGKey(0))
    a = jnp.zeros(env.num_actions)
    step = jax.jit(env.step)
    for _ in range(3):
        st, out = step(st, a)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert bool(jnp.all(jnp.isfinite(st.sim.body_pos)))


def test_heap_bricks_settled_in_bin(env):
    st = env.reset(jax.random.PRNGKey(1))
    hp = np.asarray(st.sim.body_pos)[1:17]
    # settled above the table, inside the bin footprint, not exploded
    assert (hp[:, 2] > 0.60).all() and (hp[:, 2] < 0.90).all()
    assert (np.abs(hp[:, 0] - 0.25) < 0.35).all()


def test_descent_lands_pregrasp_above_block(env):
    st = env.reset(jax.random.PRNGKey(2))
    fk = env.sim.fk(st.sim.q, st.sim.qd)
    hb = np.asarray(fk.pos[env.sim.scene.art.link_index("base_link")])
    blk = np.asarray(st.sim.body_pos[0])
    # the physics descent tracked the IK solution into the pile: the hand
    # base ends near the pre-grasp offset (-0.18, 0, +0.22) from the block
    err = hb - (blk + np.asarray([-0.18, 0.0, 0.22]))
    assert np.linalg.norm(err) < 0.15, (hb, blk, err)
