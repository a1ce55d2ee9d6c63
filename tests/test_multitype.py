"""Multi-type runtime-geometry tables + runtime env-context threading.

Fast tests (no franka compile): table correctness is checked against a
directly-compiled per-type scene on the fixture arm; ctx threading is
checked on the mini env (same mechanism the block-assembly envs use).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.core import builders
from seqdex_tpu.envs.block_assembly import multitype
from seqdex_tpu.envs.mini import MiniConfig, make_mini_env, mini_arm
from seqdex_tpu.sim.scene import OWNER_BODY, compile_scene


def _scene_with(kind):
    return compile_scene(
        mini_arm(2),
        bodies=[builders.lego_brick(kind, name="target")],
        statics=[builders.ground()],
    )


def test_type_tables_match_directly_compiled_scenes():
    """Row t of the union-slot tables must equal the colliders/points/mass a
    scene compiled directly with type t's brick gets (parked entries
    excepted)."""
    union = _scene_with(multitype.UNION_BRICK_KIND)
    tables = multitype.build_type_tables(union)
    b = union.body_index("target")
    col_idx = np.where((np.asarray(union.col_owner_kind) == OWNER_BODY)
                       & (np.asarray(union.col_owner) == b))[0]
    pt_idx = np.where((np.asarray(union.pt_owner_kind) == OWNER_BODY)
                      & (np.asarray(union.pt_owner) == b))[0]

    for t, kind in enumerate(builders.LEGO_TYPES):
        direct = _scene_with(kind)
        db = direct.body_index("target")
        d_col = np.where((np.asarray(direct.col_owner_kind) == OWNER_BODY)
                         & (np.asarray(direct.col_owner) == db))[0]
        d_pt = np.where((np.asarray(direct.pt_owner_kind) == OWNER_BODY)
                        & (np.asarray(direct.pt_owner) == db))[0]
        nc, npts = len(d_col), len(d_pt)
        np.testing.assert_allclose(
            np.asarray(tables.col_size[t])[col_idx[:nc]],
            np.asarray(direct.col_size)[d_col], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tables.col_pos[t])[col_idx[:nc]],
            np.asarray(direct.col_pos)[d_col], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tables.pt_offset[t])[pt_idx[:npts]],
            np.asarray(direct.pt_offset)[d_pt], atol=1e-6)
        # parked extras are far away
        if nc < len(col_idx):
            assert np.all(
                np.asarray(tables.col_pos[t])[col_idx[nc:], 2] < -10)
        if npts < len(pt_idx):
            assert np.all(
                np.asarray(tables.pt_offset[t])[pt_idx[npts:], 2] > 10)
        np.testing.assert_allclose(
            float(tables.inv_mass[t][b]),
            float(direct.body_inv_mass[db]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tables.inv_inertia[t][b]),
            np.asarray(direct.body_inv_inertia[db]), rtol=1e-4)


def test_geom_override_matches_static_path_for_same_type():
    """Simulating with the union slot + type-t overrides must reproduce the
    statically-compiled behavior bit-closely when t == the compiled type —
    proves every override (col_size/pos, pt_offset, mass/inertia) is
    actually consumed by the narrowphase and solver."""
    from seqdex_tpu.sim.simulator import SimConfig, make_sim

    union = _scene_with(multitype.UNION_BRICK_KIND)
    tables = multitype.build_type_tables(union)
    sim = make_sim(union, SimConfig(substeps=1, solver_iterations=4,
                                    max_contacts=16,
                                    stiffness=(20.0,) * 2, damping=(2.0,) * 2,
                                    effort=(10.0,) * 2))
    b = union.body_index("target")
    t_same = builders.LEGO_TYPES.index(multitype.UNION_BRICK_KIND)
    step = jax.jit(sim.step)

    def settle(geom):
        s = sim.init_state()
        s = s._replace(
            geom=geom,
            body_pos=s.body_pos.at[b].set(jnp.asarray([0.5, 0.5, 0.05])),
        )
        for _ in range(40):
            s = step(s)
        return s

    s_static = settle(None)
    s_same = settle(multitype.geom_for_type(tables, t_same))
    np.testing.assert_allclose(np.asarray(s_same.body_pos),
                               np.asarray(s_static.body_pos), atol=1e-5)
    # a different type must actually change the dynamics (different mass /
    # footprint -> different trajectory)
    s_11 = settle(multitype.geom_for_type(
        tables, builders.LEGO_TYPES.index("1x1")))
    assert np.isfinite(np.asarray(s_11.body_pos)).all()
    assert float(jnp.abs(s_11.body_pos[b] - s_static.body_pos[b]).max()) > 1e-4


def test_ctx_runtime_swap_no_recompile():
    """Changing env-ctx VALUES between train epochs must hit the same
    compiled train_epoch (the bi-opt zero-recompile contract)."""
    from seqdex_tpu.rl.ppo import PPOConfig, make_ppo

    env = make_mini_env(MiniConfig())
    cfg = PPOConfig(num_envs=8, horizon=2, num_minibatches=2, mini_epochs=1)
    init, train_epoch, act = make_ppo(env, cfg)
    te = jax.jit(train_epoch)
    ts = init(jax.random.PRNGKey(0))
    ts, m1 = te(ts)
    ts, m1 = te(ts)  # weak-type normalization retrace settles here
    baseline = te._cache_size()
    # swap ctx contents (same structure) -> same compiled program
    ts = ts._replace(env_ctx={"target_shift": jnp.asarray(
        [5.0, 5.0, 0.0], dtype=jnp.float32)})
    ts, m2 = te(ts)
    ts = ts._replace(env_ctx={"target_shift": jnp.asarray(
        [-2.0, 1.0, 0.0], dtype=jnp.float32)})
    ts, m3 = te(ts)
    assert te._cache_size() == baseline, (te._cache_size(), baseline)
    # and the ctx actually reached the env: shifted resets change rewards
    assert np.isfinite(float(m2["reward_mean"]))


def test_ctx_reaches_env_resets():
    env = make_mini_env(MiniConfig())
    ctx_far = {"target_shift": jnp.asarray([3.0, 3.0, 0.0])}
    st = env.reset_ctx(jax.random.PRNGKey(0), ctx_far)
    assert float(st.box_init_pos[0]) > 2.0
    st0 = env.reset(jax.random.PRNGKey(0))
    assert float(st0.box_init_pos[0]) < 1.0
