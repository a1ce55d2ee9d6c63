"""Chained evaluation — play the 4 sub-policies in sequence.

TPU-native re-implementation of `scripts/evaluation.py:106-130`: load the
four stage checkpoints, run each sub-task in chain order with its
predecessor's terminal states feeding the next reset distribution, and count
success at the Insert stage.
"""

from __future__ import annotations

import json
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..rl import networks


def evaluate_stage(env, params, num_envs: int, episodes: int, seed: int = 0,
                   num_types: int = 8, stochastic: bool = False):
    """Policy rollouts; returns (success_rate, episode_count, extras).
    extras carries per-lego-type success rates when the env emits
    `terminal_type` (the reference prints a per-type success table at
    reset, `search.py:1292-1302`). Deterministic (mu) by default — the
    rl_games play mode; `stochastic=True` samples the behavior policy, the
    distribution the reference's training-time success tables and terminal
    harvests are measured under (`search.py:1292-1355`)."""
    def act(obs, k):
        if stochastic:
            action, _, _ = networks.sample_action(params, obs, k)
            return action
        return networks.actor_mu(params, obs)

    step = jax.jit(lambda s, obs, k: jax.vmap(env.step)(s, act(obs, k)))
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    obs = state.obs_stack.reshape(num_envs, -1)
    successes, count = 0.0, 0.0
    t_succ = np.zeros(num_types)
    t_count = np.zeros(num_types)
    akey = jax.random.PRNGKey(seed + 7777)
    for _ in range(env.episode_length * episodes):
        akey, k = jax.random.split(akey)
        state, out = step(state, obs, k)
        obs = out.obs
        done = np.asarray(out.done, dtype=np.float32)
        succ = np.asarray(out.info["successes"])
        successes += float((succ * done).sum())
        count += float(done.sum())
        if "terminal_type" in out.info:
            t = np.asarray(out.info["terminal_type"]).astype(int)
            np.add.at(t_count, t, done)
            np.add.at(t_succ, t, succ * done)
    extras = {}
    if t_count.sum() > 0:
        extras["per_type_success"] = [
            round(float(t_succ[i] / max(t_count[i], 1.0)), 4)
            for i in range(num_types)
        ]
        extras["per_type_episodes"] = [int(c) for c in t_count]
    return successes / max(count, 1.0), count, extras


def evaluate_gui_chain(env, policies: Dict[str, object], num_envs: int = 16,
                       episodes: int = 2, seed: int = 0, log=print):
    """Single-scene chained assembly eval on the `BlockAssemblyGUI` analog
    (`envs/block_assembly/chain_eval.py`): the four sub-policies drive their
    phases (selected per env by the env's retry state machine), success =
    the brick inserted on the socket (`gui.py:2755-2775` outer loop).

    policies: {"dig","spin","grasp","insert"} -> ActorCriticParams with the
    per-phase obs widths (65*3, 62*3, 132*3, 75).
    """
    order = ("dig", "spin", "grasp", "insert")

    def policy_action(info):
        mus = [
            networks.actor_mu(policies[n], info[f"obs_{n}"]) for n in order
        ]
        phase = info["phase"]  # (N,)
        stacked = jnp.stack(mus)  # (4, N, A)
        return jnp.take_along_axis(
            stacked, phase[None, :, None], axis=0)[0]

    step = jax.jit(lambda s, a: jax.vmap(env.step)(s, a))
    keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    # bootstrap with zero action; phase info arrives with the first step
    action = jnp.zeros((num_envs, env.num_actions))
    inserted, count = 0.0, 0.0
    t_ins = np.zeros(8)
    t_cnt = np.zeros(8)
    for _ in range(env.episode_length * episodes):
        state, out = step(state, action)
        action = policy_action(out.info)
        done = np.asarray(out.done, dtype=np.float32)
        ins = np.asarray(out.info["inserted"])
        inserted += float((ins * done).sum())
        count += float(done.sum())
        if "terminal_type" in out.info:
            t = np.asarray(out.info["terminal_type"]).astype(int)
            np.add.at(t_cnt, t, done)
            np.add.at(t_ins, t, ins * done)
    rate = inserted / max(count, 1.0)
    rec = {"gui_chain_success_rate": rate, "episodes": count}
    if t_cnt.sum() > 0:
        rec["per_type_success"] = [
            round(float(t_ins[i] / max(t_cnt[i], 1.0)), 4) for i in range(8)]
        rec["per_type_episodes"] = [int(c) for c in t_cnt]
    log(json.dumps(rec))
    return rate


def evaluate_chain(
    stage_factories: Dict[str, object],
    stage_params: Dict[str, object],
    num_envs: int = 256,
    episodes: int = 4,
    seed: int = 0,
    log=print,
    collect_envs: int = 64,
    stage_tvalues: Dict[str, object] = None,
    collect_target: int = 100,
    collect_max_rounds: int = 8,
    stochastic_stages: Sequence[str] = (),
):
    """Run the chain Search -> Orient -> GraspSim -> InsertSim with REAL
    state flow: each stage's terminal-state reservoir (harvested from its own
    evaluation rollouts) seeds the next stage's reset distribution — the
    in-memory analog of the reference's pickle handoff
    (`scripts/evaluation.py:106-130`, terminal pickles `search.py:1304-1355`).

    stage_factories: ordered {name: factory(reservoir=, tvalue_params=)}.

    Reported metrics: per-stage conditional success (resets drawn from the
    predecessor's terminals), `insert_success_rate` (the reference's counted
    metric, `scripts/evaluation.py:110-119`), and `chain_success_rate` — the
    end-to-end estimate = product of the conditional stage rates (a stage
    that leaves its reservoir empty zeroes everything downstream).
    """
    results = {}
    names = list(stage_factories)
    reservoir = None
    chain_rate = 1.0
    stage_tvalues = stage_tvalues or {}
    for i, name in enumerate(names):
        # the reference plays every sub-task with use_t_value=True
        # (`scripts/evaluation.py:110-119`) — trained T-value params gate
        # terminal harvesting/success in the stage envs when provided
        env = stage_factories[name](reservoir=reservoir,
                                    tvalue_params=stage_tvalues.get(name))
        stoch = name in stochastic_stages
        rate, count, extras = evaluate_stage(
            env, stage_params[name], num_envs, episodes, seed,
            stochastic=stoch)
        handed_off = reservoir is not None
        results[name] = {
            "success_rate": rate,
            "episodes": count,
            "resets_from_upstream": bool(handed_off),
            "tvalue_gated": name in stage_tvalues,
            "stochastic": stoch,
            **extras,
        }
        chain_rate *= rate
        reservoir = None
        if i < len(names) - 1 and env.collect_terminal_states is not None:
            # harvest until per-type fills reach collect_target (conditional
            # rates over 1-4-sample reset distributions are noise)
            for rnd in range(collect_max_rounds):
                kw = {"stochastic": True} if stoch else {}
                reservoir = env.collect_terminal_states(
                    stage_params[name], num_envs=min(num_envs, collect_envs),
                    seed=seed + 1000 * rnd, sampler=reservoir, **kw)
                counts = (np.asarray(reservoir.res.count)
                          if hasattr(reservoir, "res") else np.zeros(1))
                if counts.min() >= collect_target:
                    break
            fill = int(counts.sum())
            results[name]["reservoir_fill"] = fill
            results[name]["reservoir_per_type"] = [int(c) for c in counts]
            if fill == 0:
                reservoir = None
        log(json.dumps({"stage": name, **results[name]}))
    results["insert_success_rate"] = results[names[-1]]["success_rate"]
    results["chain_success_rate"] = chain_rate
    return results
