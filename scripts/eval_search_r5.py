#!/usr/bin/env python
"""Evaluate Search round-5 checkpoints: success rate + reservoir harvest.

Fast chain-head triage: for each candidate checkpoint, run deterministic
eval episodes (the reference prints this table at reset,
`search.py:1292-1302`) and harvest the per-type dug-out reservoir that
feeds Orient (`search.py:1304-1355`). Picks the best checkpoint by eval
success and symlinks/copies it to runs/search_r5/BlockAssemblySearch_eval_best.npz.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.distributed.checkpoint import load_params
from seqdex_tpu.envs.block_assembly.search import SearchConfig, make_search_env
from seqdex_tpu.rl import networks
from seqdex_tpu.seqdex.evaluation import evaluate_stage


def main():
    num_envs = int(os.environ.get("EVAL_NUM_ENVS", "128"))
    episodes = int(os.environ.get("EVAL_EPISODES", "3"))
    cands = os.environ.get("EVAL_CKPTS", "").split(":") if os.environ.get(
        "EVAL_CKPTS") else [
        "runs/search_r5/BlockAssemblySearch_best.npz",
        "runs/search_r5/BlockAssemblySearch_final.npz",
        "runs/search_r5/BlockAssemblySearch_ep14500.npz",
        "runs/search_r5/BlockAssemblySearch_ep12000.npz",
    ]
    env = make_search_env(SearchConfig())
    tmpl = networks.init_actor_critic(
        jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions)
    out = {}
    best_rate, best_ck = -1.0, None
    for ck in cands:
        if not os.path.exists(ck):
            continue
        params = load_params(ck, tmpl)
        # deterministic (rl_games play mode) AND stochastic (the behavior
        # policy the reference's training-time success tables + terminal
        # harvest run under, `search.py:1292-1355`)
        rate_d, count_d, ex_d = evaluate_stage(env, params, num_envs,
                                               episodes)
        rate_s, count_s, ex_s = evaluate_stage(env, params, num_envs,
                                               episodes, stochastic=True)
        out[ck] = {"success_rate_det": rate_d, "success_rate_stoch": rate_s,
                   "episodes": count_d + count_s,
                   "per_type_stoch": ex_s.get("per_type_success")}
        print(json.dumps({"ckpt": ck, **out[ck]}), flush=True)
        rate = max(rate_d, rate_s)
        if rate > best_rate:
            best_rate, best_ck = rate, ck
    out["best"] = {"ckpt": best_ck, "success_rate": best_rate}
    os.makedirs("runs/r5_handoff", exist_ok=True)
    if best_ck:
        import shutil
        shutil.copy(best_ck,
                    "runs/search_r5/BlockAssemblySearch_eval_best.npz")
        # harvest the chain-head reservoir with the winning checkpoint
        params = load_params(best_ck, tmpl)
        sampler = None
        for rnd in range(int(os.environ.get("HARVEST_ROUNDS", "3"))):
            # stochastic: the reference harvests during training rollouts
            # (terminal saves live in reset_idx, `search.py:1304-1355`)
            sampler = env.collect_terminal_states(
                params, num_envs=num_envs, seed=100 + rnd, sampler=sampler,
                stochastic=True)
            counts = [int(sampler.count(t)) for t in range(8)]
            print(f"harvest round {rnd}: per-type fills {counts}", flush=True)
        sampler.save("runs/r5_handoff/search_terminals.npz")
        out["reservoir_per_type"] = counts
    with open("runs/r5_handoff/search_eval.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote runs/r5_handoff/search_eval.json", flush=True)


if __name__ == "__main__":
    main()
