#!/usr/bin/env python
"""Round-5 chained evaluation.

vs round 4: Search checkpoints come from the corrected-physics retrain
(runs/search_r5b; the r4/r5 heap free-fell from contact starvation — see
search.py max_contacts), the Search stage evaluates/harvests under the
BEHAVIOR policy (stochastic, the distribution the reference's training-time
harvest runs under), and the T-value gates are temperature-calibrated so the
reference's absolute 0.99 threshold is meaningful.

Writes runs/r5_chain_eval.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.distributed.checkpoint import load_params
from seqdex_tpu.rl import networks
from seqdex_tpu.seqdex import tvalue as tvlib


def maybe_load(paths, template):
    for path in paths:
        if os.path.exists(path):
            print(f"loading {path}", flush=True)
            return load_params(path, template), path
    print(f"missing {paths} — fresh params", flush=True)
    return template, None


def main():
    num_envs = int(os.environ.get("EVAL_NUM_ENVS", "256"))
    episodes = int(os.environ.get("EVAL_EPISODES", "2"))
    collect_target = int(os.environ.get("EVAL_COLLECT_TARGET", "100"))
    out = {}

    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig, make_grasp_sim_env)
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig, make_insert_sim_env)
    from seqdex_tpu.envs.block_assembly.orient import (
        OrientConfig, make_orient_env)
    from seqdex_tpu.envs.block_assembly.search import (
        SearchConfig, make_search_env)
    from seqdex_tpu.seqdex.evaluation import evaluate_chain

    search_envs = int(os.environ.get("EVAL_SEARCH_ENVS", "64"))

    factories = {
        "search": lambda reservoir=None, tvalue_params=None: make_search_env(
            SearchConfig(), tvalue_params=tvalue_params),
        "orient": lambda reservoir=None, tvalue_params=None: make_orient_env(
            OrientConfig(), reservoir=reservoir, tvalue_params=tvalue_params),
        "grasp": lambda reservoir=None, tvalue_params=None: make_grasp_sim_env(
            GraspSimConfig(), reservoir=reservoir,
            tvalue_params=tvalue_params),
        "insert": lambda reservoir=None, tvalue_params=None:
            make_insert_sim_env(InsertSimConfig(), reservoir=reservoir),
    }
    params = {}
    loaded = {}
    ckpts = {
        "search": ["runs/search_r5b/BlockAssemblySearch_best.npz",
                   "runs/search_r5/BlockAssemblySearch_best.npz"],
        "orient": ["runs/orient_r4/BlockAssemblyOrient_best.npz",
                   "runs/orient_r3/BlockAssemblyOrient_best.npz"],
        "grasp": ["runs/grasp_r4/BlockAssemblyGraspSim_best.npz",
                  "runs/grasp_r3/BlockAssemblyGraspSim_best.npz"],
        "insert": ["runs/insert_r5/BlockAssemblyInsertSim_best.npz",
                   "runs/insert_r4/BlockAssemblyInsertSim_best.npz"],
    }
    for name in factories:
        env0 = factories[name]()
        tmpl = networks.init_actor_critic(
            jax.random.PRNGKey(0), env0.num_obs, env0.num_states,
            env0.num_actions)
        del env0
        params[name], loaded[name] = maybe_load(ckpts[name], tmpl)
    out["checkpoints_loaded"] = loaded

    # trained T-value gates — temperature-calibrated r5 versions first
    tvalues = {}
    gate_paths = {
        "orient": (["runs/r5_handoff/grasp_tvalue.npz",
                    "runs/r4_handoff/grasp_tvalue.npz"],
                   tvlib.GRASP_INSERT_IN, tvlib.GRASP_INSERT_HIDDEN),
        "grasp": (["runs/r5_handoff/insert_tvalue.npz",
                   "runs/r4_handoff/insert_tvalue.npz"],
                  tvlib.GRASP_INSERT_IN, tvlib.GRASP_INSERT_HIDDEN),
        "search": (["runs/r5_handoff/retri_tvalue.npz",
                    "runs/r4_handoff/retri_tvalue.npz"],
                   tvlib.RETRI_GRASP_IN, tvlib.RETRI_GRASP_HIDDEN),
    }
    gate_loaded = {}
    for name, (paths, in_dim, hidden) in gate_paths.items():
        for path in paths:
            if os.path.exists(path):
                tvalues[name] = tvlib.load_tvalue(path, in_dim, hidden)
                gate_loaded[name] = path
                break
    out["tvalue_gates"] = gate_loaded

    common = dict(num_envs=num_envs, episodes=episodes,
                  collect_envs=search_envs, collect_target=collect_target,
                  stochastic_stages=("search",))
    if os.environ.get("SKIP_CHAIN", "0") != "1":
        print("=== ungated chain ===", flush=True)
        out["chain_ungated"] = evaluate_chain(factories, params, **common)
        if tvalues:
            print("=== T-value-gated chain ===", flush=True)
            out["chain_gated"] = evaluate_chain(
                factories, params, stage_tvalues=tvalues, **common)

    # --- single-scene GUI-analog chain ---
    try:
        from seqdex_tpu.envs.block_assembly.chain_eval import (
            ChainEvalConfig, OBS_DIMS, STACKS, make_chain_eval_env)
        from seqdex_tpu.seqdex.evaluation import evaluate_gui_chain

        env = make_chain_eval_env(ChainEvalConfig())
        policies = {}
        for phase, dim in OBS_DIMS.items():
            no = dim * STACKS[phase]
            tmpl = networks.init_actor_critic(
                jax.random.PRNGKey(1), no, no, env.num_actions)
            src = {"grasp": "grasp", "insert": "insert",
                   "dig": "search", "spin": "orient"}.get(phase)
            if (src and loaded.get(src)
                    and jax.tree.map(lambda x: x.shape, tmpl.actor)
                    == jax.tree.map(lambda x: x.shape, params[src].actor)):
                policies[phase] = tmpl._replace(
                    actor=params[src].actor, log_std=params[src].log_std)
            else:
                policies[phase] = tmpl
        rate = evaluate_gui_chain(env, policies, num_envs=16, episodes=2)
        out["gui_chain_success_rate"] = rate
    except Exception as e:  # noqa: BLE001 — report, don't lose the chain JSON
        out["gui_chain_error"] = repr(e)

    os.makedirs("runs", exist_ok=True)
    with open("runs/r5_chain_eval.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}, indent=1))
    print("wrote runs/r5_chain_eval.json", flush=True)


if __name__ == "__main__":
    main()
