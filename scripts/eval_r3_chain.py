#!/usr/bin/env python
"""End-of-round chained evaluation: loads this round's trained stage
checkpoints, runs `evaluate_chain` (per-type success + end-to-end product)
and `evaluate_gui_chain` (single-scene retry state machine with the
per-phase collision-filter/effort switching), and writes the JSON summary
to runs/r3_chain_eval.json.

Stages without a trained checkpoint this round (dig/spin policies use the
GUI obs protocols) fall back to freshly-initialized policies — reported
as-is; the metric is honest, not inflated.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.distributed.checkpoint import load_params
from seqdex_tpu.rl import networks


def maybe_load(path, template):
    if os.path.exists(path):
        print(f"loading {path}")
        return load_params(path, template), True
    print(f"missing {path} — fresh params")
    return template, False


def main():
    num_envs = int(os.environ.get("EVAL_NUM_ENVS", "256"))
    episodes = int(os.environ.get("EVAL_EPISODES", "2"))
    out = {}

    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig, make_grasp_sim_env)
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig, make_insert_sim_env)
    from seqdex_tpu.envs.block_assembly.orient import (
        OrientConfig, make_orient_env)
    from seqdex_tpu.seqdex.evaluation import evaluate_chain

    factories = {
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
    dims = {"orient": (186, 564), "grasp": (396, 564), "insert": (75, 188)}
    ckpts = {
        "orient": "runs/orient_r3/BlockAssemblyOrient_best.npz",
        "grasp": "runs/grasp_r3/BlockAssemblyGraspSim_best.npz",
        "insert": "runs/insert_r3/BlockAssemblyInsertSim_best.npz",
    }
    for name, (no, ns) in dims.items():
        tmpl = networks.init_actor_critic(jax.random.PRNGKey(0), no, ns, 23)
        params[name], loaded[name] = maybe_load(ckpts[name], tmpl)
    out["checkpoints_loaded"] = loaded

    res = evaluate_chain(factories, params, num_envs=num_envs,
                         episodes=episodes, collect_envs=64)
    out["chain"] = res

    # --- single-scene GUI-analog chain (dig/spin policies fresh) ---
    try:
        from seqdex_tpu.envs.block_assembly.chain_eval import (
            ChainEvalConfig, OBS_DIMS, make_chain_eval_env)
        from seqdex_tpu.seqdex.evaluation import evaluate_gui_chain

        env = make_chain_eval_env(ChainEvalConfig())
        policies = {}
        for phase, dim in OBS_DIMS.items():
            stack = 1 if phase == "insert" else 3
            tmpl = networks.init_actor_critic(
                jax.random.PRNGKey(1), dim * stack, dim * stack, 23)
            src = {"grasp": "grasp", "insert": "insert"}.get(phase)
            if src and loaded[src] and dim * stack == dims[src][0]:
                policies[phase] = params[src]
            else:
                policies[phase] = tmpl
        rate = evaluate_gui_chain(env, policies,
                                  num_envs=int(os.environ.get(
                                      "EVAL_GUI_ENVS", "8")),
                                  episodes=1)
        out["gui_chain_success_rate"] = rate
    except Exception as e:  # pragma: no cover
        out["gui_chain_error"] = f"{type(e).__name__}: {e}"

    os.makedirs("runs", exist_ok=True)
    with open("runs/r3_chain_eval.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
