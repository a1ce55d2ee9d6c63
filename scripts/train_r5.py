#!/usr/bin/env python
"""Round-5 training pipeline (one phase per invocation; run on the chip).

Phases (VERDICT r4 "Next round" items):
  search   — finish the Search run to the reference's 17k-epoch marker
             (`scripts/evaluation.py:113`), resuming runs/search_r5.
  harvest  — TYPE-BALANCED grasp-terminal harvest (oversample the starved
             curve-soft types via GraspSimConfig.type_weights) + 10x the
             Orient-gate T-value dataset; fit the gate with temperature
             calibration so the reference's absolute 0.99 confidence gate
             (`..._orient.py:1201-1203`) is meaningful on our logit scale.
  insert   — continue InsertSim from the r4 resume state toward the
             reference's 206k-epoch budget, seeded from the balanced
             reservoir.
  tstar    — ToolPositioningChainTSTAR with a grasp-competent warm start so
             probe labels contain both classes (`..._chain_tstar.py:1666-1735`).

Artifacts under runs/r5_handoff/ and runs/<phase>_r5/.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.cli import config as cfglib
from seqdex_tpu.distributed.checkpoint import load_params
from seqdex_tpu.rl import networks
from seqdex_tpu.rl.ppo import PPOConfig

from train_r4 import run_training  # noqa: E402  (same dir)

HANDOFF = "runs/r5_handoff"


def phase_search(args):
    from seqdex_tpu.envs.block_assembly.search import (
        SearchConfig, make_search_env)
    env = make_search_env(SearchConfig())
    ppo_kwargs = cfglib.ppo_kwargs_from_cfg(
        cfglib.load_cfg("BlockAssemblySearch"))
    ppo_kwargs["num_envs"] = int(os.environ.get("SEARCH_ENVS", "128"))
    cfg = PPOConfig(**ppo_kwargs)
    run_training(env, cfg, "runs/search_r5", "BlockAssemblySearch",
                 seconds=int(os.environ.get("SEARCH_SECONDS", "900")),
                 resume="runs/search_r5/BlockAssemblySearch_resume.npz",
                 log_every=10, save_every=500,
                 max_epochs=int(os.environ.get("SEARCH_MAX_EPOCHS", "17000")))


def phase_harvest(args):
    """Type-balanced grasp terminals + 10x T-value data + calibrated gate."""
    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig, make_grasp_sim_env)
    from seqdex_tpu.seqdex import tvalue as tv
    from seqdex_tpu.seqdex.handoff import GraspTerminalSampler

    os.makedirs(HANDOFF, exist_ok=True)
    target = int(os.environ.get("HARVEST_TARGET", "200"))
    data_target = int(os.environ.get("TVALUE_DATA_TARGET", "30000"))
    ck = os.environ.get("GRASP_CKPT",
                        "runs/grasp_r3/BlockAssemblyGraspSim_best.npz")

    # start from the r4 reservoir (keep its fills), balance the gaps
    res_path = os.path.join("runs/r4_handoff", "grasp_terminals.npz")
    sampler = (GraspTerminalSampler.load(res_path)
               if os.path.exists(res_path) else None)

    def fills(s):
        return [int(s.count(t)) for t in range(8)] if s else [0] * 8

    env = make_grasp_sim_env(GraspSimConfig())
    params = load_params(ck, networks.init_actor_critic(
        jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions))

    succ_all, fail_all = [], []
    prev = np.load(os.path.join("runs/r4_handoff", "grasp_tvalue_data.npz"))
    if len(prev["succ"]):
        succ_all.append(prev["succ"])
    if len(prev["fail"]):
        fail_all.append(prev["fail"])

    env_w = None  # weighted env built lazily against current gaps
    for seed in range(int(os.environ.get("HARVEST_SEEDS", "40"))):
        c = np.asarray(fills(sampler), dtype=np.float64)
        need = np.maximum(target - c, 0.0)
        n_rows = sum(len(x) for x in succ_all) + sum(len(x) for x in fail_all)
        if need.sum() == 0 and n_rows >= data_target:
            break
        if need.sum() > 0:
            # oversample starved types proportionally to the deficit (floor
            # keeps every type present so the T-value data stays diverse)
            w = tuple((need / max(need.sum(), 1e-9) + 0.02).tolist())
            env_w = make_grasp_sim_env(GraspSimConfig(type_weights=w))
        else:
            env_w = env
        sampler = env_w.collect_terminal_states(
            params, num_envs=1024, seed=seed, sampler=sampler)
        s, f = env_w.collect_tvalue_data(params, num_envs=1024,
                                         seed=1000 + seed)
        if len(s):
            succ_all.append(np.asarray(s))
        if len(f):
            fail_all.append(np.asarray(f))
        sampler.save(os.path.join(HANDOFF, "grasp_terminals.npz"))
        print(f"seed {seed}: fills {fills(sampler)} "
              f"tvalue rows {sum(len(x) for x in succ_all)}+"
              f"{sum(len(x) for x in fail_all)}", flush=True)

    sampler.save(os.path.join(HANDOFF, "grasp_terminals.npz"))
    succ = np.concatenate(succ_all) if succ_all else np.zeros((0, 4))
    fail = np.concatenate(fail_all) if fail_all else np.zeros((0, 4))
    np.savez(os.path.join(HANDOFF, "grasp_tvalue_data.npz"),
             succ=succ, fail=fail)
    summary = {"per_type_fills": fills(sampler),
               "tvalue_succ": int(len(succ)), "tvalue_fail": int(len(fail))}
    print("harvest:", summary, flush=True)

    # gate fit (reference bar: 0.834 embedded val acc,
    # `transition_value_trainer.py:255`) + temperature calibration so the
    # 0.99 threshold keeps checkpoint-grade terminals instead of none
    if len(succ) >= 256 and len(fail) >= 256:
        rng = np.random.default_rng(0)
        rng.shuffle(succ)
        rng.shuffle(fail)
        ts_t, acc = tv.train_offline(
            succ, fail, in_dim=tv.GRASP_INSERT_IN,
            hidden=tv.GRASP_INSERT_HIDDEN,
            rollouts=int(os.environ.get("TVALUE_ROLLOUTS", "20000")),
            seed=1, cfg=tv.TValueTrainConfig(validation=500))
        nval = min(500, len(succ) // 4, len(fail) // 4)
        val_x = np.concatenate([succ[:nval], fail[:nval]])
        val_y = np.concatenate([np.ones(nval), np.zeros(nval)])
        before = tv.calibration_report(ts_t.params, val_x, val_y)
        temp = tv.fit_temperature(ts_t.params, val_x, val_y)
        calibrated = tv.apply_temperature(ts_t.params, temp)
        after = tv.calibration_report(calibrated, val_x, val_y)
        tv.save_tvalue(os.path.join(HANDOFF, "grasp_tvalue.npz"), calibrated)
        summary.update(tvalue_val_acc=float(acc), temperature=float(temp),
                       calibration_before=before, calibration_after=after)
        print(f"gate val acc {acc:.3f} T={temp:.3f} "
              f"succ>0.99 {before['frac_succ_above_gate']:.3f}->"
              f"{after['frac_succ_above_gate']:.3f} "
              f"fail>0.99 {after['frac_fail_above_gate']:.3f}", flush=True)
    with open(os.path.join(HANDOFF, "harvest.json"), "w") as fh:
        json.dump(summary, fh, indent=1)


def phase_insert(args):
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig, make_insert_sim_env)
    from seqdex_tpu.seqdex.handoff import GraspTerminalSampler
    res_path = os.path.join(HANDOFF, "grasp_terminals.npz")
    if not os.path.exists(res_path):
        res_path = os.path.join("runs/r4_handoff", "grasp_terminals.npz")
    reservoir = (GraspTerminalSampler.load(res_path)
                 if os.path.exists(res_path) else None)
    if reservoir is not None:
        print("insert seeding fills:",
              [int(reservoir.count(t)) for t in range(8)], flush=True)
    env = make_insert_sim_env(InsertSimConfig(), reservoir=reservoir)
    ppo_kwargs = cfglib.ppo_kwargs_from_cfg(
        cfglib.load_cfg("BlockAssemblyInsertSim"))
    ppo_kwargs["num_envs"] = int(os.environ.get("INSERT_ENVS", "2048"))
    cfg = PPOConfig(**ppo_kwargs)
    # continue the r4 curve: copy its resume state into the r5 logdir once
    r5_resume = "runs/insert_r5/BlockAssemblyInsertSim_resume.npz"
    if not os.path.exists(r5_resume):
        os.makedirs("runs/insert_r5", exist_ok=True)
        r4 = "runs/insert_r4/BlockAssemblyInsertSim_resume.npz"
        if os.path.exists(r4):
            import shutil
            shutil.copy(r4, r5_resume)
    run_training(env, cfg, "runs/insert_r5", "BlockAssemblyInsertSim",
                 seconds=int(os.environ.get("INSERT_SECONDS", "1800")),
                 resume=r5_resume)


def phase_tstar(args):
    """TSTAR artifact with a grasp-competent policy so probe labels contain
    BOTH classes (VERDICT r4 weak #3): warm-start the chain policy from the
    trained tool-grasp checkpoint when one exists."""
    import subprocess
    warm = ""
    for cand in ("runs/bi_opt/tool_grasp_final.npz",
                 "runs/tool_grasp/ToolPositioningGrasp_best.npz"):
        if os.path.exists(cand):
            warm = cand
            break
    cmd = [sys.executable, "-m", "seqdex_tpu.cli.train",
           "--task", "ToolPositioningChainTSTAR", "--logdir", "runs/tstar_r5",
           "--resume", "runs/tstar_r5/ToolPositioningChainTSTAR_resume.npz",
           "--max_iterations", os.environ.get("TSTAR_ITERS", "2000"),
           "--log_every", "25", "--save_every", "400"]
    if warm:
        cmd += ["--checkpoint", warm]
    os.makedirs("runs/tstar_r5", exist_ok=True)
    print(" ".join(cmd), flush=True)
    rc = subprocess.call(cmd)
    print(f"tstar rc={rc}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["search", "harvest", "insert", "tstar"])
    args = ap.parse_args()
    print(f"=== r5 phase {args.phase} on {jax.devices()[0].platform} ===",
          flush=True)
    {"search": phase_search, "harvest": phase_harvest,
     "insert": phase_insert, "tstar": phase_tstar}[args.phase](args)


if __name__ == "__main__":
    main()
