#!/usr/bin/env python
"""Round-4 training pipeline (one phase per invocation; run on the chip).

Phases:
  harvest — roll the round-3 GraspSim checkpoint, harvest grasp-terminal
            states into a per-type reservoir (>= TARGET per type) and grasp
            T-value training data; save both to runs/r4_handoff/.
  insert  — LONG InsertSim run (the reference trains this stage 206k epochs,
            `cfg/lego/ppo_continuous_insert.yaml`), seeded from the harvested
            reservoir like the chained evaluation does; time-budgeted.
  search  — first Search training run (reference marker ep_17000,
            `scripts/evaluation.py:113`); 128 envs like the bi-opt forward
            pass (`scripts/bi_optimization.py:113`).
  orient  — Orient continuation from the round-3 resume state.

Every phase writes metrics.jsonl + checkpoints under runs/<phase>_r4 and a
<task>_resume.npz so later phases / rounds can continue.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from seqdex_tpu.cli import config as cfglib
from seqdex_tpu.distributed.checkpoint import (
    Checkpointer, load_params, load_train_state, save_params,
    save_train_state)
from seqdex_tpu.rl import networks
from seqdex_tpu.rl.ppo import PPOConfig, make_ppo
from seqdex_tpu.utils.metrics import MetricsWriter

HANDOFF = "runs/r4_handoff"


def run_training(env, cfg, logdir, task, seconds, resume=None,
                 warm_params=None, log_every=20, save_every=1000,
                 max_epochs=None):
    init, train_epoch, act = make_ppo(env, cfg)
    ts = init(jax.random.PRNGKey(42))
    start_epoch = 0
    if resume and os.path.exists(resume):
        ts = load_train_state(resume, ts)
        start_epoch = int(ts.epoch)
        print(f"resumed {resume} at epoch {start_epoch}", flush=True)
        if warm_params is not None:
            print("warm-start params superseded by the resume state "
                  f"({resume})", flush=True)
    elif warm_params is not None:
        ts = ts._replace(params=warm_params)
    train_epoch = jax.jit(train_epoch)
    ckpt = Checkpointer(logdir, save_every=save_every)
    writer = MetricsWriter(logdir)
    t0 = time.time()
    steps_per_epoch = cfg.num_envs * cfg.horizon
    epoch = start_epoch
    while (time.time() - t0 < seconds
           and (max_epochs is None or epoch < max_epochs)):
        ts, metrics = train_epoch(ts)
        if epoch % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["env_steps_per_sec"] = (
                steps_per_epoch * (epoch + 1 - start_epoch)
                / max(time.time() - t0, 1e-9))
            writer.write(epoch, m)
            print(f"[{task}] epoch {epoch} reward {m['reward_mean']:.3f} "
                  f"success {m.get('success_rate', float('nan')):.3f} "
                  f"fps {m['env_steps_per_sec']:.0f}", flush=True)
            ckpt.maybe_save(ts, epoch, m["reward_mean"], name=task,
                            full_state=True)
        epoch += 1
    save_train_state(os.path.join(logdir, f"{task}_resume.npz"), ts)
    # final params under their own name — never clobber <task>_best.npz
    # (Search/Insert success is rare+noisy; eval wants the true best)
    save_params(os.path.join(logdir, f"{task}_final.npz"), ts.params)
    print(f"[{task}] done at epoch {epoch} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return ts


def grasp_params():
    from seqdex_tpu.envs.block_assembly.grasp_sim import (
        GraspSimConfig, make_grasp_sim_env)
    env = make_grasp_sim_env(GraspSimConfig())
    tmpl = networks.init_actor_critic(
        jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions)
    ck = os.environ.get("GRASP_CKPT",
                        "runs/grasp_r3/BlockAssemblyGraspSim_best.npz")
    return env, load_params(ck, tmpl)


def phase_harvest(args):
    os.makedirs(HANDOFF, exist_ok=True)
    env, params = grasp_params()
    target = int(os.environ.get("HARVEST_TARGET", "128"))
    sampler = None
    succ_all, fail_all = [], []
    for seed in range(12):
        sampler = env.collect_terminal_states(
            params, num_envs=1024, seed=seed, sampler=sampler)
        counts = [sampler.count(t) for t in range(8)]
        print(f"seed {seed}: per-type reservoir fills {counts}", flush=True)
        s, f = env.collect_tvalue_data(params, num_envs=512, seed=100 + seed)
        if len(s):
            succ_all.append(np.asarray(s))
        if len(f):
            fail_all.append(np.asarray(f))
        # save incrementally (a timeout must never lose the harvest)
        sampler.save(os.path.join(HANDOFF, "grasp_terminals.npz"))
        # the hardest type fills ~2/seed (its grasp success is ~0); gate on
        # the SECOND-smallest fill so one untrainable type can't run the
        # clock out
        if sorted(counts)[1] >= target:
            break
    sampler.save(os.path.join(HANDOFF, "grasp_terminals.npz"))
    succ = np.concatenate(succ_all) if succ_all else np.zeros((0, 4))
    fail = np.concatenate(fail_all) if fail_all else np.zeros((0, 4))
    np.savez(os.path.join(HANDOFF, "grasp_tvalue_data.npz"),
             succ=succ, fail=fail)
    summary = {"per_type_fills": [sampler.count(t) for t in range(8)],
               "tvalue_succ": int(len(succ)), "tvalue_fail": int(len(fail))}
    with open(os.path.join(HANDOFF, "harvest.json"), "w") as fh:
        json.dump(summary, fh)
    print("harvest:", summary, flush=True)

    # offline T-value fit on the harvested grasp data (the Orient gate net:
    # block rotation -> grasp-feasibility, `transition_value_trainer.py`)
    if len(succ) >= 64 and len(fail) >= 64:
        from seqdex_tpu.seqdex import tvalue as tv
        ts_t, acc = tv.train_offline(
            np.asarray(succ), np.asarray(fail),
            in_dim=tv.GRASP_INSERT_IN, hidden=tv.GRASP_INSERT_HIDDEN,
            rollouts=4000, seed=1)
        tv.save_tvalue(os.path.join(HANDOFF, "grasp_tvalue.npz"), ts_t.params)
        print(f"grasp T-value val acc {acc:.3f}", flush=True)
        summary["tvalue_val_acc"] = float(acc)
        with open(os.path.join(HANDOFF, "harvest.json"), "w") as fh:
            json.dump(summary, fh)


def phase_insert(args):
    from seqdex_tpu.envs.block_assembly.insert_sim import (
        InsertSimConfig, make_insert_sim_env)
    from seqdex_tpu.seqdex.handoff import GraspTerminalSampler
    res_path = os.path.join(HANDOFF, "grasp_terminals.npz")
    reservoir = (GraspTerminalSampler.load(res_path)
                 if os.path.exists(res_path) else None)
    if reservoir is not None:
        print("insert seeding fills:",
              [reservoir.count(t) for t in range(8)], flush=True)
    env = make_insert_sim_env(InsertSimConfig(), reservoir=reservoir)
    ppo_kwargs = cfglib.ppo_kwargs_from_cfg(
        cfglib.load_cfg("BlockAssemblyInsertSim"))
    ppo_kwargs["num_envs"] = int(os.environ.get("INSERT_ENVS", "2048"))
    cfg = PPOConfig(**ppo_kwargs)
    warm = None
    w_ck = os.environ.get("INSERT_WARM",
                          "runs/insert_r3/BlockAssemblyInsertSim_best.npz")
    if w_ck and os.path.exists(w_ck):
        tmpl = networks.init_actor_critic(
            jax.random.PRNGKey(0), env.num_obs, env.num_states,
            env.num_actions)
        warm = load_params(w_ck, tmpl)
        print(f"insert warm-start from {w_ck}", flush=True)
    run_training(env, cfg, "runs/insert_r4", "BlockAssemblyInsertSim",
                 seconds=int(os.environ.get("INSERT_SECONDS", "8100")),
                 resume="runs/insert_r4/BlockAssemblyInsertSim_resume.npz",
                 warm_params=warm)


def phase_search(args):
    from seqdex_tpu.envs.block_assembly.search import (
        SearchConfig, make_search_env)
    env = make_search_env(SearchConfig())
    ppo_kwargs = cfglib.ppo_kwargs_from_cfg(
        cfglib.load_cfg("BlockAssemblySearch"))
    ppo_kwargs["num_envs"] = int(os.environ.get("SEARCH_ENVS", "128"))
    cfg = PPOConfig(**ppo_kwargs)
    # the reference warm-starts Search from a prior checkpoint
    # (ppo_continuous_retrieve_grasp_v_value_retri.yaml load_checkpoint:
    # True); SEARCH_WARM restores params only (fresh optimizer/LR state),
    # SEARCH_RESUME restores the full train state.
    warm = None
    w_ck = os.environ.get("SEARCH_WARM", "")
    if w_ck and os.path.exists(w_ck):
        tmpl = networks.init_actor_critic(
            jax.random.PRNGKey(0), env.num_obs, env.num_states,
            env.num_actions)
        warm = load_params(w_ck, tmpl)
        print(f"search warm-start from {w_ck}", flush=True)
    run_training(env, cfg, os.environ.get("SEARCH_LOGDIR", "runs/search_r4"),
                 "BlockAssemblySearch",
                 seconds=int(os.environ.get("SEARCH_SECONDS", "4500")),
                 resume=os.environ.get(
                     "SEARCH_RESUME",
                     "runs/search_r4/BlockAssemblySearch_resume.npz"),
                 warm_params=warm, log_every=10, save_every=500,
                 max_epochs=(int(os.environ["SEARCH_MAX_EPOCHS"])
                             if "SEARCH_MAX_EPOCHS" in os.environ else None))


def phase_orient(args):
    from seqdex_tpu.envs.block_assembly.orient import (
        OrientConfig, make_orient_env)
    env = make_orient_env(OrientConfig())
    ppo_kwargs = cfglib.ppo_kwargs_from_cfg(
        cfglib.load_cfg("BlockAssemblyOrient"))
    ppo_kwargs["num_envs"] = int(os.environ.get("ORIENT_ENVS", "2048"))
    cfg = PPOConfig(**ppo_kwargs)
    resume = os.environ.get(
        "ORIENT_RESUME", "runs/orient_r3/BlockAssemblyOrient_resume.npz")
    run_training(env, cfg, "runs/orient_r4", "BlockAssemblyOrient",
                 seconds=int(os.environ.get("ORIENT_SECONDS", "1800")),
                 resume=resume)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["harvest", "insert", "search", "orient"])
    args = ap.parse_args()
    print(f"=== phase {args.phase} on {jax.devices()[0].platform} ===",
          flush=True)
    {"harvest": phase_harvest, "insert": phase_insert,
     "search": phase_search, "orient": phase_orient}[args.phase](args)


if __name__ == "__main__":
    main()
