"""Bi-directional optimization CLI — mirror of `scripts/bi_optimization.py`.

    python -m seqdex_tpu.cli.bi_optimization --task BlockAssembly \
        --iterations 10 --logdir runs/bi_opt

Forward: train Search(128) -> Orient(512) -> GraspSim(512) -> InsertSim(512)
(env counts from `scripts/bi_optimization.py:113-116`); backward: re-train
each successor stage with T-value shaping + offline T-value fits.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="BlockAssembly",
                   choices=["BlockAssembly", "ToolPositioning"])
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--epochs_per_stage", type=int, default=500)
    p.add_argument("--tvalue_rollouts", type=int, default=10000)
    p.add_argument("--logdir", default="runs/bi_opt")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--warm_start", action="store_true",
                   help="initialize stage policies from the newest "
                        "runs/<stage>_r*/<task>_best.npz checkpoints")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..seqdex.bi_optimization import BiOptConfig, BiOptimizer, StageSpec

    if args.task == "BlockAssembly":
        from ..envs.block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
        from ..envs.block_assembly.insert_sim import InsertSimConfig, make_insert_sim_env
        from ..envs.block_assembly.orient import OrientConfig, make_orient_env
        from ..envs.block_assembly.search import SearchConfig, make_search_env
        from ..seqdex import tvalue as tvlib

        # env counts from `scripts/bi_optimization.py:113-116`; every factory
        # forwards both the upstream reservoir and the stage's T-value params
        stages = [
            StageSpec("search", lambda reservoir=None, tvalue_params=None:
                      make_search_env(tvalue_params=tvalue_params),
                      128, args.epochs_per_stage,
                      tvalue_in_dim=tvlib.RETRI_GRASP_IN,
                      tvalue_hidden=tvlib.RETRI_GRASP_HIDDEN),
            StageSpec("orient", lambda reservoir=None, tvalue_params=None:
                      make_orient_env(reservoir=reservoir,
                                      tvalue_params=tvalue_params),
                      512, args.epochs_per_stage),
            StageSpec("grasp", lambda reservoir=None, tvalue_params=None:
                      make_grasp_sim_env(reservoir=reservoir,
                                         tvalue_params=tvalue_params),
                      512, args.epochs_per_stage),
            StageSpec("insert", lambda reservoir=None, tvalue_params=None:
                      make_insert_sim_env(reservoir=reservoir), 512,
                      args.epochs_per_stage),
        ]
    else:
        from ..envs.tool_positioning.tool_envs import (
            make_tool_grasp_env,
            make_tool_orient_env,
        )

        stages = [
            StageSpec("tool_grasp", lambda reservoir=None, tvalue_params=None:
                      make_tool_grasp_env(reservoir=reservoir,
                                          tvalue_params=tvalue_params),
                      512, args.epochs_per_stage),
            StageSpec("tool_orient", lambda reservoir=None, tvalue_params=None:
                      make_tool_orient_env(reservoir=reservoir,
                                           tvalue_params=tvalue_params),
                      512, args.epochs_per_stage),
        ]

    opt = BiOptimizer(
        stages,
        BiOptConfig(
            iterations=args.iterations,
            tvalue_rollouts=args.tvalue_rollouts,
            logdir=args.logdir,
            seed=args.seed,
        ),
    )
    if args.warm_start and args.task == "BlockAssembly":
        import glob as _glob
        import os as _os

        import jax as _jax

        from ..distributed.checkpoint import load_params
        from ..rl import networks as _networks

        names = {"search": "BlockAssemblySearch",
                 "orient": "BlockAssemblyOrient",
                 "grasp": "BlockAssemblyGraspSim",
                 "insert": "BlockAssemblyInsertSim"}
        for spec in stages:
            cands = sorted(_glob.glob(
                f"runs/{spec.name}_r*/{names[spec.name]}_best.npz"))
            if not cands:
                continue
            env0 = spec.env_factory()
            tmpl = _networks.init_actor_critic(
                _jax.random.PRNGKey(0), env0.num_obs, env0.num_states,
                env0.num_actions)
            opt.policies[spec.name] = load_params(cands[-1], tmpl)
            print(f"warm-started {spec.name} from {cands[-1]}", flush=True)
            del env0
    policies = opt.run()
    opt.save_reservoirs(args.logdir)
    opt.save_tvalues(args.logdir)
    return policies


if __name__ == "__main__":
    main()
