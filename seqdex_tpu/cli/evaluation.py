"""Chained evaluation CLI — mirror of `scripts/evaluation.py`.

    python -m seqdex_tpu.cli.evaluation --task BlockAssembly \
        --checkpoints search=... orient=... grasp=... insert=... --num_envs 256

Loads the four sub-policy checkpoints and reports per-stage + chain success
(counted at Insert, `scripts/evaluation.py:110-119`).
"""

from __future__ import annotations

import argparse
import json

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="BlockAssembly")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--episodes", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--checkpoints", nargs="*", default=[],
        help="stage=path.npz pairs (stages: search orient grasp insert)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..distributed.checkpoint import load_params
    from ..envs.block_assembly.grasp_sim import make_grasp_sim_env
    from ..envs.block_assembly.insert_sim import make_insert_sim_env
    from ..envs.block_assembly.orient import make_orient_env
    from ..envs.block_assembly.search import make_search_env
    from ..rl import networks
    from ..seqdex.evaluation import evaluate_chain

    envs = {
        "search": make_search_env(),
        "orient": make_orient_env(),
        "grasp": make_grasp_sim_env(),
        "insert": make_insert_sim_env(),
    }
    ckpts = dict(kv.split("=", 1) for kv in args.checkpoints)
    params = {}
    for name, env in envs.items():
        template = networks.init_actor_critic(
            jax.random.PRNGKey(0), env.num_obs, env.num_states, env.num_actions
        )
        params[name] = (
            load_params(ckpts[name], template) if name in ckpts else template
        )
    results = evaluate_chain(envs, params, args.num_envs, args.episodes, args.seed)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
