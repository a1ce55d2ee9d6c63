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

    factories = {
        "search": lambda reservoir=None, tvalue_params=None:
            make_search_env(tvalue_params=tvalue_params),
        "orient": lambda reservoir=None, tvalue_params=None:
            make_orient_env(reservoir=reservoir, tvalue_params=tvalue_params),
        "grasp": lambda reservoir=None, tvalue_params=None:
            make_grasp_sim_env(reservoir=reservoir, tvalue_params=tvalue_params),
        "insert": lambda reservoir=None, tvalue_params=None:
            make_insert_sim_env(reservoir=reservoir),
    }
    # policy dims per stage (building the envs here would settle the Search
    # heap twice; dims are static module constants)
    from ..envs.block_assembly import grasp_sim as _g
    from ..envs.block_assembly import insert_sim as _i
    from ..envs.block_assembly import orient as _o
    from ..envs.block_assembly import search as _s

    dims = {
        "search": (_s.ONE_FRAME_OBS * _s.STACK, _s.ONE_FRAME_STATES * _s.STACK),
        "orient": (_o.ONE_FRAME_OBS * _o.STACK, _o.ONE_FRAME_STATES * _o.STACK),
        "grasp": (_g.ONE_FRAME_OBS * _g.STACK, _g.ONE_FRAME_STATES * _g.STACK),
        "insert": (_i.ONE_FRAME_OBS * _i.STACK, _i.ONE_FRAME_STATES * _i.STACK),
    }
    ckpts = dict(kv.split("=", 1) for kv in args.checkpoints)
    params = {}
    for name in factories:
        num_obs, num_states = dims[name]
        template = networks.init_actor_critic(
            jax.random.PRNGKey(0), num_obs, num_states, 23
        )
        params[name] = (
            load_params(ckpts[name], template) if name in ckpts else template
        )
    results = evaluate_chain(
        factories, params, args.num_envs, args.episodes, args.seed)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
