"""Task registry — name -> env factory.

Replaces `utils/parse_task.py:37-218` (the `eval(args.task)(cfg, ...)`
construction): a plain dict of factories keyed by the reference task names,
so `--task BlockAssemblyGraspSim` CLI invocations resolve identically.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def make(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown task '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)


def available():
    return sorted(_REGISTRY)


def _populate():
    from .block_assembly.grasp_sim import GraspSimConfig, make_grasp_sim_env
    from .block_assembly.insert_sim import InsertSimConfig, make_insert_sim_env
    from .block_assembly.orient import OrientConfig, make_orient_env
    from .block_assembly.search import SearchConfig, make_search_env

    import os

    # reference scene budget by default for the canonical task names
    # (`..._orient.py:1465` heap, `..._insert_sim.py:750-756,981-985`
    # studded plate + parked bricks); SEQDEX_LITE=1 reverts to the clean
    # scenes (fast CI / quick smoke runs)
    _lite = os.environ.get("SEQDEX_LITE", "0") == "1"

    _REGISTRY.setdefault(
        "BlockAssemblyGraspSim",
        lambda cfg=None, **kw: make_grasp_sim_env(cfg or GraspSimConfig(**kw)),
    )
    _REGISTRY.setdefault(
        "BlockAssemblyInsertSim",
        lambda cfg=None, **kw: make_insert_sim_env(
            cfg or InsertSimConfig(**({} if _lite else
                                      {"socket": "studded",
                                       "parked_bricks": True}) | kw)),
    )
    _REGISTRY.setdefault(
        "BlockAssemblyOrient",
        lambda cfg=None, **kw: make_orient_env(
            cfg or OrientConfig(**({} if _lite else {"clutter": True}) | kw)),
    )
    _REGISTRY.setdefault(
        "BlockAssemblySearch",
        lambda cfg=None, **kw: make_search_env(cfg or SearchConfig(**kw)),
    )

    from .tool_positioning.tool_envs import (
        make_tool_chain_env,
        make_tool_chain_pure_rl_env,
        make_tool_grasp_env,
        make_tool_orient_env,
    )

    _REGISTRY.setdefault("ToolPositioningGrasp", lambda **kw: make_tool_grasp_env(**kw))
    _REGISTRY.setdefault("ToolPositioningOrient", lambda **kw: make_tool_orient_env(**kw))
    # ours-full: perturbations + ContactSLAMer belief-state obs
    # (`..._chain.py:1441-1454`)
    _REGISTRY.setdefault("ToolPositioningChain", lambda **kw: make_tool_chain_env(**kw))
    def _make_tstar_env(**kw):
        # T* baseline (`..._chain_tstar.py:451-469,1666-1735`): the
        # privileged chain env PLUS the online T-value probe trainer wired
        # as a post_epoch_hook — a normal `--task ToolPositioningChainTSTAR`
        # CLI run produces a T-value loss/accuracy curve (PureRL does not)
        import dataclasses as _dc

        from ..seqdex import tstar as tstarlib

        env = make_tool_chain_pure_rl_env(**kw)
        return _dc.replace(env, post_epoch_hook=tstarlib.make_online_hook(env))

    _REGISTRY.setdefault("ToolPositioningChainTSTAR", _make_tstar_env)
    # PureRL baseline: monolithic privileged policy, no belief state
    _REGISTRY.setdefault(
        "ToolPositioningChainPureRL", lambda **kw: make_tool_chain_pure_rl_env(**kw))

    import dataclasses as _dc

    # variants (`utils/parse_task.py` task table): single-rotation orient and
    # the real-robot-aligned grasp/insert obs protocols
    _REGISTRY.setdefault(
        "BlockAssemblyOrientOnce",
        lambda **kw: make_orient_env(OrientConfig(single_rotation=True, **kw)),
    )
    _REGISTRY.setdefault(
        "BlockAssemblyGrasp",
        lambda **kw: make_grasp_sim_env(GraspSimConfig(real_obs=True, **kw)),
    )
    _REGISTRY.setdefault(
        "BlockAssemblyInsert",
        # real-aligned 156x3 obs protocol (`allegro_hand_block_assembly_insert.py`)
        lambda **kw: make_insert_sim_env(InsertSimConfig(real_obs=True, **kw)),
    )

    from .block_assembly.chain_eval import ChainEvalConfig, make_chain_eval_env

    _REGISTRY.setdefault(
        "BlockAssemblyGUI",  # headless chained-eval analog of the GUI env
        lambda **kw: make_chain_eval_env(ChainEvalConfig(**kw)),
    )

    from .reorientation import make_moar_env

    # standalone in-hand multi-object axis-rotation env (`utils/morb.py:50`)
    _REGISTRY.setdefault("AllegroArmMOAR", lambda **kw: make_moar_env(**kw))

    from .mini import MiniConfig, make_mini_env

    # compile-small real-sim fixture (no reference counterpart): CI smokes,
    # sharding tests, and the driver's multi-chip dry run
    _REGISTRY.setdefault(
        "MiniReach", lambda cfg=None, **kw: make_mini_env(cfg or MiniConfig(**kw)))


_populate()
