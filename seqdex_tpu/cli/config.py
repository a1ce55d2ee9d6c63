"""YAML config system — mirror of `utils/config.py`.

`load_cfg(task)` reads `seqdex_tpu/configs/<task>.yaml` (schema follows the
reference's `cfg/*.yaml`: an `env` block, a `sim` block, a `train` block
standing in for the rl_games YAML) and applies CLI-style overrides
(`load_cfg` semantics, `utils/config.py:94-182`: numEnvs / episodeLength /
seed / max_iterations / checkpoint). `set_seed` mirrors `:35-59`.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np
import yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

# task name -> yaml file (mirror of `retrieve_cfg`, `utils/config.py:62-90`)
TASK_CFG = {
    "BlockAssemblySearch": "block_assembly_search.yaml",
    "BlockAssemblyOrient": "block_assembly_orient.yaml",
    "BlockAssemblyGraspSim": "block_assembly_grasp_sim.yaml",
    "BlockAssemblyInsertSim": "block_assembly_insert_sim.yaml",
    "ToolPositioningGrasp": "tool_positioning_grasp.yaml",
    "ToolPositioningOrient": "tool_positioning_orient.yaml",
    "ToolPositioningChain": "tool_positioning_chain.yaml",
}


def load_cfg(task: str, overrides: Optional[dict] = None) -> dict:
    path = os.path.join(CONFIG_DIR, TASK_CFG.get(task, f"{task}.yaml"))
    if os.path.exists(path):
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = {}
    cfg.setdefault("env", {})
    cfg.setdefault("sim", {})
    cfg.setdefault("train", {})
    for key, val in (overrides or {}).items():
        if val is None:
            continue
        # CLI override routing (reference `load_cfg`)
        if key in ("num_envs", "numEnvs"):
            cfg["env"]["numEnvs"] = val
        elif key in ("episode_length", "episodeLength"):
            cfg["env"]["episodeLength"] = val
        elif key == "seed":
            cfg["train"]["seed"] = val
        elif key == "max_iterations":
            cfg["train"]["max_iterations"] = val
        elif key == "checkpoint":
            cfg["train"]["checkpoint"] = val
        else:
            cfg["train"][key] = val
    return cfg


# yaml env/sim keys -> env Config dataclass field names
_ENV_KEY_MAP = {
    "episodeLength": "episode_length",
    "actionsMovingAverage": "action_moving_average",
    "legoType": "lego_type",
    "heapBricks": "heap_bricks",
    "heapTypes": "heap_types",
    "forceScale": "force_scale",
    "randomize": "randomize",
}
_SIM_KEY_MAP = {
    "substeps": "substeps",
    "solver_iterations": "solver_iterations",
    "max_contacts": "max_contacts",
}


def env_kwargs_from_cfg(cfg: dict) -> dict:
    """Map a loaded YAML cfg (env + sim blocks) to env-Config dataclass
    kwargs consumable by `registry.make(task, **kwargs)` — the wiring the
    reference does in `parse_task`/env `__init__` (cfg dict -> attributes)."""
    kw = {}
    for yk, fk in _ENV_KEY_MAP.items():
        if yk in cfg.get("env", {}):
            kw[fk] = cfg["env"][yk]
    for yk, fk in _SIM_KEY_MAP.items():
        if yk in cfg.get("sim", {}):
            kw[fk] = cfg["sim"][yk]
    return kw


def ppo_kwargs_from_cfg(cfg: dict) -> dict:
    """train block -> PPOConfig kwargs (rl_games YAML analog)."""
    t = cfg.get("train", {})
    out = {}
    mapping = {
        "horizon": "horizon", "minibatches": "num_minibatches",
        "mini_epochs": "mini_epochs", "lr": "learning_rate",
        "kl_threshold": "kl_threshold", "gamma": "gamma", "tau": "tau",
        "e_clip": "e_clip",
    }
    for yk, fk in mapping.items():
        if yk in t:
            out[fk] = t[yk]
    if "numEnvs" in cfg.get("env", {}):
        out["num_envs"] = cfg["env"]["numEnvs"]
    return out


def set_seed(seed: int, deterministic: bool = False) -> int:
    """python/numpy seeding (torch-deterministic flag parity is a no-op —
    JAX is deterministic given PRNG keys)."""
    if seed == -1:
        seed = np.random.randint(0, 10000)
    random.seed(seed)
    np.random.seed(seed)
    return seed
