"""Training entry point — mirror of `train_rlgames.py`.

Usage (flag names follow `utils/config.py:220-327` where they apply):

    python -m seqdex_tpu.cli.train --task BlockAssemblyGraspSim \
        --num_envs 1024 --max_iterations 10000 --seed 42 \
        --logdir runs/grasp --checkpoint runs/grasp/policy_best.npz --play
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="seqdex_tpu trainer")
    p.add_argument("--task", default="BlockAssemblyGraspSim")
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--max_iterations", type=int, default=10000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--play", action="store_true", help="evaluate a checkpoint")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--logdir", default="runs/seqdex")
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--mini_epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--episodes", type=int, default=10, help="play-mode episodes")
    p.add_argument("--devices", type=int, default=0, help="0 = all")
    return p.parse_args(argv)


def build(args):
    from ..distributed import mesh as meshlib
    from ..envs import registry
    from ..rl.ppo import PPOConfig, make_ppo

    env = registry.make(args.task)
    cfg = PPOConfig(
        num_envs=args.num_envs,
        horizon=args.horizon,
        num_minibatches=args.minibatches,
        mini_epochs=args.mini_epochs,
        learning_rate=args.lr,
    )
    init, train_epoch, act = make_ppo(env, cfg)
    return env, cfg, init, train_epoch, act


def train(args):
    from ..distributed import mesh as meshlib
    from ..distributed.checkpoint import Checkpointer
    from ..utils.metrics import MetricsWriter

    env, cfg, init, train_epoch, act = build(args)
    mesh = meshlib.make_mesh(args.devices or None)
    ts = init(jax.random.PRNGKey(args.seed))
    if len(mesh.devices.flat) > 1:
        ts = meshlib.shard_train_state(ts, mesh, cfg.num_envs)
    train_epoch = jax.jit(train_epoch, donate_argnums=(0,))

    ckpt = Checkpointer(args.logdir, save_every=args.save_every)
    writer = MetricsWriter(args.logdir)
    t_start = time.time()
    steps_per_epoch = cfg.num_envs * cfg.horizon
    with mesh:
        for epoch in range(args.max_iterations):
            ts, metrics = train_epoch(ts)
            if epoch % args.log_every == 0 or epoch == args.max_iterations - 1:
                m = {k: float(v) for k, v in metrics.items()}
                elapsed = time.time() - t_start
                m["env_steps_per_sec"] = steps_per_epoch * (epoch + 1) / elapsed
                writer.write(epoch, m)
                print(
                    f"epoch {epoch} reward {m['reward_mean']:.4f} "
                    f"success {m['success_rate']:.3f} kl {m['kl']:.4f} "
                    f"lr {m['lr']:.2e} fps {m['env_steps_per_sec']:.0f}"
                )
                ckpt.maybe_save(ts, epoch, m["reward_mean"], name=args.task)
    ckpt.maybe_save(ts, args.max_iterations, float("inf"), name=args.task)
    return ts


def play(args):
    """Deterministic evaluation (rl_games player semantics,
    `cfg/lego/ppo_continuous_grasp.yaml` player.deterministic)."""
    from ..distributed.checkpoint import load_params
    from ..rl import networks

    env, cfg, init, train_epoch, act = build(args)
    ts = init(jax.random.PRNGKey(args.seed))
    params = ts.params
    if args.checkpoint:
        params = load_params(args.checkpoint, params)

    batched_step = jax.jit(
        lambda s, obs: jax.vmap(env.step)(s, networks.actor_mu(params, obs))
    )
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    obs = state.obs_stack.reshape(args.num_envs, -1)
    successes, episodes = 0.0, 0.0
    for _ in range(env.episode_length * args.episodes):
        state, out = batched_step(state, obs)
        obs = out.obs
        done = np.asarray(out.done, dtype=np.float32)
        successes += float((np.asarray(out.info["successes"]) * done).sum())
        episodes += float(done.sum())
    rate = successes / max(episodes, 1)
    print(json.dumps({"task": args.task, "episodes": episodes, "success_rate": rate}))
    return rate


def main(argv=None):
    args = parse_args(argv)
    if args.play:
        return play(args)
    return train(args)


if __name__ == "__main__":
    main()
