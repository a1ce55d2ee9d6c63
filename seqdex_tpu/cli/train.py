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
    # None = fall back to the task YAML (`seqdex_tpu/configs/<task>.yaml`,
    # mirror of the reference cfg merge, `utils/config.py:94-182`), then to
    # the PPOConfig defaults
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=10000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--play", action="store_true", help="evaluate a checkpoint")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--resume", default="",
                   help="full TrainState snapshot to resume training from "
                        "(reference --resume, utils/config.py:141-145)")
    p.add_argument("--logdir", default="runs/seqdex")
    p.add_argument("--horizon", type=int, default=None)
    p.add_argument("--minibatches", type=int, default=None)
    p.add_argument("--mini_epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--randomize", action="store_true",
                   help="enable the domain-randomization engine "
                        "(base_task.py:229-423 schema)")
    p.add_argument("--recurrent", action="store_true",
                   help="LSTM actor/critic (rl_games rnn family, "
                        "cfg/lego/ppo_continuous_lstm.yaml)")
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--episodes", type=int, default=10, help="play-mode episodes")
    p.add_argument("--devices", type=int, default=0, help="0 = all")
    return p.parse_args(argv)


def build(args):
    import dataclasses as _dc

    from ..distributed import mesh as meshlib
    from ..envs import registry
    from ..rl.ppo import PPOConfig, make_ppo
    from . import config as cfglib

    yaml_cfg = cfglib.load_cfg(args.task)
    env_kwargs = cfglib.env_kwargs_from_cfg(yaml_cfg)
    if args.randomize:
        env_kwargs["randomize"] = True
    # Retry dropping one unknown kwarg at a time, loudly — never silently
    # drop the whole kwarg set (an explicit --randomize must either apply or
    # raise; reference DR is schema-driven for every task,
    # `tasks/hand_base/base_task.py:229-423`).
    while True:
        try:
            env = registry.make(args.task, **env_kwargs)
            break
        except TypeError as e:
            msg = str(e)
            bad = next((k for k in list(env_kwargs) if f"'{k}'" in msg), None)
            if bad is None or (bad == "randomize" and args.randomize):
                raise
            print(f"WARNING: task {args.task} does not accept config key "
                  f"'{bad}' — dropping it (was {env_kwargs[bad]!r})")
            del env_kwargs[bad]

    ppo_kwargs = cfglib.ppo_kwargs_from_cfg(yaml_cfg)
    # explicit CLI flags override the YAML layer
    for flag, field in (("num_envs", "num_envs"), ("horizon", "horizon"),
                        ("minibatches", "num_minibatches"),
                        ("mini_epochs", "mini_epochs"), ("lr", "learning_rate")):
        v = getattr(args, flag)
        if v is not None:
            ppo_kwargs[field] = v
    ppo_kwargs.setdefault("num_envs", 1024)
    cfg = PPOConfig(**ppo_kwargs)
    if getattr(args, "recurrent", False):
        from ..rl.ppo_lstm import make_recurrent_ppo

        init, train_epoch, act = make_recurrent_ppo(env, cfg)
    else:
        init, train_epoch, act = make_ppo(env, cfg)
    return env, cfg, init, train_epoch, act


def train(args):
    from ..distributed import mesh as meshlib
    from ..distributed.checkpoint import (
        Checkpointer,
        load_params,
        load_train_state,
    )
    from ..utils.metrics import MetricsWriter

    env, cfg, init, train_epoch, act = build(args)
    mesh = meshlib.make_mesh(args.devices or None)
    ts = init(jax.random.PRNGKey(args.seed))
    start_epoch = 0
    if args.resume:
        ts = load_train_state(args.resume, ts)
        start_epoch = int(ts.epoch)
        print(f"resumed from {args.resume} at epoch {start_epoch}")
    elif args.checkpoint:
        # warm-start the policy params only (rl_games --checkpoint)
        ts = ts._replace(params=load_params(args.checkpoint, ts.params))
    if len(mesh.devices.flat) > 1:
        ts = meshlib.shard_train_state(ts, mesh, cfg.num_envs)
    # donation is opt-in: the axon TPU PJRT backend rejects the donated
    # aliasing of the Orient/InsertSim training programs at dispatch
    # ("INVALID_ARGUMENT: TPU backend error", reproduced clean at 64 envs,
    # while the same programs run fine undonated and GraspSim runs fine
    # either way). The copy saved by donation is negligible at these sizes.
    if os.environ.get("SEQDEX_DONATE", "0") == "1":
        train_epoch = jax.jit(train_epoch, donate_argnums=(0,))
    else:
        train_epoch = jax.jit(train_epoch)

    ckpt = Checkpointer(args.logdir, save_every=args.save_every)
    writer = MetricsWriter(args.logdir)
    t_start = time.time()
    steps_per_epoch = cfg.num_envs * cfg.horizon
    with mesh:
        for epoch in range(start_epoch, args.max_iterations):
            ts, metrics = train_epoch(ts)
            if epoch % args.log_every == 0 or epoch == args.max_iterations - 1:
                m = {k: float(v) for k, v in metrics.items()}
                elapsed = time.time() - t_start
                m["env_steps_per_sec"] = (
                    steps_per_epoch * (epoch + 1 - start_epoch) / elapsed)
                if env.post_epoch_hook is not None:
                    # env-specific side training (TSTAR online T-value)
                    m.update(env.post_epoch_hook(ts.params, epoch))
                writer.write(epoch, m)
                print(
                    f"epoch {epoch} reward {m['reward_mean']:.4f} "
                    f"success {m['success_rate']:.3f} kl {m['kl']:.4f} "
                    f"lr {m['lr']:.2e} fps {m['env_steps_per_sec']:.0f}"
                )
                ckpt.maybe_save(ts, epoch, m["reward_mean"], name=args.task,
                                full_state=True)
    ckpt.maybe_save(ts, args.max_iterations, float("inf"), name=args.task)
    from ..distributed.checkpoint import save_train_state

    save_train_state(os.path.join(args.logdir, f"{args.task}_resume.npz"), ts)
    return ts


def play(args):
    """Deterministic evaluation (rl_games player semantics,
    `cfg/lego/ppo_continuous_grasp.yaml` player.deterministic)."""
    from ..distributed.checkpoint import load_params
    from ..rl import networks

    env, cfg, init, train_epoch, act = build(args)
    num_envs = cfg.num_envs  # YAML + CLI resolved (args.num_envs may be None)
    ts = init(jax.random.PRNGKey(args.seed))
    params = ts.params
    if args.checkpoint:
        params = load_params(args.checkpoint, params)

    import jax.numpy as jnp

    recurrent = getattr(args, "recurrent", False)
    if recurrent:
        from ..rl import recurrent as reclib

        carry = reclib.initial_carry(params, (num_envs,))

        def _step(s, carry, obs):
            carry, mu = act(params, carry, obs)
            s, out = jax.vmap(env.step)(s, mu)
            # reset the policy carry at episode boundaries
            carry = jax.tree_util.tree_map(
                lambda c: jnp.where(
                    out.done.reshape((num_envs,) + (1,) * (c.ndim - 1)) > 0,
                    0.0, c),
                carry)
            return s, carry, out

        batched_step = jax.jit(_step)
    else:
        batched_step = jax.jit(
            lambda s, obs: jax.vmap(env.step)(s, networks.actor_mu(params, obs))
        )

    keys = jax.random.split(jax.random.PRNGKey(args.seed), num_envs)
    state = jax.jit(jax.vmap(env.reset))(keys)
    obs = state.obs_stack.reshape(num_envs, -1)
    successes, episodes = 0.0, 0.0
    for _ in range(env.episode_length * args.episodes):
        if recurrent:
            state, carry, out = batched_step(state, carry, obs)
        else:
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
