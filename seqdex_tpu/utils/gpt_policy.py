"""GPT behavior-cloning policy for sim-to-real distillation.

TPU-native re-implementation of `utils/transformer_controller/GPT_policy.py`
(676 LoC, minGPT-style) + its wrapper (`nn_controller.py:18-19`): a 4-layer,
4-head, 128-dim causal transformer over a 3-frame observation context with a
Gaussian-mixture (GMM) action head, trained with negative log-likelihood on
demonstration data.

Written in plain JAX (no flax): params are dicts, attention is one fused
einsum chain — tiny model, the point is API parity for the BC distillation
workflow.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..rl.networks import _linear_init


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    context: int = 3  # 3-frame context (`nn_controller.py:9-17`)
    n_layer: int = 4
    n_head: int = 4
    n_embd: int = 128
    obs_dim: int = 30
    act_dim: int = 23
    n_modes: int = 5  # GMM mixture components
    dropout: float = 0.0


def init_gpt(key, cfg: GPTConfig) -> dict:
    keys = jax.random.split(key, 4 + 4 * cfg.n_layer)
    params = {
        "tok": _linear_init(keys[0], cfg.obs_dim, cfg.n_embd),
        "pos": jnp.zeros((cfg.context, cfg.n_embd)),
        "blocks": [],
        "ln_f": {"g": jnp.ones(cfg.n_embd), "b": jnp.zeros(cfg.n_embd)},
        # GMM head: means, log_stds, logits per mode
        "head_mu": _linear_init(keys[1], cfg.n_embd, cfg.act_dim * cfg.n_modes),
        "head_logstd": _linear_init(keys[2], cfg.n_embd, cfg.act_dim * cfg.n_modes),
        "head_logit": _linear_init(keys[3], cfg.n_embd, cfg.n_modes),
    }
    for i in range(cfg.n_layer):
        k = keys[4 + 4 * i : 8 + 4 * i]
        params["blocks"].append(
            {
                "ln1": {"g": jnp.ones(cfg.n_embd), "b": jnp.zeros(cfg.n_embd)},
                "qkv": _linear_init(k[0], cfg.n_embd, 3 * cfg.n_embd),
                "proj": _linear_init(k[1], cfg.n_embd, cfg.n_embd),
                "ln2": {"g": jnp.ones(cfg.n_embd), "b": jnp.zeros(cfg.n_embd)},
                "fc1": _linear_init(k[2], cfg.n_embd, 4 * cfg.n_embd),
                "fc2": _linear_init(k[3], 4 * cfg.n_embd, cfg.n_embd),
            }
        )
    return params


def _ln(p, x):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["g"] + p["b"]


def gpt_forward(params, cfg: GPTConfig, obs_seq: jnp.ndarray):
    """obs_seq: (..., T, obs_dim) -> GMM over actions at the last position:
    (mu (..., M, A), log_std (..., M, A), logits (..., M))."""
    T = obs_seq.shape[-2]
    x = obs_seq @ params["tok"]["w"] + params["tok"]["b"] + params["pos"][:T]
    mask = jnp.tril(jnp.ones((T, T), dtype=bool))
    H, E = cfg.n_head, cfg.n_embd
    hd = E // H
    for blk in params["blocks"]:
        h = _ln(blk["ln1"], x)
        qkv = h @ blk["qkv"]["w"] + blk["qkv"]["b"]  # (..., T, 3E)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(q.shape[:-1] + (H, hd))
        k = k.reshape(k.shape[:-1] + (H, hd))
        v = v.reshape(v.shape[:-1] + (H, hd))
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(hd)
        att = jnp.where(mask, att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", att, v)
        out = out.reshape(out.shape[:-2] + (E,))
        x = x + out @ blk["proj"]["w"] + blk["proj"]["b"]
        h2 = _ln(blk["ln2"], x)
        x = x + jax.nn.gelu(h2 @ blk["fc1"]["w"] + blk["fc1"]["b"]) @ blk["fc2"]["w"] + blk["fc2"]["b"]
    x = _ln(params["ln_f"], x[..., -1, :])  # last token
    M, A = cfg.n_modes, cfg.act_dim
    mu = (x @ params["head_mu"]["w"] + params["head_mu"]["b"]).reshape(x.shape[:-1] + (M, A))
    log_std = (x @ params["head_logstd"]["w"] + params["head_logstd"]["b"]).reshape(
        x.shape[:-1] + (M, A)
    )
    log_std = jnp.clip(log_std, -5.0, 2.0)
    logits = x @ params["head_logit"]["w"] + params["head_logit"]["b"]
    return mu, log_std, logits


def gmm_nll(mu, log_std, logits, action):
    """Negative log-likelihood of `action` under the GMM head."""
    a = action[..., None, :]  # broadcast over modes
    comp_ll = -0.5 * jnp.sum(
        ((a - mu) / jnp.exp(log_std)) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1
    )  # (..., M)
    log_w = jax.nn.log_softmax(logits, axis=-1)
    return -jax.nn.logsumexp(log_w + comp_ll, axis=-1)


def gmm_mode(mu, log_std, logits):
    """Deterministic action: mean of the highest-weight mode (player mode)."""
    idx = jnp.argmax(logits, axis=-1)
    return jnp.take_along_axis(mu, idx[..., None, None], axis=-2)[..., 0, :]


class GPTWrapper:
    """Training + inference wrapper (parity with GPT_wrapper /
    `utils/transformer_controller/nn_controller.py`)."""

    def __init__(self, cfg: GPTConfig = GPTConfig(), seed: int = 0, lr: float = 1e-4):
        self.cfg = cfg
        self.params = init_gpt(jax.random.PRNGKey(seed), cfg)
        self.opt = optax.adamw(lr, weight_decay=0.01)
        self.opt_state = self.opt.init(self.params)
        self._ctx = np.zeros((cfg.context, cfg.obs_dim), dtype=np.float32)

        def loss_fn(params, obs_seq, actions):
            mu, ls, lg = gpt_forward(params, cfg, obs_seq)
            return jnp.mean(gmm_nll(mu, ls, lg, actions))

        self._loss_grad = jax.jit(jax.value_and_grad(loss_fn))
        self._act = jax.jit(
            lambda p, seq: gmm_mode(*gpt_forward(p, cfg, seq))
        )

    def train_step(self, obs_seq: np.ndarray, actions: np.ndarray) -> float:
        """obs_seq: (B, T, obs_dim); actions: (B, act_dim) — supervised BC."""
        loss, grads = self._loss_grad(self.params, jnp.asarray(obs_seq), jnp.asarray(actions))
        updates, self.opt_state = self.opt.update(grads, self.opt_state, self.params)
        self.params = optax.apply_updates(self.params, updates)
        return float(loss)

    def reset(self):
        self._ctx[:] = 0

    def predict(self, obs_frame: np.ndarray) -> np.ndarray:
        self._ctx = np.concatenate([self._ctx[1:], obs_frame[None].astype(np.float32)])
        return np.asarray(self._act(self.params, jnp.asarray(self._ctx)))
