"""Transition feasibility (T-value) models + offline trainer.

TPU-native re-implementation of `policy_sequencing/terminal_value_function.py`
(RetriGraspTValue 650->1024->512->128->2, GraspInsertTValue 4->256->128->64->2,
both ELU, `:12-46`) and `policy_sequencing/transition_value_trainer.py`
(`TValue_Trainer`, `:127-248`): balanced success/failure minibatches
(512+512), input noise + quaternion renormalisation, BCE-with-logits on
2-logit heads, held-out validation accuracy, periodic checkpointing.

Data comes from the terminal-state reservoirs (`seqdex_tpu.seqdex.reservoir`)
instead of HDF5 dumps; `.npz` import/export covers cross-job handoff.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..rl.networks import init_mlp, mlp_apply

RETRI_GRASP_HIDDEN = (1024, 512, 128)  # terminal_value_function.py:12-27
GRASP_INSERT_HIDDEN = (256, 128, 64)  # terminal_value_function.py:30-46
RETRI_GRASP_IN = 650  # 65-dim temporal obs x 10 frames (search.py:394-409)
GRASP_INSERT_IN = 4  # camera-frame block quaternion


def init_tvalue(key, in_dim: int, hidden) -> dict:
    return init_mlp(key, in_dim, hidden, out_dim=2, out_scale=0.02)


def init_retri_grasp_tvalue(key):
    return init_tvalue(key, RETRI_GRASP_IN, RETRI_GRASP_HIDDEN)


def init_grasp_insert_tvalue(key):
    return init_tvalue(key, GRASP_INSERT_IN, GRASP_INSERT_HIDDEN)


def tvalue_logits(params, x):
    return mlp_apply(params, x)


def tvalue_confidence(params, x):
    """sigmoid of the success logit — the gate the envs threshold at 0.99
    (`..._orient.py:1201-1203`)."""
    return jax.nn.sigmoid(tvalue_logits(params, x))[..., 1]


def bce_with_logits(logits, labels):
    """labels: (..., 2) one-hot-ish floats (reference uses BCEWithLogitsLoss
    over both logits, `transition_value_trainer.py:186`)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@dataclasses.dataclass(frozen=True)
class TValueTrainConfig:
    learning_rate: float = 3e-4  # transition_value_trainer.py:183 (Adam)
    batch_per_class: int = 512  # `:215` balanced 512/512
    input_noise: float = 0.2  # `:216-220` additive noise before renorm
    quat_slice: Optional[tuple] = (0, 4)  # renormalise this slice as a quaternion
    validation: int = 100  # held-out samples per class (`:141-149`)


class TValueTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_tvalue_trainer(in_dim: int, hidden, cfg: TValueTrainConfig = TValueTrainConfig()):
    optimizer = optax.adam(cfg.learning_rate)

    def init(key) -> TValueTrainState:
        params = init_tvalue(key, in_dim, hidden)
        return TValueTrainState(params, optimizer.init(params), jnp.int32(0))

    def _augment(key, x):
        noise = (jax.random.uniform(key, x.shape) * 2 - 1) * cfg.input_noise
        x = x + noise
        if cfg.quat_slice is not None and in_dim >= cfg.quat_slice[1]:
            a, b = cfg.quat_slice
            q = x[..., a:b]
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
            x = x.at[..., a:b].set(q)
        return x

    def train_step(ts: TValueTrainState, key, succ_batch, fail_batch):
        """succ_batch/fail_batch: (batch_per_class, in_dim)."""
        k1, k2 = jax.random.split(key)
        xs = jnp.concatenate([_augment(k1, succ_batch), _augment(k2, fail_batch)])
        labels = jnp.concatenate(
            [
                jnp.tile(jnp.asarray([0.0, 1.0]), (succ_batch.shape[0], 1)),
                jnp.tile(jnp.asarray([1.0, 0.0]), (fail_batch.shape[0], 1)),
            ]
        )

        def loss_fn(params):
            return bce_with_logits(tvalue_logits(params, xs), labels)

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TValueTrainState(params, opt_state, ts.step + 1), loss

    def accuracy(params, xs, labels_binary):
        """labels_binary: (N,) 1 = success."""
        conf = tvalue_confidence(params, xs)
        pred = (conf > 0.5).astype(jnp.float32)
        return jnp.mean(pred == labels_binary)

    return init, jax.jit(train_step), jax.jit(accuracy)


def train_offline(
    succ: np.ndarray,
    fail: np.ndarray,
    in_dim: int,
    hidden,
    rollouts: int = 10000,
    seed: int = 0,
    cfg: TValueTrainConfig = TValueTrainConfig(),
    eval_every: int = 1000,
    ckpt_dir: Optional[str] = None,
    log=print,
):
    """Offline training mirror of `TValue_Trainer.train_rollout`
    (`transition_value_trainer.py:209-248`): sample balanced batches, train,
    periodically report held-out accuracy and checkpoint."""
    init, train_step, accuracy = make_tvalue_trainer(in_dim, hidden, cfg)
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    ts = init(kinit)

    nval = min(cfg.validation, len(succ) // 4, len(fail) // 4)
    val_x = jnp.asarray(np.concatenate([succ[:nval], fail[:nval]]), dtype=jnp.float32)
    val_y = jnp.concatenate([jnp.ones(nval), jnp.zeros(nval)])
    succ_t = jnp.asarray(succ[nval:], dtype=jnp.float32)
    fail_t = jnp.asarray(fail[nval:], dtype=jnp.float32)

    acc = 0.0
    for it in range(rollouts):
        key, k1, k2, k3 = jax.random.split(key, 4)
        si = jax.random.randint(k1, (cfg.batch_per_class,), 0, succ_t.shape[0])
        fi = jax.random.randint(k2, (cfg.batch_per_class,), 0, fail_t.shape[0])
        ts, loss = train_step(ts, k3, succ_t[si], fail_t[fi])
        if (it + 1) % eval_every == 0:
            acc = float(accuracy(ts.params, val_x, val_y))
            log(f"tvalue it={it + 1} loss={float(loss):.4f} val_acc={acc:.3f}")
            if ckpt_dir:
                os.makedirs(ckpt_dir, exist_ok=True)
                save_tvalue(
                    os.path.join(ckpt_dir, f"tvalue_{it + 1}_{acc:.3f}.npz"), ts.params
                )
    return ts, acc


def fit_temperature(params, xs, labels_binary, lo: float = 0.05,
                    hi: float = 20.0, steps: int = 200):
    """Fit a post-hoc temperature on held-out data (Guo et al. 2017 —
    single-scalar calibration; monotonic, so classification accuracy is
    unchanged). Returns the T minimizing held-out NLL of the success logit.

    Why: the reference thresholds gate confidence at an absolute 0.99
    (`..._orient.py:1201-1203`); its checkpoint nets are trained 10k+
    iterations to saturation, ours may be under/over-confident at matched
    accuracy — T translates our logit scale onto the reference's
    confidence scale so the 0.99 semantics carry over.
    """
    logits = tvalue_logits(params, xs)[..., 1]
    y = jnp.asarray(labels_binary, dtype=jnp.float32)

    def nll(t):
        z = logits / t
        return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))

    ts_grid = jnp.exp(jnp.linspace(jnp.log(lo), jnp.log(hi), steps))
    nlls = jax.vmap(nll)(ts_grid)
    return float(ts_grid[jnp.argmin(nlls)])


def fit_gate_temperature(params, xs, labels_binary, threshold: float = 0.99,
                         target_tpr: float = 0.8):
    """Operating-point temperature: the smallest sharpening T such that
    `target_tpr` of TRUE successes clear the absolute `threshold` gate.

    Why this exists: NLL-optimal temperature (`fit_temperature`) is honest —
    a net with val-acc ~0.86 cannot calibrate to 0.99 confidence, so the
    reference's fixed 0.99 gate (`..._orient.py:1201-1203`) would reject
    everything. The reference's embedded 0.834-acc checkpoint passing that
    gate at useful rates implies ITS confidences saturate (10k+ noisy-input
    iterations on a 4-dim input); this fit reproduces that operating point
    explicitly and the calibration report carries the false-accept cost.
    Monotonic — accuracy at 0.5 unchanged."""
    logits = np.asarray(tvalue_logits(params, xs))[..., 1]
    y = np.asarray(labels_binary) > 0.5
    succ_logits = logits[y]
    if not len(succ_logits):
        return 1.0
    q = float(np.quantile(succ_logits, 1.0 - target_tpr))
    z_thr = float(np.log(threshold / (1.0 - threshold)))  # logit(0.99)
    if q <= 0:
        # the target-tpr quantile is on the WRONG side of 0.5 — sharpening
        # cannot lift it over the gate; sharpen to the median instead
        q = float(np.quantile(succ_logits, 0.5))
        if q <= 0:
            return 1.0
    return q / z_thr


def apply_temperature(params: dict, temperature: float) -> dict:
    """Fold a fitted temperature into the FINAL layer so downstream
    consumers (the 0.99 gates in the stage envs) need no protocol change:
    sigmoid(w/T . h + b/T) == sigmoid(logit / T)."""
    head = {"w": params["head"]["w"] / temperature,
            "b": params["head"]["b"] / temperature}
    return {"layers": params["layers"], "head": head}


def calibration_report(params, xs, labels_binary, threshold: float = 0.99,
                       bins: int = 10) -> dict:
    """Confidence histogram + expected calibration error + the operative
    number for the chain: what fraction of each class clears the 0.99 gate
    (`..._orient.py:1201-1203`). All floats, JSON-ready."""
    conf = np.asarray(tvalue_confidence(params, xs))
    y = np.asarray(labels_binary, dtype=np.float32)
    pred = (conf > 0.5).astype(np.float32)
    acc = float((pred == y).mean())
    edges = np.linspace(0, 1, bins + 1)
    ece = 0.0
    hist = []
    for i in range(bins):
        m = (conf >= edges[i]) & (conf < edges[i + 1] if i < bins - 1 else conf <= 1.0)
        if m.sum():
            gap = abs(float(conf[m].mean()) - float(y[m].mean()))
            ece += m.mean() * gap
        hist.append(int(m.sum()))
    succ, fail = conf[y > 0.5], conf[y <= 0.5]
    return {
        "val_acc": acc,
        "ece": float(ece),
        "conf_hist": hist,
        "mean_conf_succ": float(succ.mean()) if len(succ) else float("nan"),
        "mean_conf_fail": float(fail.mean()) if len(fail) else float("nan"),
        "frac_succ_above_gate": float((succ > threshold).mean()) if len(succ) else 0.0,
        "frac_fail_above_gate": float((fail > threshold).mean()) if len(fail) else 0.0,
    }


def save_tvalue(path: str, params: dict):
    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez(path, *[np.asarray(x) for x in flat])


def load_tvalue(path: str, in_dim: int, hidden) -> dict:
    template = init_tvalue(jax.random.PRNGKey(0), in_dim, hidden)
    flat, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(path)
    loaded = [jnp.asarray(data[k]) for k in data.files]
    assert len(loaded) == len(flat), "checkpoint/topology mismatch"
    return jax.tree_util.tree_unflatten(treedef, loaded)
