"""Offline experiment analysis: metrics -> csv -> plots.

TPU-native analog of the reference's logger pipeline
(`utils/logger/tools.py:43+`, `utils/logger/plotter.py`,
`utils/logger/analysis.py`): the reference converts tensorboard tfevents to
csv and renders smoothed reward curves across seeds. Here the source of
truth is the jsonl stream written by `seqdex_tpu.utils.metrics.MetricsWriter`;
this module converts runs to csv, applies the same centered smoothing, and
plots mean+-std bands across seed groups with matplotlib.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .metrics import read_jsonl


def export_csv(logdir: str, out_path: Optional[str] = None) -> str:
    """Flatten a run's jsonl metrics into one csv (step + union of keys),
    mirroring the reference's tfevents->csv conversion (`tools.py:43-120`)."""
    rows = read_jsonl(logdir)
    keys: List[str] = sorted({k for r in rows for k in r if k != "step"})
    out_path = out_path or os.path.join(logdir, "metrics.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step"] + keys)
        for r in rows:
            w.writerow([r.get("step", "")] + [r.get(k, "") for k in keys])
    return out_path


def smooth(y: Sequence[float], radius: int = 10) -> np.ndarray:
    """Centered moving average with edge correction (the reference smooths
    curves with a symmetric window before plotting, `plotter.py`)."""
    y = np.asarray(y, dtype=np.float64)
    if radius <= 0 or y.size == 0:
        return y
    kernel = np.ones(2 * radius + 1)
    norm = np.convolve(np.ones_like(y), kernel, mode="same")
    return np.convolve(y, kernel, mode="same") / norm


def collect_runs(pattern: str, key: str) -> Dict[str, tuple]:
    """Glob run dirs; return {run_name: (steps, values)} for a metric key."""
    out = {}
    for d in sorted(glob.glob(pattern)):
        if not os.path.isdir(d):
            continue
        rows = [r for r in read_jsonl(d) if key in r]
        if rows:
            out[os.path.basename(d.rstrip("/"))] = (
                np.array([r.get("step", i) for i, r in enumerate(rows)]),
                np.array([r[key] for r in rows], dtype=np.float64),
            )
    return out


def plot_runs(
    pattern: str,
    key: str = "reward",
    out_path: str = "curves.png",
    radius: int = 10,
    title: Optional[str] = None,
) -> Optional[str]:
    """Render smoothed per-run curves plus a mean+-std band across runs
    (seed-group aggregation as in `analysis.py`/`plotter.py`). Returns the
    written path, or None when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    runs = collect_runs(pattern, key)
    if not runs:
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, (steps, vals) in runs.items():
        ax.plot(steps, smooth(vals, radius), linewidth=1.2, alpha=0.8, label=name)
    # mean+-std band on the common step range
    min_len = min(len(v) for _, v in runs.values())
    if len(runs) > 1 and min_len > 1:
        mat = np.stack([smooth(v[:min_len], radius) for _, v in runs.values()])
        steps0 = next(iter(runs.values()))[0][:min_len]
        ax.plot(steps0, mat.mean(0), color="k", linewidth=2.0, label="mean")
        ax.fill_between(steps0, mat.mean(0) - mat.std(0), mat.mean(0) + mat.std(0),
                        color="k", alpha=0.15)
    ax.set_xlabel("step")
    ax.set_ylabel(key)
    ax.set_title(title or key)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
