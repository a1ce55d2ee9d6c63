"""Metrics writer — tensorboard-compatible when available, JSONL otherwise.

Replaces the reference's `tensorboardX.SummaryWriter` + `IsaacAlgoObserver`
plumbing (`policy_seq_runner.py:98,375-391`, `utils/rlgames_utils.py:108-120`)
and the offline tfevents->csv pipeline (`utils/logger/tools.py:43-120`) — the
JSONL stream is directly machine-readable.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, logdir: str):
        self.logdir = os.path.abspath(logdir)
        os.makedirs(self.logdir, exist_ok=True)
        self._jsonl = open(os.path.join(self.logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.logdir)
        except Exception:
            pass

    def write(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time(), **metrics}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except Exception:
                    pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def read_jsonl(logdir: str):
    path = os.path.join(logdir, "metrics.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            out.append(json.loads(line))
    return out
