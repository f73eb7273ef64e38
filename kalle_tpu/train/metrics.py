"""Scalar metrics: JSONL (always) + TensorBoard (if torch present).

Mirrors the reference's accelerate->tensorboard scalars total_loss /
audio_loss / end_loss plus the plain-text train log
(ref: train_offline.py:250-252, 266-287).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.jsonl_path, "a", encoding="utf-8")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def text_log(self, line: str, path: Optional[str] = None) -> None:
        if path is None:
            path = os.path.join(os.path.dirname(self.jsonl_path), "train_log.txt")
        with open(path, "a", encoding="utf-8") as f:
            f.write(line + "\n")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
