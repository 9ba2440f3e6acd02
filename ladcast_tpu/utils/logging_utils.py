"""Experiment logging / tracker abstraction.

Replacement for the reference's accelerate tracker plumbing
(train_AR.py:758-762, 1085-1094; ``log_with: wandb|tensorboard``). Local
JSON-lines logging is always on (greppable, no deps); wandb/tensorboard
attach when the libraries exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def flatten_config(d: Dict, prefix: str = "") -> Dict:
    """Dot-flatten nested config dicts for trackers (reference
    utils.py:55-74)."""
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_config(v, key))
        elif isinstance(v, (int, float, str, bool, type(None))):
            out[key] = v
        else:
            out[key] = str(v)
    return out


class MetricLogger:
    def __init__(self, output_dir: str, project: Optional[str] = None,
                 config: Optional[Dict] = None, log_with: str = "jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self._f = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()
        self._wandb = None
        self._tb = None
        if config is not None:
            json.dump(flatten_config(config),
                      open(os.path.join(output_dir, "config.json"), "w"),
                      indent=2)
        if log_with == "wandb":
            try:
                import wandb
                self._wandb = wandb.init(project=project or "ladcast_tpu",
                                         config=flatten_config(config or {}))
            except Exception:
                pass
        elif log_with == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:
                pass

    def log(self, metrics: Dict, step: int):
        rec = {"step": step, "wall": round(time.time() - self._t0, 2)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
