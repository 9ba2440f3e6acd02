"""Tracing / profiling as a first-class feature.

The reference has only ad-hoc time.time() spans (SURVEY.md section 5).
Here: jax.profiler traces (viewable in TensorBoard/Perfetto), named
wall-clock phases, and a compile-time reporter.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named wall-clock phases; ``summary()`` returns seconds
    per phase."""

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._count: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # ensure device work attributed to this phase has finished
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4), "count": self._count[k]}
                for k, v in self._acc.items()}

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (XLA ops, TPU timelines) to log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compile_report(fn, *args, **kwargs) -> Dict[str, float]:
    """Time lowering/compilation separately from execution for a jitted fn."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args, **kwargs)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    cost = {}
    try:
        analysis = compiled.cost_analysis()
        if analysis:
            cost = {k: float(v) for k, v in analysis.items()
                    if k in ("flops", "bytes accessed")}
    except Exception:
        pass
    return {"lower_s": round(t1 - t0, 3), "compile_s": round(t2 - t1, 3),
            **cost}
