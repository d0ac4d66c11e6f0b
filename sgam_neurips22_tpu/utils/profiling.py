"""Profiling / tracing hooks.

The reference has none (SURVEY.md section 5.1: only tqdm + prints). Here:
- `trace(logdir)`: context manager around jax.profiler.trace — produces
  TensorBoard/XProf traces of the jitted steps;
- `StepTimer`: lightweight wall-clock per-stage timer with summary stats,
  for quick hot-loop attribution without a full trace.
Wired into bench.py (--profile) and train.py (--profile).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    def __init__(self) -> None:
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.times.items():
            v = sorted(vals)
            out[name] = {
                "n": len(v),
                "mean_ms": 1e3 * sum(v) / len(v),
                "p50_ms": 1e3 * v[len(v) // 2],
                "max_ms": 1e3 * v[-1],
            }
        return out

    def report(self) -> str:
        return "\n".join(
            f"{name:30s} n={s['n']:4d} mean={s['mean_ms']:8.2f}ms p50={s['p50_ms']:8.2f}ms max={s['max_ms']:8.2f}ms"
            for name, s in sorted(self.summary().items())
        )
