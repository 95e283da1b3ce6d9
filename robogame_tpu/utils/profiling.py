"""Tracing / profiling / metrics.

The reference's only observability is print statements and a progress bar
(SURVEY.md §5).  Here:

* :func:`trace` -- context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace;
* :class:`PhaseTimer` -- wall-clock phase timing with device sync, for
  the judged counters (rollout steps/s, MPC solves/s, games/s);
* :func:`counters_line` -- one JSON line of metrics (the bench.py
  convention) for any phase dict.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/robogame_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall time + item counts per phase.

    >>> pt = PhaseTimer()
    >>> with pt.phase("rollout", items=B * n_steps):
    ...     out = run(states); jax.block_until_ready(out)
    >>> pt.rates()["rollout"]   # items/s
    """

    def __init__(self):
        self._t: Dict[str, float] = {}
        self._n: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._t[name] = self._t.get(name, 0.0) + dt
            self._n[name] = self._n.get(name, 0) + items

    def seconds(self) -> Dict[str, float]:
        return dict(self._t)

    def rates(self) -> Dict[str, float]:
        return {k: (self._n[k] / t if t > 0 else 0.0)
                for k, t in self._t.items()}

    def report(self) -> str:
        parts = []
        for k, t in sorted(self._t.items()):
            r = self._n[k] / t if t > 0 and self._n[k] else None
            parts.append(f"{k}: {t:.3f}s" +
                         (f" ({r:,.0f}/s)" if r else ""))
        return "  ".join(parts)


def counters_line(metric: str, value: float, unit: str,
                  vs_baseline: float | None = None) -> str:
    """The bench.py one-JSON-line convention."""
    d = {"metric": metric, "value": round(float(value), 1), "unit": unit}
    if vs_baseline is not None:
        d["vs_baseline"] = round(float(vs_baseline), 2)
    return json.dumps(d)
