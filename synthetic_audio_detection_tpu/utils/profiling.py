"""Tracing / profiling subsystem.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only). This
module provides the two tools a TPU deployment actually needs:

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting an XPlane
  trace viewable in TensorBoard / Perfetto (device kernels + host timeline).
- ``StageTimer``: lightweight named wall-clock stages with EWMA smoothing for
  steady-state reporting — the per-stage numbers behind the seg/s benchmark.
- ``annotate(name)``: TraceAnnotation wrapper so host stages show up inside
  profiler traces.

On tunneled TPU runtimes where device timelines are unavailable, ``trace``
degrades to host-only tracing rather than failing.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Profile everything inside the block into `logdir`."""
    try:
        jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named host annotation that nests into profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StageTimer:
    """Named stage timers with exponential smoothing.

    Usage:
        t = StageTimer()
        with t.stage("decode"): ...
        with t.stage("mel+model"): ...
        print(t.report())
    """

    alpha: float = 0.2
    ewma: Dict[str, float] = field(default_factory=dict)
    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        with annotate(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        prev = self.ewma.get(name)
        self.ewma[name] = dt if prev is None else prev + self.alpha * (dt - prev)

    def report(self) -> str:
        lines = []
        for name in self.totals:
            n = self.counts[name]
            lines.append(
                f"{name}: total {self.totals[name]:.3f}s over {n} calls "
                f"(mean {self.totals[name] / n * 1e3:.1f} ms, "
                f"ewma {self.ewma[name] * 1e3:.1f} ms)"
            )
        return "\n".join(lines)
