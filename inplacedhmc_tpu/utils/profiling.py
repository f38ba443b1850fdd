"""Tracing / profiling hooks (SURVEY.md §5 "tracing/profiling").

The reference's closest artifacts are the per-transition tree statistics and
the throttled steps/sec reporter (``NUTS.jl:229-242``, ``reporting.jl:90-109``).
Here: (a) tree statistics are first-class (``TreeStats``), (b) the reporter
carries steps/sec + ETA, and (c) this module adds device-level profiling —
``jax.profiler`` trace capture around any sampling region plus lightweight
per-stage wall-clock aggregation.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a ``jax.profiler`` trace (TensorBoard format) for the enclosed
    region — kernel timelines, HBM traffic, fusion boundaries.

    Usage::

        with device_trace("/tmp/nuts-trace"):
            res = sample(key, model, 1000, 4096)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Wall-clock accounting per named stage; feeds structured logs.

    Use as a reporter companion: ``timer.stage("tuning 400")`` context-manages
    one stage; ``timer.summary()`` returns {stage: seconds}.
    """

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))


def annotate(name: str):
    """Named profiler annotation for custom regions (shows up in traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
