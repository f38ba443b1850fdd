"""Progress reporting and structured logging.

TPU rebuild of ``/root/reference/src/reporting.jl``: ``NoProgressReport`` and a
throttled ``LogProgressReport`` with steps/sec and ETA.  Because warmup blocks
are whole-jitted on device, progress is reported at block boundaries from the
Python driver (host-callback-free, SURVEY.md C14), plus optional JSON-lines
structured logging for machines.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Optional, TextIO


@dataclasses.dataclass
class NoProgressReport:
    """Silent reporter (``reporting.jl:6``)."""

    def start_stage(self, name: str, total_steps: int = 0):
        pass

    def step(self, done: int, **info):
        pass

    def end_stage(self, **info):
        pass


@dataclasses.dataclass
class LogProgressReport:
    """Human-readable progress with steps/sec + ETA (``reporting.jl:39-109``).

    ``time_interval_s`` throttles output like the reference's
    ``time_interval_s`` / ``step_interval`` pair.
    """

    time_interval_s: float = 1.0
    stream: TextIO = dataclasses.field(default_factory=lambda: sys.stderr)
    _stage: str = ""
    _total: int = 0
    _t0: float = 0.0
    _last: float = 0.0

    def start_stage(self, name: str, total_steps: int = 0):
        self._stage, self._total = name, total_steps
        self._t0 = self._last = time.monotonic()
        print(f"[mcmc] {name}" + (f" ({total_steps} steps)" if total_steps else ""),
              file=self.stream)

    def step(self, done: int, **info):
        now = time.monotonic()
        if now - self._last < self.time_interval_s:
            return
        self._last = now
        rate = done / max(now - self._t0, 1e-9)
        eta = (self._total - done) / max(rate, 1e-9) if self._total else 0.0
        extra = ", ".join(f"{k}={v:.3g}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in info.items())
        print(f"[mcmc] {self._stage}: {done}/{self._total}"
              f" ({rate:.1f} steps/s, ETA {eta:.0f}s){' ' + extra if extra else ''}",
              file=self.stream)

    def end_stage(self, **info):
        dt = time.monotonic() - self._t0
        extra = ", ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in info.items())
        print(f"[mcmc] {self._stage} done in {dt:.2f}s"
              f"{' — ' + extra if extra else ''}", file=self.stream)


@dataclasses.dataclass
class JsonLinesReport:
    """Machine-readable structured logging: one JSON object per event."""

    stream: TextIO = dataclasses.field(default_factory=lambda: sys.stderr)
    _stage: str = ""
    _t0: float = 0.0

    def _emit(self, event: str, **kw):
        # default=float: numpy/JAX scalars are natural reporter payloads
        # (eps, acceptance); the logging path must never abort a run
        print(json.dumps({"event": event, "stage": self._stage,
                          "t": time.time(), **kw}, default=float),
              file=self.stream)

    def start_stage(self, name: str, total_steps: int = 0):
        self._stage = name
        self._t0 = time.monotonic()
        self._emit("stage_start", total_steps=total_steps)

    def step(self, done: int, **info):
        self._emit("progress", done=done, **info)

    def end_stage(self, **info):
        self._emit("stage_end", wall_s=time.monotonic() - self._t0, **info)


def default_reporter(interactive: Optional[bool] = None):
    """Verbose when interactive, silent otherwise (``reporting.jl:116-122``)."""
    if interactive is None:
        interactive = sys.stderr.isatty()
    return LogProgressReport() if interactive else NoProgressReport()
