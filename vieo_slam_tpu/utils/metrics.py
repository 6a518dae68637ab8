"""Metrics, timing, and leveled logging (observability subsystem).

TPU-native equivalent of the reference's mlog (common/mlog/log.h:109-155
`mlog::Timer` with static cumulative per-index averages; PRINT_INFO_MUTEX
leveled macros with ANSI colors and per-file sinks) plus the per-stage
"Used time in localBA=" chrono prints (src/LocalMapping.cc:140-147,
src/LoopClosing.cc:106-128) and the frontend mean/max tracking-time report
(Examples/Stereo/stereo_euroc.cc:325-333).

Design notes for the JAX pipeline:
- Stage timers measure HOST wall time around a stage.  Under async
  dispatch a jitted call returns before the device finishes, so a stage
  timer bounds *dispatch + host work*; end-to-end frame time (the number
  that matters for fps) is correct because the frame loop eventually
  blocks on results.  For device-side kernel truth use `trace()` which
  wraps `jax.profiler` (the reference's TIMER_FLOW analogue).
- Everything is process-global through `metrics` (like mlog's statics) but
  `Registry` instances can be created standalone for tests.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict
from dataclasses import dataclass


# --------------------------------------------------------------------------
# leveled logging (PRINT_ERR/INFO/DEBUG of common/mlog/log.h)

LOG_ERROR, LOG_WARN, LOG_INFO, LOG_DEBUG = 0, 1, 2, 3
_LEVEL_NAMES = {"error": 0, "warn": 1, "info": 2, "debug": 3}
_COLORS = {0: "\033[31m", 1: "\033[33m", 2: "\033[32m", 3: "\033[36m"}
_RESET = "\033[0m"


def _env_level() -> int:
    return _LEVEL_NAMES.get(
        os.environ.get("VIEO_LOG", "warn").lower(), LOG_WARN)


@dataclass
class _StageStat:
    """Cumulative stats of one named stage (mlog::Timer per-index slot)."""
    count: int = 0
    total: float = 0.0
    max: float = 0.0
    last: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total += dt
        self.last = dt
        if dt > self.max:
            self.max = dt

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class Registry:
    """Named stage timers + event counters + leveled logger."""

    def __init__(self, level: int | None = None, sink=None):
        self.stages: dict[str, _StageStat] = defaultdict(_StageStat)
        self.counters: dict[str, int] = defaultdict(int)
        self.level = _env_level() if level is None else level
        self.sink = sink or sys.stderr
        self.enabled = True
        self._files: dict[str, object] = {}

    # -- timing ------------------------------------------------------------

    @contextlib.contextmanager
    def timer(self, name: str):
        """`with metrics.timer("track"): ...` — cumulative host timing."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def add_time(self, name: str, dt: float):
        if self.enabled:
            self.stages[name].add(dt)

    # -- counters ------------------------------------------------------------

    def count(self, name: str, n: int = 1):
        if self.enabled:
            self.counters[name] += n

    def set_gauge(self, name: str, v):
        if self.enabled:
            self.counters[name] = v

    # -- logging -------------------------------------------------------------

    def _log(self, lvl: int, msg: str, file: str | None):
        if lvl <= self.level:
            print(f"{_COLORS[lvl]}[vieo]{_RESET} {msg}", file=self.sink)
        if file is not None:
            f = self._files.get(file)
            if f is None:
                f = self._files[file] = open(file, "a")
            f.write(msg + "\n")

    def error(self, msg: str, file: str | None = None):
        self._log(LOG_ERROR, msg, file)

    def warn(self, msg: str, file: str | None = None):
        self._log(LOG_WARN, msg, file)

    def info(self, msg: str, file: str | None = None):
        self._log(LOG_INFO, msg, file)

    def debug(self, msg: str, file: str | None = None):
        self._log(LOG_DEBUG, msg, file)

    # -- reporting -------------------------------------------------------------

    def report(self) -> dict:
        """Machine-readable snapshot: per-stage ms stats + counters."""
        return {
            "stages_ms": {
                k: {"count": s.count,
                    "mean": round(1e3 * s.mean, 3),
                    "max": round(1e3 * s.max, 3),
                    "last": round(1e3 * s.last, 3),
                    "total": round(1e3 * s.total, 1)}
                for k, s in sorted(self.stages.items())
            },
            "counters": dict(sorted(self.counters.items())),
        }

    def format_report(self) -> str:
        """Human table (the stereo_euroc.cc:325-333 exit report, widened)."""
        lines = [f"{'stage':<28}{'n':>7}{'mean ms':>10}{'max ms':>10}"
                 f"{'total s':>10}"]
        for k, s in sorted(self.stages.items()):
            lines.append(f"{k:<28}{s.count:>7}{1e3 * s.mean:>10.2f}"
                         f"{1e3 * s.max:>10.2f}{s.total:>10.2f}")
        if self.counters:
            lines.append("-- counters --")
            for k, v in sorted(self.counters.items()):
                lines.append(f"{k:<40}{v:>12}")
        return "\n".join(lines)

    def reset(self):
        self.stages.clear()
        self.counters.clear()

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


# process-global registry (mlog's statics)
metrics = Registry()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-truth profiling: wraps `jax.profiler.trace` (TIMER_FLOW
    equivalent).  View with tensorboard / xprof."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
