"""Tracing and profiling helpers.

The reference's observability is `-i INFO` stderr prints, manual
stopwatches (`decoder/src/Timer.hh`) and gprof builds (SURVEY §5.1).
Here:

* `StageTimer` — named wall-clock stages with a summary line, used by
  CLIs at `--info 2+`;
* `device_trace` — context manager around `jax.profiler.trace` writing
  an XPlane trace viewable in TensorBoard/Perfetto (set
  ``AALTOASR_TRACE_DIR`` or pass a path).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time


class StageTimer:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: list = []
        self._current = None
        self._t0 = 0.0

    def start(self, name: str) -> None:
        self.stop()
        self._current = name
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._current is not None:
            self.stages.append(
                (self._current, time.perf_counter() - self._t0))
            self._current = None

    @contextlib.contextmanager
    def stage(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop()

    def report(self, out=sys.stderr) -> None:
        self.stop()
        if not self.enabled:
            return
        total = sum(t for _, t in self.stages)
        for name, t in self.stages:
            print(f"  {name:<24s} {t:8.3f}s "
                  f"({100 * t / max(total, 1e-9):5.1f}%)", file=out)
        print(f"  {'total':<24s} {total:8.3f}s", file=out)


@contextlib.contextmanager
def device_trace(trace_dir: str | None = None):
    """Capture a device profile when a trace directory is configured."""
    trace_dir = trace_dir or os.environ.get("AALTOASR_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
    print(f"device trace written to {trace_dir}", file=sys.stderr)
