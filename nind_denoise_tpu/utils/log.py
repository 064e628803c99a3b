"""stdout + logfile tee, and per-stage wall-clock timers.

The reference only has a Printer class
(/root/reference/src/nind_denoise/nn_common.py:364-378) and ad-hoc elapsed
prints; this framework adds first-class stage timers and optional
``jax.profiler`` trace capture (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


class Printer:
    def __init__(self, tostdout: bool = True, tofile: bool = True, file_path: str = "log"):
        self.tostdout = tostdout
        self.tofile = tofile
        self.file_path = file_path

    def print(self, msg) -> None:
        if self.tostdout:
            print(msg, flush=True)
        if self.tofile:
            try:
                with open(self.file_path, "a") as f:
                    f.write(str(msg) + "\n")
            except OSError as e:
                print(f"Warning: could not write to log: {e}")


class StageTimers:
    """Accumulating named wall-clock timers (decode/dispatch/stitch/encode...)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        parts = [f"{k}: {v:.3f}s/{self.counts[k]}x" for k, v in sorted(self.totals.items())]
        return ", ".join(parts)


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace context when a directory is given, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
