"""Profiling / tracing hooks (SURVEY.md §5: the reference only has
wall-clock prints; here: jax.profiler traces + per-step timing fences).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with a device fence, plus EMA rates."""

    def __init__(self, items_per_step: int = 1, ema: float = 0.9):
        self.items = items_per_step
        self.ema = ema
        self.rate: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None) -> Dict[str, float]:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.time() - self._t0
        rate = self.items / dt if dt > 0 else 0.0
        self.rate = rate if self.rate is None else (
            self.ema * self.rate + (1 - self.ema) * rate)
        return {"step_s": dt, "items_per_s": rate, "items_per_s_ema": self.rate}


def debug_nans(enable: bool = True):
    """Toggle jax NaN checking (deterministic-debug aid)."""
    jax.config.update("jax_debug_nans", enable)
