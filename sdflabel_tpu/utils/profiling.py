"""Tracing / profiling helpers (SURVEY.md §5 tracing row).

The reference has nothing beyond prints; here: jax.profiler traces and a
throughput meter for the north-star rays/s metric.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Counts rays (pixels x iterations) / crops / frames per second.

    Note (axon backend): block the result to the HOST before calling
    tick() — block_until_ready returns at enqueue on the tunneled TPU.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.rays = 0
        self.crops = 0
        self.frames = 0

    def tick(self, rays: int = 0, crops: int = 0, frames: int = 0):
        self.rays += rays
        self.crops += crops
        self.frames += frames

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rates(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        return {
            "rays_per_s": self.rays / dt,
            "crops_per_hour": self.crops / dt * 3600.0,
            "frames_per_hour": self.frames / dt * 3600.0,
            "elapsed_s": dt,
        }
