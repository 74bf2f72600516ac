"""Tracing / profiling helpers (SURVEY.md section 5.1).

The reference brackets load phases with wall-clock prints
(world.cpp:56,95-129) and estimates per-frame fps (ray.cpp:713-716).
Here: the same phase timers (world.py verbose mode) plus a
``jax.profiler`` trace context for device-side analysis and a frame
meter that reports ms + Mrays/s.
"""

from __future__ import annotations

import contextlib
import sys
import time


@contextlib.contextmanager
def phase(name: str, file=sys.stderr):
    """Wall-clock span printed like the reference's load-phase logs."""
    t0 = time.monotonic()
    yield
    print(f"{name}: {time.monotonic() - t0:f} seconds", file=file)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameMeter:
    """Per-frame timing + throughput (the reference's fps estimator,
    ray.cpp:713-716, extended with the Mrays/s the benchmark derives)."""

    def __init__(self, width: int, height: int, rays_per_pixel: int = 6):
        self.rays = width * height * rays_per_pixel
        self._t0: float | None = None
        self.last_ms: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> tuple[float, float]:
        """Returns (frame_ms, mrays_per_s)."""
        dt = time.perf_counter() - self._t0
        self.last_ms = dt * 1e3
        return self.last_ms, self.rays / dt / 1e6
