"""Render observability: phase timers + throughput counters.

The reference has no profiling at all — wall-clock is measured client-side
in the browser (test-client/app.tsx:71,144-145,188) and the server logs one
line per 60-pixel chunk (src/server.rs:192, ~45k lines per render).  Here:
structured per-phase timing, rays/sec accounting, and a render summary.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

log = logging.getLogger("raytracer_tpu.stats")


@dataclass
class RenderStats:
    """Accumulates per-phase wall time and ray counts for one render."""

    phases: dict = field(default_factory=dict)  # name -> seconds
    rays: int = 0
    samples: int = 0
    pixels: int = 0
    bands: int = 0  # device dispatch batches (serving-path band count)
    started: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (time.time() - t0)

    @property
    def wall(self) -> float:
        return time.time() - self.started

    @property
    def mrays_per_s(self) -> float:
        return self.rays / max(self.wall, 1e-9) / 1e6

    def summary(self) -> dict:
        return {
            "wall_s": round(self.wall, 3),
            "rays": self.rays,
            "mrays_per_s": round(self.mrays_per_s, 2),
            "samples": self.samples,
            "pixels": self.pixels,
            "bands": self.bands,
            "phases": {k: round(v, 3) for k, v in self.phases.items()},
        }

    def log_summary(self, prefix: str = "") -> None:
        log.info("%srender stats: %s", prefix, self.summary())


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Capture a JAX profiler trace (TensorBoard/Perfetto format) around a
    render when ``trace_dir`` is set; no-op otherwise.

    This is the device-side complement to RenderStats' host-side phase
    timers (SURVEY §5 asks for both): the trace records per-HLO / per-Pallas
    kernel device time, so e.g. the BVH traversal kernel vs the coherence
    sort vs the shading ops can be apportioned directly.  View with
    ``tensorboard --logdir <dir>`` (profile plugin) or upload the contained
    ``*.trace.json.gz`` to Perfetto.
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    log.info("device trace written to %s", trace_dir)


class Throughput:
    """Simple EMA throughput meter for streaming paths."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha
        self.value = 0.0
        self._last: float | None = None

    def tick(self, units: float) -> float:
        now = time.time()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = units / dt
            self.value = self.alpha * inst + (1 - self.alpha) * self.value
        self._last = now
        return self.value
