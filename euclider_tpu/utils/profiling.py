"""Observability: rays/s counters, per-phase timers, jax.profiler hooks.

Reference had eyeballed FPS at most (SURVEY.md §5).  Here: a RenderMeter
producing the structured per-step log that feeds BASELINE.md (rays/s/chip,
Mrays/s aggregate, step time), and a context manager around
jax.profiler.trace for TensorBoard/Perfetto traces of the render/gather
phases.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class RenderMeter:
    """Accumulates per-frame timings and reports rays/s."""

    H: int
    W: int
    n_chips: int = 1
    times: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def add(self, seconds: float, frames: int = 1) -> None:
        """Record a timing that covered ``frames`` frames in one measurement
        (the in-program frame loop of bench.py/perfprobe renders N frames
        inside a single dispatch); stored as the per-frame average."""
        self.times.extend([seconds / frames] * frames)

    @property
    def rays_per_frame(self) -> int:
        return self.H * self.W

    def mrays_per_sec(self) -> float:
        if not self.times:
            return 0.0
        dt = sum(self.times) / len(self.times)
        return self.rays_per_frame / dt / 1e6

    def mrays_per_sec_per_chip(self) -> float:
        return self.mrays_per_sec() / max(self.n_chips, 1)

    def report(self, label: str = "render") -> dict:
        rec = {
            "label": label,
            "frames": len(self.times),
            "resolution": f"{self.W}x{self.H}",
            "ms_per_frame": (1000 * sum(self.times) / len(self.times)
                             if self.times else None),
            "mrays_per_s": round(self.mrays_per_sec(), 2),
            "mrays_per_s_per_chip": round(self.mrays_per_sec_per_chip(), 2),
            "chips": self.n_chips,
        }
        return rec

    def log(self, label: str = "render") -> None:
        print(json.dumps(self.report(label)))


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None):
    """jax.profiler trace context (TensorBoard/Perfetto) — no-op if logdir
    is None."""
    if logdir is None:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
