"""Correctness gates: compare a backend render against the C++ oracle.

The perf tools (bench.py, tools/perfprobe.py) must never report a
throughput number for an image that is wrong — every timed scene goes
through this gate first (VERDICT r2 item 5: the per-config "Image match"
column of BASELINE.md is machine-produced, not builder-claimed).
"""
from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def oracle_check(static, tables, cam, render_fn: Callable,
                 h: int = 48, w: int = 128, tol: float = 2e-3,
                 time: float = 0.0) -> Tuple[float, float]:
    """Render ``render_fn(static, tables, cam, h, w, time)`` and the native
    C++ oracle at h×w; return (frac_ok, maxerr) where frac_ok is the
    fraction of pixels within ``tol`` of the oracle (per-pixel max over
    channels)."""
    from ..oracle.native_oracle import render_native

    img = np.asarray(render_fn(static, tables, cam, h, w, time))
    gold = render_native(static, tables, cam, h, w, time=time)
    err = np.abs(img - gold).max(axis=-1)
    return float((err < tol).mean()), float(err.max())


def assert_oracle_match(static, tables, cam, render_fn: Callable,
                        h: int = 48, w: int = 128, tol: float = 2e-3,
                        min_frac: float = 0.99, label: str = "") -> float:
    """oracle_check that raises AssertionError below ``min_frac`` — the
    loud-failure form the perf tools call before printing any number."""
    frac, maxerr = oracle_check(static, tables, cam, render_fn, h, w, tol)
    assert frac >= min_frac, (
        f"correctness gate FAILED{' for ' + label if label else ''}: "
        f"frac_ok={frac:.4f} < {min_frac} (maxerr {maxerr:.2e})")
    return frac
