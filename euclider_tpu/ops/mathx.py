"""Kernel-safe transcendentals built from Mosaic-lowerable primitives.

Mosaic (Pallas TPU) has no lowering for atan/atan2/acos/asin, so the trace
path implements them from mul/add/sqrt/select (pallas_guide.md: "If something
is not available in pallas, you should implement it").  Used by BOTH the lax
and Pallas backends so the two stay bit-identical; accuracy ~2e-9 (beyond
float32 resolution; in f64 runs the same polynomial caps accuracy
at ~2e-9 — shared with Mosaic so lax and Pallas stay bit-identical), fully
differentiable.

atan core: odd degree-19 polynomial in x on [-1, 1] (Chebyshev-node least
squares, max err 1.8e-9), range-reduced via atan(x) = pi/2 - atan(1/x).
"""
from __future__ import annotations

import jax.numpy as jnp

_ATAN_COEFFS = (
    9.999999975460e-01, -3.333328229551e-01, 1.999823064038e-01,
    -1.426157368032e-01, 1.094019896528e-01, -8.372063948415e-02,
    5.746355785479e-02, -3.071750891086e-02, 1.068071944976e-02,
    -1.743701144660e-03,
)

_HALF_PI = 1.5707963267948966
_PI = 3.141592653589793


def _atan_core(x):
    """atan on |x| <= 1."""
    t = x * x
    acc = jnp.asarray(_ATAN_COEFFS[-1], x.dtype)
    for c in _ATAN_COEFFS[-2::-1]:
        acc = acc * t + jnp.asarray(c, x.dtype)
    return x * acc


def _as_float(x):
    """float input passes through (f32 or f64); non-float becomes f32."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    return x


def atan(x):
    x = _as_float(x)
    ax = jnp.abs(x)
    big = ax > 1.0
    # safe reciprocal for the reduced branch
    inv = 1.0 / jnp.where(big, ax, 1.0)
    core = _atan_core(jnp.where(big, inv, ax))
    res = jnp.where(big, _HALF_PI - core, core)
    return jnp.where(x < 0, -res, res)


def atan2(y, x):
    """Quadrant-correct atan2 with the libm convention.

    atan2(0, 0) = 0 (callers guard the degenerate input anyway)."""
    y = _as_float(y)
    x = _as_float(x)
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = atan(y / safe_x)
    # x > 0: base;  x < 0: base +- pi;  x == 0: +-pi/2 (0 if y==0)
    res = jnp.where(
        x > 0.0, base,
        jnp.where(x < 0.0,
                  base + jnp.where(y < 0.0, -_PI, _PI),
                  jnp.where(y == 0.0, 0.0,
                            jnp.where(y < 0.0, -_HALF_PI, _HALF_PI))))
    return res


def asin(x):
    """asin via atan(x / sqrt(1 - x^2)); callers pre-clip |x| < 1."""
    x = _as_float(x)
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return atan(x / s)


def acos(x):
    return _HALF_PI - asin(x)
