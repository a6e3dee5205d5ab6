"""Component-SoA 4-vector math for TPU.

Every vector is four separate ``[batch...]`` arrays (x, y, z, w).  This keeps
all traced arrays in plain batch shapes (e.g. ``(8, 128)`` inside a Pallas
tile, ``(H, W)`` in the lax renderer), which map directly onto TPU
(sublane, lane) tiles — there is never a trailing size-3/4 axis fighting the
128-lane layout.  3D scenes simply carry a constant-zero ``w`` that XLA
const-folds away.

Reference parity: replaces euclider's nalgebra Point3/Point4/Vector3/Vector4
substrate (upstream ``src/util.rs`` + nalgebra crate; SURVEY.md L0).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Vec(NamedTuple):
    """A (possibly batched) 4-vector as four component arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray


def vec(x, y, z, w=0.0, dtype=jnp.float32) -> Vec:
    return Vec(jnp.asarray(x, dtype), jnp.asarray(y, dtype),
               jnp.asarray(z, dtype), jnp.asarray(w, dtype))


def from_array(a, dtype=jnp.float32) -> Vec:
    """Build a Vec from a trailing-axis-4 (or -3) array."""
    a = jnp.asarray(a, dtype)
    if a.shape[-1] == 3:
        zero = jnp.zeros_like(a[..., 0])
        return Vec(a[..., 0], a[..., 1], a[..., 2], zero)
    return Vec(a[..., 0], a[..., 1], a[..., 2], a[..., 3])


def to_array(v: Vec) -> jnp.ndarray:
    return jnp.stack([v.x, v.y, v.z, v.w], axis=-1)


def splat(v: Vec, batch_shape) -> Vec:
    """Broadcast a scalar Vec to a batch shape."""
    return Vec(*(jnp.broadcast_to(c, batch_shape) for c in v))


def add(a: Vec, b: Vec) -> Vec:
    return Vec(a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w)


def sub(a: Vec, b: Vec) -> Vec:
    return Vec(a.x - b.x, a.y - b.y, a.z - b.z, a.w - b.w)


def scale(a: Vec, s) -> Vec:
    return Vec(a.x * s, a.y * s, a.z * s, a.w * s)


def madd(a: Vec, s, b: Vec) -> Vec:
    """a + s * b  (fused ray-advance primitive)."""
    return Vec(a.x + s * b.x, a.y + s * b.y, a.z + s * b.z, a.w + s * b.w)


def dot(a: Vec, b: Vec):
    return a.x * b.x + a.y * b.y + a.z * b.z + a.w * b.w


def norm2(a: Vec):
    return dot(a, a)


def norm(a: Vec):
    return jnp.sqrt(norm2(a))


def normalize(a: Vec, eps: float = 1e-20) -> Vec:
    inv = jax_rsqrt(norm2(a) + eps)
    return scale(a, inv)


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def where(mask, a: Vec, b: Vec) -> Vec:
    return Vec(jnp.where(mask, a.x, b.x), jnp.where(mask, a.y, b.y),
               jnp.where(mask, a.z, b.z), jnp.where(mask, a.w, b.w))


def reflect(d: Vec, n: Vec) -> Vec:
    """Mirror d about the plane with (unit) normal n."""
    k = 2.0 * dot(d, n)
    return Vec(d.x - k * n.x, d.y - k * n.y, d.z - k * n.z, d.w - k * n.w)


def refract(d: Vec, n: Vec, eta):
    """Snell refraction of unit d at unit normal n (facing against d).

    eta = ior_from / ior_to.  Returns (dir, valid) where valid=False marks
    total internal reflection (transmitted contribution is dropped, matching
    the oracle's semantics — see docs/SEMANTICS.md §transitions).
    """
    cos_i = -dot(d, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    valid = k > 0.0
    # safe-where: sqrt has an infinite derivative at 0, and NaNs from the
    # invalid (TIR) branch would leak through jnp.where in reverse mode
    k_safe = jnp.sqrt(jnp.where(valid, k, 1.0))
    coef = eta * cos_i - k_safe
    out = Vec(eta * d.x + coef * n.x, eta * d.y + coef * n.y,
              eta * d.z + coef * n.z, eta * d.w + coef * n.w)
    return normalize(out), valid


def matvec(m, v: Vec) -> Vec:
    """Apply a static-indexed 4x4 matrix to a Vec.

    Accepts the matrix as [4, 4] (lax path) or as a flat [16] row (Pallas
    path: the kernels keep portal matrices flat because Mosaic cannot
    lower the 3D->2D reshape the [P,4,4] view's TRANSPOSE would need)."""
    def get(i, j):
        return m[4 * i + j] if m.ndim == 1 else m[i, j]

    return Vec(
        get(0, 0) * v.x + get(0, 1) * v.y + get(0, 2) * v.z + get(0, 3) * v.w,
        get(1, 0) * v.x + get(1, 1) * v.y + get(1, 2) * v.z + get(1, 3) * v.w,
        get(2, 0) * v.x + get(2, 1) * v.y + get(2, 2) * v.z + get(2, 3) * v.w,
        get(3, 0) * v.x + get(3, 1) * v.y + get(3, 2) * v.z + get(3, 3) * v.w,
    )


def comp(v: Vec, i: int):
    """Static component access."""
    return (v.x, v.y, v.z, v.w)[i]
