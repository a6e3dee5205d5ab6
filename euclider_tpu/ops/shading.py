"""Surface shading: per-surface-kind color evaluation.

Reference parity: euclider's Surface trait — get_surface_color (UV-mapped
textures / checkerboard via MappedTexture), get_reflection_ratio (constant
per surface here), get_reflection_direction (mirror reflection, applied in
ops.trace) — upstream ``src/universe/entity/surface.rs``; SURVEY.md §2.1.
There are no explicit light sources in the reference's shading model
(SURVEY.md §3.3 note); color comes from surfaces, reflections, translucency
transitions, and the void background.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_texture_matmul(tex: np.ndarray) -> np.ndarray:
    """Pack a [th, tw, 3] texture into the channel-stacked transpose
    [tw*3, th] consumed by the matmul sampler (texT[c*tw + x, y] =
    tex[y, x, c]).  Used to ship textures into Pallas kernels as plain 2D
    VMEM blocks."""
    tex = np.asarray(tex, np.float32)
    th, tw = tex.shape[0], tex.shape[1]
    return np.concatenate([tex[:, :, c].T for c in range(3)],
                          axis=0).reshape(tw * 3, th)


def _sample_bilinear_matmul(texT, fu, fv, th: int, tw: int):
    """Bilinear texture lookup with NO gathers — TPU/Mosaic-native.

    The interpolation weights along each texture axis form a 'hat' matrix
    (max(0, 1-|coord - index|)): contracting the texture with the row-hat is
    a small MXU matmul, and the column-hat contraction is a VPU
    multiply + sublane reduction.  Runs row-by-row over the pixel tile so
    pixels stay on the lane axis throughout (Mosaic supports neither
    pixel-flattening reshapes nor vector gathers — probed empirically on
    v5e).  Exactly equals the gather-based bilinear filter (same clamped
    edge semantics: fu,fv in [0, tw-1]x[0, th-1]).

    texT: [tw*3, th] packed texture (pack_texture_matmul).
    fu, fv: [TH, TW] texel-space coordinates.
    Returns (r, g, b) arrays of shape [TH, TW].
    """
    TH, TW = fu.shape
    riota = jax.lax.broadcasted_iota(jnp.int32, (th, TW), 0).astype(texT.dtype)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (tw, TW), 0).astype(texT.dtype)
    rowmask = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
    out = [jnp.zeros((TH, TW), texT.dtype) for _ in range(3)]
    for i in range(TH):
        fvi = jax.lax.slice(fv, (i, 0), (i + 1, TW))          # [1, TW]
        fui = jax.lax.slice(fu, (i, 0), (i + 1, TW))
        rowhat = jnp.maximum(0.0, 1.0 - jnp.abs(fvi - riota))  # [th, TW]
        # HIGHEST precision: the MXU's default bf16 input truncation costs
        # ~3e-3 absolute error on fractional hat weights (measured on v5e);
        # full-f32 passes are cheap at this size and restore parity with
        # the gather-based filter
        D = jnp.dot(texT, rowhat,
                    preferred_element_type=texT.dtype,
                    precision=jax.lax.Precision.HIGHEST)       # [tw*3, TW]
        colhat = jnp.maximum(0.0, 1.0 - jnp.abs(fui - ciota))  # [tw, TW]
        sel = rowmask == i
        for c in range(3):
            Dc = jax.lax.slice(D, (c * tw, 0), ((c + 1) * tw, TW))
            oc = jnp.sum(colhat * Dc, axis=0, keepdims=True)   # [1, TW]
            out[c] = jnp.where(sel, oc, out[c])
    return out[0], out[1], out[2]


# ---------------------------------------------------------------------------
# Perlin gradient noise (procedural texture; SURVEY.md §8 item 5)
# ---------------------------------------------------------------------------
#
# Cross-backend-exact integer lattice hash (uint32 wraparound arithmetic —
# identical in XLA, NumPy, and C++), gradients from a trig-free 8-direction
# table, quintic fade.  The jnp path below, the scalar oracle
# (oracle/cpu_oracle.py) and the C++ VM (oracle/native/oracle.cpp) implement
# the same contract; docs/SEMANTICS.md pins it.

_INV_SQRT2 = 0.7071067811865476

# (gx, gy) per 3-bit hash value
_PERLIN_DIRS = ((1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0),
                (_INV_SQRT2, _INV_SQRT2), (-_INV_SQRT2, _INV_SQRT2),
                (_INV_SQRT2, -_INV_SQRT2), (-_INV_SQRT2, -_INV_SQRT2))


def _hash2(xi, yi, seed: int):
    """uint32 lattice hash; xi, yi are uint32 arrays."""
    n = (xi * jnp.uint32(374761393) + yi * jnp.uint32(668265263)
         + jnp.uint32((seed * 974711) & 0xFFFFFFFF))
    n = (n ^ (n >> jnp.uint32(13))) * jnp.uint32(1274126177)
    return n ^ (n >> jnp.uint32(16))


def _grad_dot(h3, dx, dy):
    """dot(gradient[h3], (dx, dy)) via a static where-chain (no gathers)."""
    gx, gy = _PERLIN_DIRS[0]
    out = gx * dx + gy * dy
    for k in range(1, 8):
        gx, gy = _PERLIN_DIRS[k]
        out = jnp.where(h3 == k, gx * dx + gy * dy, out)
    return out


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin2(pu, pv, seed: int):
    """One octave of 2D Perlin noise at (pu, pv); range ~[-0.71, 0.71]."""
    x0f = jnp.floor(pu)
    y0f = jnp.floor(pv)
    xf = pu - x0f
    yf = pv - y0f
    x0 = x0f.astype(jnp.int32).astype(jnp.uint32)
    y0 = y0f.astype(jnp.int32).astype(jnp.uint32)
    one = jnp.uint32(1)
    h = [(_hash2(x0 + (one if cx else jnp.uint32(0)),
                 y0 + (one if cy else jnp.uint32(0)), seed)
          & jnp.uint32(7)).astype(jnp.int32)
         for cy in (0, 1) for cx in (0, 1)]
    n00 = _grad_dot(h[0], xf, yf)
    n01 = _grad_dot(h[1], xf - 1.0, yf)
    n10 = _grad_dot(h[2], xf, yf - 1.0)
    n11 = _grad_dot(h[3], xf - 1.0, yf - 1.0)
    sx = _fade(xf)
    sy = _fade(yf)
    nx0 = n00 + sx * (n01 - n00)
    nx1 = n10 + sx * (n11 - n10)
    return nx0 + sy * (nx1 - nx0)


def perlin_field(u, v, scale, octaves: int, seed: int):
    """fBm over ``octaves`` (lacunarity 2, gain 0.5), mapped to [0, 1]."""
    acc = 0.0
    amp = 1.0
    freq = 1.0
    for o in range(octaves):
        acc = acc + amp * perlin2(u * scale * freq, v * scale * freq,
                                  seed + o)
        amp *= 0.5
        freq *= 2.0
    return jnp.clip(0.5 + 0.5 * acc, 0.0, 1.0)


def eval_surface(static, tables, s: int, u, v, texture_matmul: bool = False):
    """Evaluate surface index ``s`` (static) at batched UV.

    Returns (r, g, b, a) batched arrays.  ``texture_matmul=True`` selects the
    gather-free matmul sampler (Pallas kernels); tables.textures must then
    hold pack_texture_matmul layouts ([tw*3, th]) instead of [th, tw, 3].
    """
    kind = static.surf_kinds[s]
    col = tables.surf_color[s]
    if kind == "uniform":
        shape = jnp.shape(u)
        return (jnp.broadcast_to(col[0], shape), jnp.broadcast_to(col[1], shape),
                jnp.broadcast_to(col[2], shape), jnp.broadcast_to(col[3], shape))
    if kind == "checker":
        sc = tables.surf_uv_scale[s]
        par = jnp.mod(jnp.floor(u * sc) + jnp.floor(v * sc), 2.0)
        sel = par >= 0.5
        col2 = tables.surf_color2[s]
        return (jnp.where(sel, col2[0], col[0]),
                jnp.where(sel, col2[1], col[1]),
                jnp.where(sel, col2[2], col[2]),
                jnp.where(sel, col2[3], col[3]))
    if kind == "smooth":
        sc = tables.surf_uv_scale[s]
        two_pi = 2.0 * jnp.pi
        f = 0.25 * (1.0 + jnp.sin(two_pi * u * sc)) \
                 * (1.0 + jnp.sin(two_pi * v * sc))
        col2 = tables.surf_color2[s]
        return tuple(col[c] + (col2[c] - col[c]) * f for c in range(4))
    if kind == "perlin":
        octaves, seed = static.surf_perlin[s]
        f = perlin_field(u, v, tables.surf_uv_scale[s], octaves, seed)
        col2 = tables.surf_color2[s]
        return tuple(col[c] + (col2[c] - col[c]) * f for c in range(4))
    if kind == "texture":
        tex = tables.textures[static.surf_texture[s]]
        if texture_matmul:                       # packed [tw*3, th]
            th, tw = int(tex.shape[1]), int(tex.shape[0]) // 3
        else:                                    # [th, tw, 3]
            th, tw = tex.shape[0], tex.shape[1]
        sc = tables.surf_uv_scale[s]
        # wrap UV, bilinear filter
        fu = jnp.mod(u * sc, 1.0) * (tw - 1)
        fv = jnp.mod(v * sc, 1.0) * (th - 1)
        if texture_matmul:
            r, g, b = _sample_bilinear_matmul(tex, fu, fv, th, tw)
            alpha = jnp.broadcast_to(col[3], jnp.shape(u))
            return r, g, b, alpha
        x0 = jnp.floor(fu)
        y0 = jnp.floor(fv)
        dx = fu - x0
        dy = fv - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, tw - 1)
        y1i = jnp.minimum(y0i + 1, th - 1)

        def sample(yi, xi, c):
            return tex[yi, xi, c]

        out = []
        for c in range(3):
            v00 = sample(y0i, x0i, c)
            v01 = sample(y0i, x1i, c)
            v10 = sample(y1i, x0i, c)
            v11 = sample(y1i, x1i, c)
            out.append((v00 * (1 - dx) + v01 * dx) * (1 - dy)
                       + (v10 * (1 - dx) + v11 * dx) * dy)
        alpha = jnp.broadcast_to(col[3], jnp.shape(u))
        return out[0], out[1], out[2], alpha
    raise ValueError(f"unknown surface kind {kind!r}")
