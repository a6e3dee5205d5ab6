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

import jax.numpy as jnp


def eval_surface(static, tables, s: int, u, v):
    """Evaluate surface index ``s`` (static) at batched UV.

    Returns (r, g, b, a) batched arrays.
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
    if kind == "texture":
        tex = tables.textures[static.surf_texture[s]]  # [th, tw, 3]
        th, tw = tex.shape[0], tex.shape[1]
        sc = tables.surf_uv_scale[s]
        # wrap UV, bilinear filter
        fu = jnp.mod(u * sc, 1.0) * (tw - 1)
        fv = jnp.mod(v * sc, 1.0) * (th - 1)
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
