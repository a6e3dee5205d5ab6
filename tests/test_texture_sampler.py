"""The gather-free matmul texture sampler must equal the gather-based
bilinear filter exactly (same clamped-edge semantics) and stay
differentiable w.r.t. both texture values and UV coordinates.

The sampler exists because Mosaic supports neither pixel-flattening
reshapes nor vector gathers (ops/shading.py _sample_bilinear_matmul);
the hat-matrix contraction is the TPU-idiomatic replacement.
"""
import numpy as np
import jax
import jax.numpy as jnp

from euclider_tpu.ops.shading import (_sample_bilinear_matmul,
                                      pack_texture_matmul)

TH, TW = 16, 64
th, tw = 32, 48


def _bilinear_gather(tex, fu, fv):
    x0 = np.floor(fu).astype(int)
    y0 = np.floor(fv).astype(int)
    x1 = np.minimum(x0 + 1, tw - 1)
    y1 = np.minimum(y0 + 1, th - 1)
    dx = fu - x0
    dy = fv - y0
    out = np.zeros(fu.shape + (3,), np.float64)
    for c in range(3):
        out[..., c] = ((tex[y0, x0, c] * (1 - dx) + tex[y0, x1, c] * dx)
                       * (1 - dy)
                       + (tex[y1, x0, c] * (1 - dx) + tex[y1, x1, c] * dx)
                       * dy)
    return out


def _fixtures(seed=0):
    rng = np.random.RandomState(seed)
    tex = rng.rand(th, tw, 3).astype(np.float32)
    fu = (rng.rand(TH, TW) * (tw - 1)).astype(np.float32)
    fv = (rng.rand(TH, TW) * (th - 1)).astype(np.float32)
    return tex, fu, fv


def test_matmul_sampler_matches_gather():
    tex, fu, fv = _fixtures()
    texT = pack_texture_matmul(tex)
    assert texT.shape == (tw * 3, th)
    r, g, b = _sample_bilinear_matmul(jnp.asarray(texT), jnp.asarray(fu),
                                      jnp.asarray(fv), th, tw)
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    ref = _bilinear_gather(tex.astype(np.float64), fu.astype(np.float64),
                           fv.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-5


def test_matmul_sampler_exact_texel_centers():
    """At integer texel coords the sampler returns the texel exactly."""
    tex, _, _ = _fixtures(1)
    texT = pack_texture_matmul(tex)
    yi, xi = np.mgrid[0:TH, 0:TW]
    fu = (xi % tw).astype(np.float32)
    fv = (yi % th).astype(np.float32)
    r, g, b = _sample_bilinear_matmul(jnp.asarray(texT), jnp.asarray(fu),
                                      jnp.asarray(fv), th, tw)
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    ref = tex[fv.astype(int), fu.astype(int)]
    assert np.abs(got - ref).max() < 1e-6


def test_matmul_sampler_gradients():
    """d(sample)/d(texture) and d(sample)/d(uv) are finite and correct."""
    tex, fu, fv = _fixtures(2)
    texT = jnp.asarray(pack_texture_matmul(tex))
    fuj, fvj = jnp.asarray(fu), jnp.asarray(fv)

    def loss_tex(t):
        r, g, b = _sample_bilinear_matmul(t, fuj, fvj, th, tw)
        return jnp.sum(r * 0.3 + g * 0.5 + b * 0.2)

    gt = jax.grad(loss_tex)(texT)
    assert np.isfinite(np.asarray(gt)).all()
    # total weight conservation: sum of d(loss)/d(texel) over the packed
    # texture equals 0.3+0.5+0.2 per pixel (bilinear weights sum to 1)
    assert abs(float(jnp.sum(gt)) - TH * TW * 1.0) < 1e-2

    def loss_uv(fu_, fv_):
        r, g, b = _sample_bilinear_matmul(texT, fu_, fv_, th, tw)
        return jnp.sum(r + g + b)

    gu, gv = jax.grad(loss_uv, argnums=(0, 1))(fuj, fvj)
    assert np.isfinite(np.asarray(gu)).all()
    assert np.isfinite(np.asarray(gv)).all()
    # central finite difference on a handful of pixels (away from integer
    # coords where the hat kinks); FD on the *per-pixel* value, not the
    # frame sum, to avoid f32 cancellation — the sum's gradient at (i,j)
    # equals the pointwise derivative since pixels are independent
    def val(fu_, i, j):
        r, g, b = _sample_bilinear_matmul(texT, jnp.asarray(fu_), fvj,
                                          th, tw)
        return float(r[i, j] + g[i, j] + b[i, j])

    eps = 1e-3
    for (i, j) in [(0, 0), (5, 17), (11, 40)]:
        if min(fu[i, j] % 1, 1 - fu[i, j] % 1) < 5 * eps:
            continue
        fup = fu.copy()
        fup[i, j] += eps
        fum = fu.copy()
        fum[i, j] -= eps
        fd = (val(fup, i, j) - val(fum, i, j)) / (2 * eps)
        assert abs(fd - float(gu[i, j])) < 1e-2, (fd, float(gu[i, j]))
