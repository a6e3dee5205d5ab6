"""Unit tests for the component-SoA vector substrate (ops/vec.py)."""
import jax.numpy as jnp
import numpy as np

from euclider_tpu.ops import vec as V


def _v(*c):
    return V.vec(*c)


def test_dot_norm():
    a = _v(1.0, 2.0, 3.0, 4.0)
    assert float(V.dot(a, a)) == 30.0
    assert np.isclose(float(V.norm(a)), np.sqrt(30.0))


def test_normalize_unit():
    a = _v(3.0, 0.0, 4.0, 0.0)
    n = V.normalize(a)
    assert np.allclose(V.to_array(n), [0.6, 0.0, 0.8, 0.0], atol=1e-6)


def test_reflect_involution():
    d = V.normalize(_v(1.0, -1.0, 0.3, 0.0))
    n = _v(0.0, 1.0, 0.0, 0.0)
    r = V.reflect(d, n)
    rr = V.reflect(r, n)
    assert np.allclose(V.to_array(rr), V.to_array(d), atol=1e-6)
    # angle preserved: |d.n| == |r.n|
    assert np.isclose(abs(float(V.dot(d, n))), abs(float(V.dot(r, n))), atol=1e-6)


def test_refract_identity_eta1():
    d = V.normalize(_v(0.5, -1.0, 0.2, 0.0))
    n = _v(0.0, 1.0, 0.0, 0.0)
    out, ok = V.refract(d, n, jnp.float32(1.0))
    assert bool(ok)
    assert np.allclose(V.to_array(out), V.to_array(d), atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta = 1/1.5): sin(theta_t) = sin(45)/1.5
    d = V.normalize(_v(1.0, -1.0, 0.0, 0.0))
    n = _v(0.0, 1.0, 0.0, 0.0)
    out, ok = V.refract(d, n, jnp.float32(1.0 / 1.5))
    assert bool(ok)
    sin_t = float(out.x)  # x-component of unit transmitted dir
    assert np.isclose(sin_t, np.sin(np.deg2rad(45)) / 1.5, atol=1e-6)


def test_refract_tir():
    # grazing exit from glass to vacuum: eta = 1.5, TIR expected
    d = V.normalize(_v(1.0, -0.2, 0.0, 0.0))
    n = _v(0.0, 1.0, 0.0, 0.0)
    _, ok = V.refract(d, n, jnp.float32(1.5))
    assert not bool(ok)


def test_matvec():
    m = jnp.eye(4) * 2.0
    a = _v(1.0, 2.0, 3.0, 4.0)
    out = V.matvec(m, a)
    assert np.allclose(V.to_array(out), [2, 4, 6, 8])


def test_batched_broadcast():
    a = V.Vec(jnp.ones((4, 8)), jnp.zeros((4, 8)), jnp.zeros((4, 8)),
              jnp.zeros((4, 8)))
    b = _v(0.0, 1.0, 0.0, 0.0)
    s = V.add(a, b)
    assert s.x.shape == (4, 8)
    assert float(V.dot(s, s)[0, 0]) == 2.0
