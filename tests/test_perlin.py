"""Perlin-fBm procedural surfaces: cross-backend exactness of the uint32
lattice hash, oracle parity, and Pallas kernel parity (SURVEY.md §8 item 5,
procedural noise textures)."""
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle, _perlin_fbm
from euclider_tpu.oracle.native_oracle import render_native
from euclider_tpu.ops import shading

from conftest import assert_images_close

RES = (20, 32)


def test_hash_matches_scalar_twin():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    xi = rng.integers(-1000, 1000, 64)
    yi = rng.integers(-1000, 1000, 64)
    a = np.asarray(shading._hash2(jnp.asarray(xi, jnp.int32).astype(jnp.uint32),
                                  jnp.asarray(yi, jnp.int32).astype(jnp.uint32),
                                  7))
    from euclider_tpu.oracle.cpu_oracle import _hash2 as scalar_hash
    b = np.asarray([scalar_hash(int(np.int32(x)) & 0xFFFFFFFF,
                                int(np.int32(y)) & 0xFFFFFFFF, 7)
                    for x, y in zip(xi, yi)], np.uint32)
    assert (a == b).all()


def test_field_matches_scalar_twin():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    pu = rng.uniform(-9, 9, 128).astype(np.float32)
    pv = rng.uniform(-9, 9, 128).astype(np.float32)
    a = np.asarray(shading.perlin_field(jnp.asarray(pu), jnp.asarray(pv),
                                        1.0, 3, 11))
    b = np.asarray([_perlin_fbm(float(u), float(v), 3, 11)
                    for u, v in zip(pu, pv)])
    assert np.abs(a - b).max() < 1e-5


def test_perlin_scene_backends_agree(compiled_scenes):
    _, static, tables, cam = compiled_scenes["perlin_probe"]
    H, W = RES
    lax = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    gold = render_oracle(static, tables, cam, H, W)
    assert_images_close(lax, gold, atol=1e-4, max_bad_frac=0.01,
                        msg="lax-vs-numpy perlin")
    native = render_native(static, tables, cam, H, W)
    assert_images_close(native, gold, atol=1e-6, msg="native-vs-numpy perlin")


def test_perlin_pallas_interpret_matches_lax(compiled_scenes):
    from euclider_tpu.ops.pallas_kernel import render_image_pallas
    _, static, tables, cam = compiled_scenes["perlin_probe"]
    a = np.asarray(et.render_image_jit(static, tables, cam, 16, 128))
    b = np.asarray(render_image_pallas(static, tables, cam, 16, 128,
                                       (8, 128), "while", True))
    assert_images_close(a, b, atol=1e-5, msg="pallas-vs-lax perlin")


def test_seed_changes_pattern():
    from euclider_tpu.scene import ir
    def probe(seed):
        e = ir.Entity(ir.HalfSpace((0, 0, 1), -3.0),
                      surface=ir.PerlinSurface(uv_scale=1.5, octaves=2,
                                               seed=seed))
        sc = ir.Scene(dim=3, entities=(e,),
                      settings=ir.RenderSettings(max_depth=1))
        static, tables = et.compile_scene(sc)
        cam = et.compile_camera(sc.camera)
        return np.asarray(et.render_image_jit(static, tables, cam, 12, 16))

    a, b, a2 = probe(0), probe(9), probe(0)
    assert np.array_equal(a, a2)           # deterministic
    assert np.abs(a - b).max() > 1e-3      # seed matters
