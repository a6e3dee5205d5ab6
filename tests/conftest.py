"""Test harness config: force CPU with an 8-device virtual mesh.

SURVEY.md §4.4: multi-host logic is exercised without a cluster via
xla_force_host_platform_device_count.  Must run before jax is imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to the tunneled TPU regardless of
# the env var; override it post-import so tests run on the virtual CPU mesh
# and never contend for the shared chip.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the config5 march + differentiable-bounce
# programs take minutes to compile on CPU XLA; cache them across suite runs
# (first run warms the cache, later runs are IO-bound only).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()


@pytest.fixture(scope="session")
def compiled_scenes():
    """Compile every library scene once per session."""
    import euclider_tpu as et
    from euclider_tpu.scene.library import BUILDERS
    out = {}
    for name in BUILDERS:
        sc = BUILDERS[name]()
        static, tables = et.compile_scene(sc)
        cam = et.compile_camera(sc.camera)
        out[name] = (sc, static, tables, cam)
    return out


def assert_images_close(a, b, atol=1e-4, max_bad_frac=0.0, msg=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    err = np.abs(a - b).max(axis=-1)
    bad = (err > atol).mean()
    assert bad <= max_bad_frac, (
        f"{msg}: {bad:.4f} of pixels differ by > {atol} "
        f"(max err {err.max():.5f})")
