"""Golden-image regression (VERDICT r2 #9): committed 48x64 C++-oracle
renders of every library scene (tests/goldens.npz, regenerated only via
tools/make_goldens.py).

The cross-backend parity tests prove lax == Pallas == oracle *today*; the
goldens additionally pin the semantics in time, so a drift that moves the
oracle and all backends together still fails here until reviewed."""
import os

import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.scene.library import BUILDERS

H, W = 48, 64
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def test_goldens_cover_every_scene(goldens):
    assert sorted(goldens.files) == sorted(BUILDERS), (
        "tests/goldens.npz out of date — run tools/make_goldens.py and "
        "review the diff")


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_native_oracle_matches_golden(goldens, name, compiled_scenes):
    from euclider_tpu.oracle.native_oracle import render_native

    _, static, tables, cam = compiled_scenes[name]
    img = np.asarray(render_native(static, tables, cam, H, W), np.float32)
    # float64 oracle, float32 storage: bit-stable up to storage rounding
    assert np.abs(img - goldens[name]).max() <= 1e-6, name


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_lax_backend_matches_golden(goldens, name, compiled_scenes):
    _, static, tables, cam = compiled_scenes[name]
    img = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    err = np.abs(img - goldens[name]).max(axis=-1)
    bad = (err > 2e-3).mean()
    assert bad <= 0.01, (
        f"{name}: {bad:.4f} of pixels drifted beyond 2e-3 from the "
        f"committed golden (max {err.max():.2e})")
