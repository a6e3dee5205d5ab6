"""Regenerate the committed golden images (tests/goldens.npz).

48x64 C++-oracle renders of every acceptance config (+ probes), float32.
The goldens pin today's semantics: a change that moves the oracle and the
backends *together* (a silent semantic drift the cross-backend parity
tests cannot see) fails tests/test_goldens.py until the drift is reviewed
and this script is deliberately re-run.

Usage:  python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

H, W = 48, 64
OUT = os.path.join(_ROOT, "tests", "goldens.npz")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import euclider_tpu as et
    from euclider_tpu.oracle.native_oracle import render_native
    from euclider_tpu.scene.library import BUILDERS

    arrays = {}
    for name in sorted(BUILDERS):
        sc = BUILDERS[name]()
        static, tables = et.compile_scene(sc)
        cam = et.compile_camera(sc.camera)
        img = np.asarray(render_native(static, tables, cam, H, W),
                         np.float32)
        assert np.isfinite(img).all(), name
        arrays[name] = img
        print(f"{name:28s} mean={img.mean():.4f}", file=sys.stderr)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, "
          f"{len(arrays)} scenes at {W}x{H})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
