"""One-off probe: does the Pallas backward kernel compile + run on the real
TPU, and does it match the lax VJP there?  (Kept in tools/ as the on-chip
smoke test for the backward path; CI-grade coverage is the interpret-mode
test in tests/test_gradients.py.)"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

import euclider_tpu as et
from euclider_tpu.ops.pallas_kernel import render_image_pallas, vjp_pallas

H, W = int(sys.argv[2]) if len(sys.argv) > 2 else 64, \
       int(sys.argv[3]) if len(sys.argv) > 3 else 256
name = sys.argv[1] if len(sys.argv) > 1 else "grad_probe"


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    sc = et.get_scene(name)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tables)

    t0 = time.time()
    img = np.asarray(render_image_pallas(static, t32, cam, H, W))
    print(f"forward ok ({time.time()-t0:.1f}s) finite={np.isfinite(img).all()}",
          file=sys.stderr)

    g = np.random.default_rng(0).normal(size=(H, W, 3)).astype(np.float32)
    t0 = time.time()
    gt, gc, gtm = vjp_pallas(static, t32, cam, H, W, g)
    gt = jax.tree.map(np.asarray, gt)
    gc = jax.tree.map(np.asarray, gc)
    print(f"pallas bwd ok ({time.time()-t0:.1f}s)", file=sys.stderr)

    _, vjp = jax.vjp(
        lambda t, c: et.render_image(static, t, c, H, W, True), t32, cam)
    rt, rc = jax.tree.map(np.asarray, vjp(jnp.asarray(g)))
    worst = 0.0
    for a, b in zip(jax.tree.leaves((rt, rc)), jax.tree.leaves((gt, gc))):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1.0)
        rel = np.abs(a - b).max() / scale
        worst = max(worst, rel)
    print(f"max rel grad err vs lax vjp: {worst:.3e}", file=sys.stderr)
    assert worst < 3e-3, worst
    print("TPU_BWD_OK", worst)


if __name__ == "__main__":
    main()
