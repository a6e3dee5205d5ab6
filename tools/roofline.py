"""Roofline + methodology probe for docs/PERF.md (VERDICT r3 item 7).

Produces:
  1. XLA cost_analysis of the differentiable lax forward at 720p — flop /
     transcendental counts per ray for the SAME math the Pallas megakernel
     runs (XLA cannot count inside the custom call, the lax twin is the
     bit-identical reference).
  2. An N-sweep of the in-program frame loop (tile 32x256, config1) to
     separate true per-frame device time from fixed per-dispatch overhead:
     measured ms/frame = t + C/N -> fit (t, C) by least squares.  This is
     the 1493-vs-926 question: both round-3 numbers came from different N.

Usage: python tools/roofline.py [--scene config1_sphere_room]
"""
from __future__ import annotations

import argparse
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
from euclider_tpu.ops.pallas_kernel import render_image_pallas

H, W = 720, 1280


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="config1_sphere_room")
    ap.add_argument("--ns", default="10,30,50,100,200")
    args = ap.parse_args()

    sc = et.get_scene(args.scene)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)

    # ---- 1) op counts from the compiled lax twin ----
    lowered = jax.jit(
        lambda t, c: et.render_image(static, t, c, H, W, False)
    ).lower(tables, cam)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    rays = H * W
    flops = float(ca.get("flops", float("nan")))
    trans = float(ca.get("transcendentals", float("nan")))
    bytes_ = float(ca.get("bytes accessed", float("nan")))
    print(f"scene={args.scene} {W}x{H}  (lax forward, XLA cost_analysis)")
    print(f"  flops total            : {flops:.3e}  ({flops/rays:.0f}/ray)")
    print(f"  transcendentals        : {trans:.3e}  ({trans/rays:.1f}/ray)")
    print(f"  bytes accessed         : {bytes_:.3e}  "
          f"({bytes_/rays:.0f}/ray)")

    # ---- 2) N-sweep of the in-program loop on the Pallas kernel ----
    base = float(cam.tan_half_fov)

    def make_loop(n):
        @jax.jit
        def loop():
            def body(i, acc):
                tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
                img = render_image_pallas(static, tables,
                                          cam._replace(tan_half_fov=tf),
                                          H, W, (32, 256))
                return acc + img[::97, ::97].sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    ns = [int(v) for v in args.ns.split(",")]
    rows = []
    for n in ns:
        loop = make_loop(n)
        v = float(loop())            # compile + warm
        assert np.isfinite(v)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(loop())
            reps.append((time.perf_counter() - t0) / n)
        dt = sorted(reps)[1] * 1e3   # median, ms/frame
        rows.append((n, dt))
        print(f"  N={n:4d}: {dt:7.3f} ms/frame  "
              f"{H*W/dt/1e3:8.1f} Mrays/s")

    # fit measured = t + C/N
    A = np.array([[1.0, 1.0 / n] for n, _ in rows])
    y = np.array([dt for _, dt in rows])
    (t, C), *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"  fit: per-frame t = {t:.3f} ms, fixed per-call overhead "
          f"C = {C:.1f} ms  -> asymptotic {H*W/t/1e3:.0f} Mrays/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
