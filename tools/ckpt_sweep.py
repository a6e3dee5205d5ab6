"""Sweep (tile, trip_chunk, march_chunk) for the in-kernel ckpt backward."""
from __future__ import annotations

import os
import sys
import time as _time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

import euclider_tpu as et
from euclider_tpu.ops.pallas_kernel import render_image_pallas
from euclider_tpu.ops.pallas_vjp import vjp_pallas_ckpt

H, W = 720, 1280
N = 30   # >=30 steps per dispatch: docs/PERF.md §4 methodology


def time_cfg(name, tile, cA, cB):
    sc = et.get_scene(name)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tables)
    base = float(cam.tan_half_fov)

    @jax.jit
    def loop():
        def body(i, acc):
            tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
            c = cam._replace(tan_half_fov=tf)
            img = render_image_pallas(static, t32, c, H, W, (32, 256))
            g = jnp.full((H, W, 3), 1.0 / (H * W * 3), jnp.float32)
            gt, gc, gtm = vjp_pallas_ckpt(static, t32, c, H, W, g, tile,
                                          0.0, False, 0.0, None, cA, cB)
            return (acc + img[::97, ::97].sum()
                    + jnp.sum(gt.surf_color) + jnp.sum(gc.position))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    try:
        t0 = _time.time()
        v = float(loop())
        tc = _time.time() - t0
        assert np.isfinite(v), v
        t0 = _time.perf_counter()
        v = float(loop())
        dt = (_time.perf_counter() - t0) / N
        mrays = H * W / dt / 1e6
        print(f"{name:28s} tile={tile} cA={cA} cB={cB}  "
              f"{dt*1e3:7.2f} ms/step {mrays:8.1f} Mrays/s "
              f"(compile {tc:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:28s} tile={tile} cA={cA} cB={cB}  "
              f"ERROR {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "config5_warp_portal"
    for spec in sys.argv[2].split(";") if len(sys.argv) > 2 else \
            ["8x128,1,20", "8x256,1,20", "8x128,1,40", "8x256,1,40",
             "16x256,1,40"]:
        t, cA, cB = spec.split(",")
        th, tw = (int(x) for x in t.split("x"))
        time_cfg(name, (th, tw), int(cA), int(cB))
