"""Perf probe: in-program frame loop per scene / tile size.

Times the Pallas megakernel with N frames rendered inside ONE jitted
lax.fori_loop (each frame perturbs tan_half_fov so nothing is CSE'd away,
and each frame's sum feeds the carry so every render must execute).  This
measures pure device throughput — per-dispatch tunnel latency is paid once
and amortised, unlike timing N separate dispatches.

Usage:  python tools/perfprobe.py [--scenes s1,s2] [--tiles 16x128,32x256]
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
from euclider_tpu.utils.profiling import RenderMeter
from euclider_tpu.utils.validate import assert_oracle_match

H, W = 720, 1280
N = 30


def gate_scene(name: str, static, tables, cam) -> float:
    """Oracle correctness gate: no throughput number is printed for a scene
    whose Pallas render does not match the C++ oracle (fails loudly)."""
    frac = assert_oracle_match(
        static, tables, cam,
        lambda st, t, c, h, w, tm: render_image_pallas(st, t, c, h, w,
                                                       (16, 128), "while",
                                                       False, tm),
        label=name)
    print(f"{name:28s} oracle gate: frac_ok={frac:.4f}",
          file=sys.stderr, flush=True)
    return frac


def time_scene(name: str, tile, n=N) -> float:
    sc = et.get_scene(name)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    gate_scene(name, static, tables, cam)
    base = float(cam.tan_half_fov)

    @jax.jit
    def loop():
        def body(i, acc):
            tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
            img = render_image_pallas(static, tables,
                                      cam._replace(tan_half_fov=tf), H, W,
                                      tile)
            return acc + img[::97, ::97].sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.time()
    v = float(loop())
    t_first = time.time() - t0
    meter = RenderMeter(H, W)
    t0 = time.perf_counter()
    v = float(loop())
    meter.add(time.perf_counter() - t0, n)
    assert np.isfinite(v), v
    mrays = meter.mrays_per_sec()
    rep = meter.report(name)
    print(f"{name:28s} tile={tile}  {rep['ms_per_frame']:7.3f} ms/frame  "
          f"{mrays:8.1f} Mrays/s   (first call {t_first:.1f}s)",
          file=sys.stderr, flush=True)
    return mrays


def time_grad(name: str, n=10, h=360, w=640, backend="lax") -> float:
    """Forward+backward throughput: one jitted in-program loop of n gradient
    evaluations of mean(render) w.r.t. scene tables + camera (the inverse-
    rendering step's cost).

    backend: 'lax' (whole-frame differentiable lax render),
    'pallas-kernel' (Pallas forward + dedicated Pallas backward kernel),
    'pallas-ckpt' (Pallas forward + in-kernel checkpointed VJP),
    'pallas-auto' (the shipping auto routing),
    'pallas-blocked' (Pallas forward + row-blocked lax recompute)."""
    sc = et.get_scene(name)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    gate_scene(name, static, tables, cam)   # no number without the oracle
    t32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tables)
    base = float(cam.tan_half_fov)

    from euclider_tpu.ops.trace import render_image

    if backend == "pallas-fused":
        from euclider_tpu.ops.pallas_vjp import train_step_pallas

        tgt = jnp.zeros((h, w, 3), jnp.float32)

        @jax.jit
        def loop():
            def body(i, acc):
                tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
                l, gt, gc, gtm = train_step_pallas(
                    static, t32, cam._replace(tan_half_fov=tf), tgt, h, w)
                return (acc + l + jnp.sum(gt.surf_color)
                        + jnp.sum(gc.position))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.time()
        v = float(loop())
        t_first = time.time() - t0
        t0 = time.perf_counter()
        v = float(loop())
        dt = (time.perf_counter() - t0) / n
        assert np.isfinite(v), v
        mrays = h * w / dt / 1e6
        print(f"{name:28s} fwd+bwd[{backend}] {h}x{w}  {dt*1e3:7.2f} "
              f"ms/step  {mrays:8.1f} Mrays/s   (first call {t_first:.1f}s)",
              file=sys.stderr, flush=True)
        return mrays

    if backend == "lax":
        def loss(t, c):
            return jnp.mean(render_image(static, t, c, h, w, True))
    else:
        from euclider_tpu.ops.pallas_kernel import render_image_pallas_diff
        bwd = {"pallas-kernel": "pallas", "pallas-ckpt": "ckpt",
               "pallas-auto": "auto",
               "pallas-blocked": "blocked"}[backend]

        def loss(t, c):
            img = render_image_pallas_diff(static, t, c, h, w, 0.0, bwd,
                                           (32, 256))
            return jnp.mean(img)

    grad = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def loop():
        def body(i, acc):
            tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
            gt, gc = grad(t32, cam._replace(tan_half_fov=tf))
            return acc + jnp.sum(gt.surf_color) + jnp.sum(gc.position)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.time()
    v = float(loop())
    t_first = time.time() - t0
    t0 = time.perf_counter()
    v = float(loop())
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(v), v
    mrays = h * w / dt / 1e6
    print(f"{name:28s} fwd+bwd[{backend}] {h}x{w}  {dt*1e3:7.2f} ms/step  "
          f"{mrays:8.1f} Mrays/s   (first call {t_first:.1f}s)",
          file=sys.stderr, flush=True)
    return mrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="config1_sphere_room")
    ap.add_argument("--tiles", default="16x128")
    ap.add_argument("--frames", type=int, default=N)
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd gradient steps instead of renders")
    ap.add_argument("--grad-backend", default="lax",
                    choices=["lax", "pallas-kernel", "pallas-ckpt",
                             "pallas-auto", "pallas-fused",
                             "pallas-blocked"])
    ap.add_argument("--size", default="720x1280")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    gh, gw = (int(v) for v in args.size.split("x"))
    if args.grad:
        # >= 30 steps per dispatch: the ~28 ms tunnel-relay overhead must
        # stay < 1 ms/step or the number is mostly relay (docs/PERF.md §4 —
        # the deprecated n=6 flavor overstated ms/step by ~4.6 ms)
        for name in args.scenes.split(","):
            time_grad(name, max(30, args.frames), gh, gw,
                      args.grad_backend)
        return
    tiles = [tuple(int(v) for v in t.split("x"))
             for t in args.tiles.split(",")]
    for name in args.scenes.split(","):
        for tile in tiles:
            time_scene(name, tile, args.frames)


if __name__ == "__main__":
    main()
