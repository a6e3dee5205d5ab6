"""Benchmark entry: Mrays/s/chip at 1280x720 on the headline 3D scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is measured against the BASELINE.json target of 50 Mrays/s/chip
(the reference publishes no numbers — SURVEY.md §6), so vs_baseline = value/50.

Backend: Pallas megakernel on the TPU chip; falls back to the lax backend if
Pallas fails to compile on the current platform.  Extra diagnostics go to
stderr; stdout carries exactly the one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

# persistent compilation cache: Mosaic compiles through the axon tunnel can
# take minutes cold; cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

H, W = 720, 1280
SCENE = "config1_sphere_room"
TARGET_MRAYS = 50.0
TILE = (32, 256)   # best of the tile sweep on v5e (tools/perfprobe.py)
# 30 frames per dispatch: the committed measurement convention (docs/PERF.md
# §4) — quoted throughput then UNDER-states the device by the fixed ~28 ms
# tunnel-relay overhead amortised over 30 frames.  Rounds 1-4 used 50 frames
# (same kernel, more amortisation): r4's 1418 and a 30-frame ~930 are the
# SAME device performance, t = 0.097 ms/frame fitted (tools/roofline.py).
ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    import numpy as np
    import euclider_tpu as et

    dev = jax.devices()[0]
    log(f"device: {dev} platform={jax.default_backend()}")

    sc = et.get_scene(SCENE)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)

    import jax.numpy as jnp

    backend = "pallas"
    try:
        from euclider_tpu.ops.pallas_kernel import render_image_pallas

        t0 = time.time()
        img = np.asarray(render_image_pallas(static, tables, cam, H, W, TILE))
        log(f"pallas compile+first run: {time.time()-t0:.1f}s")
        render_ = lambda c: render_image_pallas(static, tables, c, H, W, TILE)
    except Exception as e:  # pragma: no cover
        log(f"pallas failed ({type(e).__name__}: {e}); falling back to lax")
        backend = "lax"
        render_ = lambda c: et.render_image_jit(static, tables, cam, H, W)
        img = np.asarray(render_(cam))

    # in-program frame loop: ITERS frames rendered inside ONE jitted
    # fori_loop (each perturbs tan_half_fov so no frame is CSE'd away, and
    # each frame's subsampled sum feeds the carry so every render must
    # execute).  This measures pure device throughput — the per-dispatch
    # RPC latency of the tunneled platform is paid once and amortised,
    # instead of once per frame.
    import jax

    base = float(cam.tan_half_fov)

    @jax.jit
    def frame_loop():
        def body(i, acc):
            tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
            im = render_(cam._replace(tan_half_fov=tf))
            return acc + im[::97, ::97].sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    if np.isnan(img).any():
        log("ERROR: NaNs in rendered frame")
        return 1

    # correctness gate against the C++ oracle at low res (shared helper —
    # utils/validate.py, same gate tools/perfprobe.py applies per scene).
    # HARD gate: any failure — mismatch, broken oracle build, import error —
    # exits nonzero before a throughput number can be printed.  A bench that
    # cannot prove its image is right has no number to report.
    from euclider_tpu.utils.validate import assert_oracle_match

    if backend == "pallas":
        from euclider_tpu.ops.pallas_kernel import render_image_pallas as rp
        rfn = lambda st, t, c, h, w, tm: rp(st, t, c, h, w)
    else:
        rfn = lambda st, t, c, h, w, tm: et.render_image_jit(st, t, c, h, w)
    frac = assert_oracle_match(static, tables, cam, rfn, label=SCENE)
    log(f"correctness vs C++ oracle (48x128): frac_ok={frac:.4f}")

    v = float(frame_loop())  # compile + warm
    assert np.isfinite(v), v
    # median of 5 reps — the BASELINE.md methodology ("median of reps after
    # warmup"): the shared tunneled chip shows +/-10-25% single-rep variance,
    # and one rep is only ~60 ms, so extra reps are free
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        v = float(frame_loop())
        times.append((time.perf_counter() - t0) / ITERS)
    dt = sorted(times)[len(times) // 2]
    mrays = H * W / dt / 1e6
    log(f"backend={backend} {dt*1000:.2f} ms/frame "
        f"({ITERS}-frame in-program loop, median of {len(times)} reps; "
        f"spread {min(times)*1e3:.2f}-{max(times)*1e3:.2f} ms)")

    print(json.dumps({
        "metric": f"Mrays/s/chip ({SCENE} {W}x{H}, {backend})",
        "value": round(mrays, 1),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / TARGET_MRAYS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
