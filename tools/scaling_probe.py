"""Multi-host scaling measurement harness (VERDICT r2 #10; SURVEY §6:
rays/s at 1 chip / 1 host / N hosts, >=90% efficiency 1->2 hosts).

Runs the rows-sharded Pallas render over ALL global devices with an
in-program frame loop (same methodology as bench.py: every frame feeds the
carry, fov perturbed against CSE) and prints ONE JSON line with
Mrays/s totals and per-chip.  Efficiency is computed against
--baseline-mrays-per-chip (the 1-chip or 1-host number from a prior run).

Single host (today's environment):
    python tools/scaling_probe.py --scene config1_sphere_room

Each host of a pod slice (when hardware exists):
    python tools/scaling_probe.py --coordinator host0:1234 \
        --num-processes 2 --process-id $RANK --scene config1_sphere_room

On a CPU device farm pass --interpret (Pallas interpret mode).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="config1_sphere_room")
    ap.add_argument("--size", default="720x1280", help="WxH-ish: H x W")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--tile", default="16x128")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "lax", "pallas-fused"],
                    help="pallas-fused (--grad only): the shipping "
                         "single-kernel training step per chip "
                         "(train.inverse.make_fused_value_and_grad)")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--chips", type=int, default=None,
                    help="restrict to first N local devices (single-host "
                         "only; for the 1-chip baseline row)")
    ap.add_argument("--baseline-mrays-per-chip", type=float, default=None)
    ap.add_argument("--grad", action="store_true",
                    help="time the sharded TRAINING step (loss + psum-"
                         "reduced grads through the Pallas kernels both "
                         "directions) instead of the forward render")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax

    # honor an explicit JAX_PLATFORMS=cpu request even when the axon
    # sitecustomize pins the platform to the tunneled TPU (same override as
    # tests/conftest.py and __graft_entry__.py)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    import euclider_tpu as et
    from euclider_tpu.parallel import distributed as D
    from euclider_tpu.parallel.mesh import make_mesh, render_image_sharded

    multi = D.initialize(args.coordinator, args.num_processes,
                         args.process_id)
    pidx, pcnt = D.process_info()

    if multi:
        if args.chips is not None:
            raise SystemExit("--chips is a single-host option")
        mesh = D.make_render_mesh()
    else:
        mesh = make_mesh(args.chips)
    n = int(mesh.devices.size)

    h, w = (int(v) for v in args.size.split("x"))
    H = -(-h // n) * n                      # rows must divide the mesh
    tile = tuple(int(v) for v in args.tile.split("x"))
    print(f"[{pidx}/{pcnt}] devices={n} mesh={mesh.shape} H={H} W={w} "
          f"backend={args.backend}", file=sys.stderr, flush=True)

    sc = et.get_scene(args.scene)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    if multi:
        tables = D.replicate_to_global(tables, mesh)
        cam = D.replicate_to_global(cam, mesh)
    base = float(np.asarray(jax.device_get(cam.tan_half_fov)))

    if args.grad:
        # multi-chip TRAINING throughput: per-shard Pallas fwd+bwd via the
        # custom_vjp (backward='auto'), grads psum-reduced over the mesh
        # (SURVEY §2.2 gradient-reduction row; VERDICT r3 item 4)
        from euclider_tpu.train.inverse import (InverseParams,
                                                make_fused_value_and_grad,
                                                make_loss_fn)

        t32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tables)
        target = jnp.zeros((H, w, 3), jnp.float32)
        if multi:
            target = D.replicate_to_global(target, mesh)
        if args.backend == "pallas-fused":
            fvg = make_fused_value_and_grad(static, H, w, mesh, None,
                                            args.interpret)
            vg = lambda p: fvg(p, target)
        else:
            loss_fn = make_loss_fn(static, H, w, mesh, args.backend, tile,
                                   args.interpret)
            vg = jax.value_and_grad(lambda p: loss_fn(p, target))

        @jax.jit
        def frame_loop():
            def body(i, acc):
                tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
                l, g = vg(InverseParams(t32, cam._replace(tan_half_fov=tf)))
                return (acc + l + jnp.sum(g.tables.surf_color)
                        + jnp.sum(g.cam.position))
            return jax.lax.fori_loop(0, args.frames, body, jnp.float32(0.0))
    else:
        if args.backend == "pallas-fused":
            raise SystemExit("--backend pallas-fused requires --grad")

        def render(c):
            return render_image_sharded(static, tables, c, H, w, mesh,
                                        False, args.backend, tile,
                                        args.interpret)

        @jax.jit
        def frame_loop():
            def body(i, acc):
                tf = jnp.float32(base) * (1.0 + 1e-6 * i.astype(jnp.float32))
                im = render(cam._replace(tan_half_fov=tf))
                return acc + im[::97, ::97].sum()
            return jax.lax.fori_loop(0, args.frames, body, jnp.float32(0.0))

    t0 = time.time()
    v = float(frame_loop())
    print(f"[{pidx}] compile+warm {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    assert np.isfinite(v), v
    t0 = time.perf_counter()
    v = float(frame_loop())
    dt = (time.perf_counter() - t0) / args.frames
    mrays = H * w / dt / 1e6
    rec = {
        "scene": args.scene, "resolution": f"{w}x{H}",
        "mode": "train_step" if args.grad else "render",
        "chips": n, "hosts": pcnt,
        "ms_per_frame": round(dt * 1e3, 3),
        "mrays_per_s": round(mrays, 1),
        "mrays_per_s_per_chip": round(mrays / n, 1),
    }
    if args.baseline_mrays_per_chip:
        rec["efficiency_vs_baseline"] = round(
            (mrays / n) / args.baseline_mrays_per_chip, 4)
    if pidx == 0:
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
