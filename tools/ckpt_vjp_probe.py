"""Parity probe for the in-kernel checkpointed VJP (ops/pallas_vjp.py).

Compares vjp_pallas_ckpt against the whole-frame lax jax.vjp on small
frames: a straight shallow scene, a deep truncated tree, and a shrunken
marchy scene.  Run with --interpret on CPU or plain on the TPU.
"""
from __future__ import annotations

import argparse
import os
import sys
import time as _time
from dataclasses import replace

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--cases", default="straight,deep,march,march4d")
    ap.add_argument("--size", default="16x24")
    ap.add_argument("--march-chunk", type=int, default=None,
                    help="override march_chunk on the march cases (for "
                         "validating sweep candidates before pinning "
                         "default_plan)")
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import euclider_tpu as et
    from euclider_tpu.ops.pallas_vjp import vjp_pallas_ckpt

    H, W = (int(v) for v in args.size.split("x"))
    print(f"device: {jax.devices()[0]}  {H}x{W}", file=sys.stderr)

    def scene_case(name):
        if name == "straight":
            sc = et.get_scene("grad_probe")
            sc = replace(sc, settings=replace(sc.settings, max_depth=2))
            return sc, dict(trip_chunk=2)
        if name == "deep":
            sc = et.get_scene("config2_mirror_glass")
            # truncated traversal: full depth-4 tree is 15, cap at 11 so the
            # rolled chunks pad (K*cA=12 > trips=10) — the gating must hold
            sc = replace(sc, settings=replace(sc.settings, max_depth=4,
                                              max_nodes=11))
            return sc, dict(trip_chunk=4)
        if name == "march":
            sc = et.get_scene("config5_warp_portal")
            sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                              march_steps=23))
            return sc, dict(trip_chunk=1, march_chunk=5)
        if name == "march4d":
            sc = et.get_scene("config7_warp4d")
            sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                              march_steps=16))
            return sc, dict(trip_chunk=1, march_chunk=4)
        if name == "expr":
            sc = et.get_scene("config6_expr_space")
            sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                              march_steps=15))
            return sc, dict(trip_chunk=1, march_chunk=4)
        if name == "march_full":
            # the UNSHRUNKEN flagship scene (depth 4, 320 march steps):
            # full-scale reconstruction-drift check for the reversible
            # sweep at the production march_chunk
            sc = et.get_scene("config5_warp_portal")
            return sc, dict(trip_chunk=1, march_chunk=16)
        raise KeyError(name)

    rng = np.random.default_rng(0)
    failures = 0
    for case in args.cases.split(","):
        sc, kw = scene_case(case)
        if args.march_chunk is not None and "march_chunk" in kw:
            kw["march_chunk"] = args.march_chunk
        static, tables = et.compile_scene(sc)
        cam = et.compile_camera(sc.camera)
        t32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tables)
        g = rng.normal(size=(H, W, 3)).astype(np.float32)
        tm = jnp.float32(0.25)

        _, vjp = jax.vjp(
            lambda t, c, tt: et.render_image(static, t, c, H, W, True, tt),
            t32, cam, tm)
        gt_ref, gc_ref, gtm_ref = vjp(jnp.asarray(g))

        t0 = _time.time()
        try:
            gt, gc, gtm = vjp_pallas_ckpt(static, t32, cam, H, W, g,
                                          (8, 128), tm, args.interpret,
                                          **kw)
            gt = jax.block_until_ready(gt)
        except Exception as e:
            print(f"{case:10s} ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = _time.time() - t0

        err = 0.0
        rel = 0.0
        worst = ""
        paths = jax.tree_util.tree_flatten_with_path((gt_ref, gc_ref))[0]
        for (path, a), b in zip(paths, jax.tree.leaves((gt, gc))):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            if a.size == 0:
                continue
            e = np.abs(a - b).max()
            # a leaf only fails if it is wrong in BOTH senses: relative to
            # its own scale AND absolutely (a 1e-6 error on an identically
            # zero camera grad is float noise, not a defect)
            r = e / max(np.abs(a).max(), 1e-3) if e > 1e-4 else 0.0
            err = max(err, e)
            if r > rel:
                rel = r
                worst = (jax.tree_util.keystr(path)
                         + f" (|ref|max={np.abs(a).max():.3e})")
        etm = abs(float(gtm_ref) - float(gtm))
        ok = rel < 2e-3 and etm < 1e-3 * max(abs(float(gtm_ref)), 1.0)
        if not ok:
            failures += 1
        print(f"{case:10s} {'OK ' if ok else 'FAIL'} maxabs={err:.2e} "
              f"maxrel={rel:.2e} d_time_err={etm:.2e} ({dt:.1f}s)"
              + ("" if ok else f"  worst: {worst}"))
    return failures


if __name__ == "__main__":
    sys.exit(main())
