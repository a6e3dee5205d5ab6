"""Bisect which part of the march custom-VJP kills the TPU compile helper.

Stages:
  fwd      — kernel runs the march custom_vjp primal only
  vjp      — kernel runs jax.vjp through it (fwd + bwd)
  finish   — kernel vjp's ONLY march_finish (bisection transpose)
  loop     — kernel vjp's ONLY the chunk sweep (finish cotangents zeroed)
Usage: python tools/march_bisect.py fwd|vjp|finish|loop [--interpret]
"""
from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from dataclasses import replace
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "vjp"
    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    import euclider_tpu as et
    from euclider_tpu.ops import march as M
    from euclider_tpu.ops import trace as T
    from euclider_tpu.ops.pallas_kernel import (_table_views,
                                                _unpack_tables)
    from euclider_tpu.ops.pallas_vjp import make_march_ckpt
    from euclider_tpu.ops.vec import Vec

    sc = et.get_scene("config5_warp_portal")
    sc = replace(sc, settings=replace(sc.settings, max_depth=1,
                                      march_steps=23))
    static, tables = et.compile_scene(sc)
    t32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tables)
    views = _table_views(t32)
    n_views = len(views)
    TH, TW = 8, 128

    def kernel(*refs):
        view_refs = refs[:n_views]
        out_ref = refs[n_views]
        vs = tuple(r[:] for r in view_refs)
        tbl = _unpack_tables(vs)

        yi = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0
                                      ).astype(jnp.float32) * 0.01
        xi = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1
                                      ).astype(jnp.float32) * 0.01
        org = Vec(xi * 0.1, yi * 0.1, jnp.zeros_like(xi),
                  jnp.zeros_like(xi))
        d = Vec(jnp.zeros_like(xi) + 0.1, jnp.zeros_like(xi) - 0.05,
                jnp.zeros_like(xi) - 1.0, jnp.zeros_like(xi))
        dn = jax.tree.map(lambda a: a, d)
        mat = jnp.zeros((TH, TW), jnp.int32)
        wm = T.warp_mask(static, mat + 1)     # material 1 is the warp
        h = jnp.full((TH, TW), 0.06, jnp.float32)
        tm = jnp.float32(0.25)

        impl = make_march_ckpt(static, 5)

        if stage == "fwd":
            hit, p, dvec, ent, n, u, v = impl(static, tbl, tm, mat + 1,
                                              org, d, h, wm)
            out_ref[:] = p.x + dvec.y + u + v + n.z
            return

        if stage == "finish":
            def f(vs2, orgx):
                tbl2 = _unpack_tables(vs2)
                o2 = Vec(orgx, org.y, org.z, org.w)
                carry = M.march_init(static, tbl2, o2, d, wm)
                accel = T.make_accel(static, tbl2, mat + 1, tm)
                body0 = M.make_march_body(static, tbl2, accel, h)
                carry = jax.lax.fori_loop(0, 23, lambda i, c: body0(c),
                                          carry)
                hit, p, dvec, ent, n, u, v = M.march_finish(static, tbl2,
                                                            o2, carry)
                return p.x + dvec.y + u + v + n.z

            val, vjp = jax.vjp(f, vs, org.x)
            dvs, dox = vjp(jnp.ones_like(val))
            out_ref[:] = val + dox + dvs[0].sum()
            return

        def f(vs2, orgx):
            tbl2 = _unpack_tables(vs2)
            o2 = Vec(orgx, org.y, org.z, org.w)
            hit, p, dvec, ent, n, u, v = impl(static, tbl2, tm, mat + 1,
                                              o2, d, h, wm)
            if stage == "loop":
                return p.x * 0.0 + dvec.y    # cotangent only into dvec
            return p.x + dvec.y + u + v + n.z

        val, vjp = jax.vjp(f, vs, org.x)
        dvs, dox = vjp(jnp.ones_like(val))
        out_ref[:] = val + dox + dvs[0].sum()

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in views],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.float32),
        interpret=interpret,
    )(*views)
    out = np.asarray(out)
    print(f"{stage}: ok, finite={np.isfinite(out).all()}, "
          f"sum={out.sum():.4f}")


if __name__ == "__main__":
    main()
