"""Mosaic capability probe for the in-kernel checkpointed VJP design.

The round-4 backward architecture (ops/pallas_vjp.py) rests on four Mosaic
lowering capabilities that the earlier kernels never exercised together:

  1. run_scoped VMEM scratch with *dynamic* (traced) leading-index store/load
     inside fori loops — the in-VMEM checkpoint stack.
  2. jax.vjp-traced straight-line code inside a ROLLED fori body — the
     hand-composed chunk transpose (trace-time construct, but the resulting
     loop body must lower).
  3. lax.cond with vector outputs inside a kernel, and inside a vjp'd
     function (transpose-of-cond) — tile-level early exit in the backward.
  4. custom_vjp whose bwd allocates its own scratch via run_scoped, nested
     under an outer jax.vjp inside a fori body — the march-level machinery.

Run:  python tools/mosaic_probe.py            (real TPU)
      JAX_PLATFORMS=cpu python tools/mosaic_probe.py --interpret
Each probe prints OK/FAIL with a max-error vs a pure-lax reference.
"""
from __future__ import annotations

import argparse
import os
import sys
from functools import partial

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 8, 128
K = 6          # checkpoints
C = 4          # steps per chunk


def step(x, w):
    """One nonlinear 'march step' with a parameter."""
    return x + 0.1 * jnp.tanh(w * x)


def ref_fwd(x, w):
    for _ in range(K * C):
        x = step(x, w)
    return x


# --- probe 1+2: checkpointed forward + hand-rolled reverse in one kernel ----

def _ckpt_kernel(interpret_unused, x_ref, w_ref, g_ref, dx_ref, dw_ref):
    x0 = x_ref[:]
    w = w_ref[0, 0]
    g = g_ref[:]

    def body(ck):
        def fwd_chunk(k, x):
            ck[pl.ds(k, 1)] = x[None]
            for _ in range(C):
                x = step(x, w)
            return x

        jax.lax.fori_loop(0, K, fwd_chunk, x0)

        def bwd_chunk(j, acc):
            dx, dw = acc
            k = K - 1 - j
            xk = ck[pl.ds(k, 1)][0]

            def chunk_fn(x, w):
                for _ in range(C):
                    x = step(x, w)
                return x

            _, vjp = jax.vjp(chunk_fn, xk, w)
            dx, dwk = vjp(dx)
            return dx, dw + dwk

        dx, dw = jax.lax.fori_loop(0, K, bwd_chunk, (g, jnp.float32(0.0)))
        dx_ref[:] = dx
        dw_ref[0, 0] = dw

    pl.run_scoped(body, pltpu.VMEM((K, TH, TW), jnp.float32))


def probe_ckpt(interpret):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(TH, TW)),
                    jnp.float32)
    w = jnp.float32(0.7)
    g = jnp.asarray(np.random.default_rng(1).normal(size=(TH, TW)),
                    jnp.float32)

    dx, dw = pl.pallas_call(
        partial(_ckpt_kernel, None),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
    )(x, jnp.full((1, 1), w), g)

    _, vjp = jax.vjp(ref_fwd, x, w)
    dx_ref, dw_ref = vjp(g)
    e1 = float(jnp.abs(dx - dx_ref).max())
    e2 = abs(float(dw[0, 0]) - float(dw_ref))
    return max(e1, e2 / max(abs(float(dw_ref)), 1.0))


# --- probe 3: lax.cond in-kernel, plain and under vjp ------------------------

def _cond_kernel(x_ref, g_ref, y_ref, dx_ref):
    x = x_ref[:]
    g = g_ref[:]

    def f(x):
        # tile-level gate on a traced predicate (data-dependent)
        return jax.lax.cond(jnp.sum(x) > 0.0,
                            lambda v: v * 2.0 + jnp.sin(v),
                            lambda v: v * 0.5,
                            x)

    y, vjp = jax.vjp(f, x)
    y_ref[:] = y
    dx_ref[:] = vjp(g)[0]


def probe_cond(interpret):
    rng = np.random.default_rng(2)
    err = 0.0
    for shift in (1.0, -1.0):  # both branches
        x = jnp.asarray(rng.normal(size=(TH, TW)) + shift, jnp.float32)
        g = jnp.asarray(rng.normal(size=(TH, TW)), jnp.float32)
        y, dx = pl.pallas_call(
            _cond_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((TH, TW), jnp.float32)] * 2,
            interpret=interpret,
        )(x, g)

        def f(x):
            return jax.lax.cond(jnp.sum(x) > 0.0,
                                lambda v: v * 2.0 + jnp.sin(v),
                                lambda v: v * 0.5, x)

        y_r, vjp = jax.vjp(f, x)
        dx_r = vjp(g)[0]
        err = max(err, float(jnp.abs(y - y_r).max()),
                  float(jnp.abs(dx - dx_r).max()))
    return err


# --- probe 4: custom_vjp with run_scoped scratch in bwd, under outer vjp -----

N_STEPS = 12
CB = 4
NB = N_STEPS // CB


@jax.custom_vjp
def inner_march(x, w):
    def body(i, x):
        return step(x, w)
    return jax.lax.fori_loop(0, N_STEPS, body, x)


def _inner_fwd(x, w):
    # checkpoint stack built as SSA values (Python chunk loop, rolled inner)
    cks = []
    xc = x
    for _ in range(NB):
        cks.append(xc)
        xc = jax.lax.fori_loop(0, CB, lambda i, v: step(v, w), xc)
    return xc, (tuple(cks), w)


def _inner_bwd(res, g):
    cks, w = res

    def scoped(st):
        dx = g
        dw = jnp.float32(0.0)
        for b in reversed(range(NB)):
            # recompute this chunk's per-step pre-states into scratch
            def store(i, v):
                st[pl.ds(i, 1)] = v[None]
                return step(v, w)

            jax.lax.fori_loop(0, CB, store, cks[b])

            def rev(j, acc):
                dx, dw = acc
                i = CB - 1 - j
                xi = st[pl.ds(i, 1)][0]
                _, vjp = jax.vjp(step, xi, w)
                dx, dwi = vjp(dx)
                return dx, dw + dwi

            dx, dw = jax.lax.fori_loop(0, CB, rev, (dx, dw))
        return dx, dw

    return pl.run_scoped(scoped, pltpu.VMEM((CB, TH, TW), jnp.float32))


inner_march.defvjp(_inner_fwd, _inner_bwd)


def _nested_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref):
    x = x_ref[:]
    w = w_ref[0, 0]
    g = g_ref[:]

    def outer(x, w):
        # some surrounding 'shading' code around the marched value
        y = inner_march(x * 1.5, w)
        return jnp.cos(y) + y * 0.25

    def body(j, acc):  # outer rolled loop: vjp traced once in the body
        dx, dw = acc
        _, vjp = jax.vjp(outer, x, w)
        dxj, dwj = vjp(g)
        return dx + dxj, dw + dwj

    dx, dw = jax.lax.fori_loop(0, 2, body, (jnp.zeros((TH, TW), jnp.float32),
                                            jnp.float32(0.0)))
    dx_ref[:] = dx
    dw_ref[0, 0] = dw


def probe_nested(interpret):
    x = jnp.asarray(np.random.default_rng(3).normal(size=(TH, TW)) * 0.3,
                    jnp.float32)
    w = jnp.float32(0.9)
    g = jnp.asarray(np.random.default_rng(4).normal(size=(TH, TW)),
                    jnp.float32)

    dx, dw = pl.pallas_call(
        _nested_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
    )(x, jnp.full((1, 1), w), g)

    def outer(x, w):
        y = x * 1.5
        for _ in range(N_STEPS):
            y = step(y, w)
        return jnp.cos(y) + y * 0.25

    _, vjp = jax.vjp(outer, x, w)
    dx_r, dw_r = vjp(g)
    e1 = float(jnp.abs(dx - 2 * dx_r).max())
    e2 = abs(float(dw[0, 0]) - 2 * float(dw_r))
    return max(e1, e2 / max(abs(2 * float(dw_r)), 1.0))


# --- probe 5: full march-bwd structure — cond in fwd/bwd of custom_vjp, ----
# --- scratch + fori ref-stores inside the bwd cond, under outer vjp ---------

def make_gated_march(n_steps, cb):
    nb = n_steps // cb

    def step2(c, w):
        x, v = c
        return (x + 0.1 * jnp.tanh(w * v), v + 0.05 * jnp.sin(x))

    @jax.custom_vjp
    def gm(w, x0, v0, act):
        out, _ = gm_fwd(w, x0, v0, act)
        return out

    def gm_fwd(w, x0, v0, act):
        def live(args):
            w, x0, v0 = args
            cks = []
            c = (x0, v0)
            for b in range(nb):
                cks.append(c)
                c = jax.lax.fori_loop(0, cb, lambda i, c: step2(c, w), c)
            return c[0] * 2.0 + c[1], tuple(cks)

        def dead(args):
            w, x0, v0 = args
            return x0, tuple((x0, v0) for _ in range(nb))

        out, cks = jax.lax.cond(jnp.any(act > 0.5), live, dead,
                                (w, x0, v0))
        return out, (w, x0, v0, act, cks)

    def gm_bwd(res, g):
        w, x0, v0, act, cks = res

        def sweep(stx, stv):
            def live_sweep(g):
                dc = (2.0 * g, g)
                dw = jnp.float32(0.0)
                for b in reversed(range(nb)):
                    def store(i, c):
                        stx[pl.ds(i, 1)] = c[0][None]
                        stv[pl.ds(i, 1)] = c[1][None]
                        return step2(c, w)

                    jax.lax.fori_loop(0, cb, store, cks[b])

                    def rev(j, acc):
                        dc, dw = acc
                        i = cb - 1 - j
                        ci = (stx[pl.ds(i, 1)][0], stv[pl.ds(i, 1)][0])
                        _, vjp = jax.vjp(step2, ci, w)
                        dc, dwi = vjp(dc)
                        return dc, dw + dwi

                    dc, dw = jax.lax.fori_loop(0, cb, rev, (dc, dw))
                return dc[0], dc[1], dw

            def dead_sweep(g):
                return g, jnp.zeros_like(g), jnp.float32(0.0)

            return jax.lax.cond(jnp.any(act > 0.5), live_sweep, dead_sweep,
                                g)

        dx, dv, dw = pl.run_scoped(
            sweep, pltpu.VMEM((cb, TH, TW), jnp.float32),
            pltpu.VMEM((cb, TH, TW), jnp.float32))
        return dw, dx, dv, jnp.zeros_like(act)

    gm.defvjp(gm_fwd, gm_bwd)
    return gm


def _gated_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref):
    x = x_ref[:]
    w = w_ref[0, 0]
    g = g_ref[:]
    gm = make_gated_march(12, 4)

    def outer(x, w):
        act = (x > -1e9).astype(jnp.float32)   # all live
        y = gm(w, x * 1.2, x * 0.5, act)
        return jnp.cos(y) + y * 0.25

    def body(j, acc):
        dx, dw = acc
        _, vjp = jax.vjp(outer, x, w)
        dxj, dwj = vjp(g)
        return dx + dxj, dw + dwj

    dx, dw = jax.lax.fori_loop(0, 2, body, (jnp.zeros((TH, TW), jnp.float32),
                                            jnp.float32(0.0)))
    dx_ref[:] = dx
    dw_ref[0, 0] = dw


def probe_gated(interpret):
    x = jnp.asarray(np.random.default_rng(5).normal(size=(TH, TW)) * 0.3,
                    jnp.float32)
    w = jnp.float32(0.8)
    g = jnp.asarray(np.random.default_rng(6).normal(size=(TH, TW)),
                    jnp.float32)

    dx, dw = pl.pallas_call(
        _gated_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
    )(x, jnp.full((1, 1), w), g)

    def step2(c, w):
        xx, v = c
        return (xx + 0.1 * jnp.tanh(w * v), v + 0.05 * jnp.sin(xx))

    def outer(x, w):
        c = (x * 1.2, x * 0.5)
        for _ in range(12):
            c = step2(c, w)
        y = c[0] * 2.0 + c[1]
        return jnp.cos(y) + y * 0.25

    _, vjp = jax.vjp(outer, x, w)
    dx_r, dw_r = vjp(g)
    e1 = float(jnp.abs(dx - 2 * dx_r).max())
    e2 = abs(float(dw[0, 0]) - 2 * float(dw_r))
    return max(e1, e2 / max(abs(2 * float(dw_r)), 1.0))


# --- probe 6: REVERSIBLE march bwd — the round-4 parked experiment, -------
# --- reformulated.  Round 4's prototype died in Mosaic ("failed to ---------
# --- legalize arith.cmpi") because the state reconstruction (with its ------
# --- integer live-step recovery) sat INSIDE the function being vjp'd, so ---
# --- the chunk linearization dragged the integer recovery into the ---------
# --- residual-threaded transpose.  The fix probed here: reconstruction -----
# --- stays OUTSIDE jax.vjp (it only picks the linearization point — no -----
# --- cotangent flows through the inverse map), masks derive exactly from ---
# --- the final carry (live = i < n where n = dist/h), and the reverse ------
# --- fori runs with a DYNAMIC trip count (step-granular early exit). -------

R_STEPS = 24
R_CB = 8
R_NB = R_STEPS // R_CB
R_H = 0.11


def _rev_astep(x, w):
    return 0.3 * jnp.sin(w * x)


def make_rev_march():
    """Done-masked leapfrog march whose custom-VJP backward reconstructs
    pre-step states analytically (x = x1 - h*v1; v = v1 - h*a(x)) instead
    of storing them — no scratch stack, no store pass."""
    h = R_H

    def body(c, w):
        x, v, done, dist = c
        v1 = v + h * _rev_astep(x, w)
        x1 = x + h * v1
        live = done == 0
        newly = live & (x1 > 1.0)          # 'boundary crossing'
        x = jnp.where(live, x1, x)
        v = jnp.where(live, v1, v)
        dist = jnp.where(live, dist + h, dist)
        return (x, v, done | newly.astype(jnp.int32), dist)

    @jax.custom_vjp
    def rm(w, x0, v0):
        out, _ = rm_fwd(w, x0, v0)
        return out

    def rm_fwd(w, x0, v0):
        z = x0 * 0
        c = (x0, v0, z.astype(jnp.int32), z)
        cks = []
        for b in range(R_NB):
            cks.append(c)
            c = jax.lax.fori_loop(0, R_CB, lambda i, c: body(c, w), c)
        xT, vT, doneT, distT = c
        return xT * 2.0 + vT, (w, x0, v0, tuple(cks), c)

    def rm_bwd(res, g):
        w, x0, v0, cks, cT = res
        xT, vT, doneT, distT = cT
        n_f = jnp.round(distT / h)              # exact per-lane step count
        n_max = jnp.max(n_f).astype(jnp.int32)  # scalar: tile's last live step
        dx, dv = 2.0 * g, g
        dw = jnp.float32(0.0)
        for b in reversed(range(R_NB)):
            cend = cks[b + 1][:2] if b + 1 < R_NB else (xT, vT)
            n_live = jnp.clip(n_max - b * R_CB, 0, R_CB)

            def run_chunk(acc, b=b, cend=cend, n_live=n_live):
                dx, dv, dw = acc

                def rev(j, a2):
                    dx, dv, dw, xc, vc = a2
                    i = b * R_CB + (n_live - 1 - j)      # dynamic index
                    i_f = i.astype(jnp.float32)
                    live = i_f < n_f - 0.5
                    # ---- reconstruction: primal only, outside the vjp ----
                    xp = jnp.where(live, xc - h * vc, xc)
                    vp = jnp.where(live, vc - h * _rev_astep(xp, w), vc)

                    def stepf(x, v, w):
                        v1 = v + h * _rev_astep(x, w)
                        x1 = x + h * v1
                        return (jnp.where(live, x1, x),
                                jnp.where(live, v1, v))

                    _, vjp = jax.vjp(stepf, xp, vp, w)
                    dxi, dvi, dwi = vjp((dx, dv))
                    return dxi, dvi, dw + dwi, xp, vp

                dx, dv, dw, _, _ = jax.lax.fori_loop(
                    0, n_live, rev, (dx, dv, dw, cend[0], cend[1]))
                return dx, dv, dw

            dx, dv, dw = jax.lax.cond(n_live > 0, run_chunk,
                                      lambda a: a, (dx, dv, dw))
        return dw, dx, dv

    rm.defvjp(rm_fwd, rm_bwd)
    return rm


def _rev_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref):
    x = x_ref[:]
    w = w_ref[0, 0]
    g = g_ref[:]
    rm = make_rev_march()

    def outer(x, w):
        y = rm(w, x * 0.3, x * 0.2 + 0.1)
        return jnp.cos(y) + y * 0.25

    def bodyj(j, acc):
        dx, dw = acc
        _, vjp = jax.vjp(outer, x, w)
        dxj, dwj = vjp(g)
        return dx + dxj, dw + dwj

    dx, dw = jax.lax.fori_loop(0, 2, bodyj,
                               (jnp.zeros((TH, TW), jnp.float32),
                                jnp.float32(0.0)))
    dx_ref[:] = dx
    dw_ref[0, 0] = dw


def probe_reversible(interpret):
    x = jnp.asarray(np.random.default_rng(7).normal(size=(TH, TW)) * 0.8,
                    jnp.float32)
    w = jnp.float32(1.1)
    g = jnp.asarray(np.random.default_rng(8).normal(size=(TH, TW)),
                    jnp.float32)

    dx, dw = pl.pallas_call(
        _rev_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((TH, TW), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
    )(x, jnp.full((1, 1), w), g)

    # lax reference: differentiate the same masked march directly
    def outer_ref(x, w):
        h = R_H

        def body(c, w):
            xx, v, done, dist = c
            v1 = v + h * _rev_astep(xx, w)
            x1 = xx + h * v1
            live = done == 0
            newly = live & (x1 > 1.0)
            xx = jnp.where(live, x1, xx)
            v = jnp.where(live, v1, v)
            dist = jnp.where(live, dist + h, dist)
            return (xx, v, done | newly.astype(jnp.int32), dist)

        z = x * 0
        c = (x * 0.3, x * 0.2 + 0.1, z.astype(jnp.int32), z)
        for _ in range(R_STEPS):
            c = body(c, w)
        y = c[0] * 2.0 + c[1]
        return jnp.cos(y) + y * 0.25

    _, vjp = jax.vjp(outer_ref, x, w)
    dx_r, dw_r = vjp(g)
    e1 = float(jnp.abs(dx - 2 * dx_r).max())
    e2 = abs(float(dw[0, 0]) - 2 * float(dw_r))
    return max(e1, e2 / max(abs(2 * float(dw_r)), 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--only", help="run a single probe by name")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    probes = [("ckpt_scratch_fori_vjp", probe_ckpt, 1e-5),
              ("cond_in_kernel_vjp", probe_cond, 1e-6),
              ("nested_custom_vjp_scoped", probe_nested, 1e-4),
              ("gated_march_custom_vjp", probe_gated, 1e-4),
              ("reversible_march_custom_vjp", probe_reversible, 1e-4)]
    for name, fn, tol in probes:
        if args.only and args.only not in name:
            continue
        try:
            err = fn(args.interpret)
            ok = err < tol
            print(f"{name:28s} {'OK ' if ok else 'FAIL'} maxerr={err:.2e}")
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()


