"""In-kernel checkpointed backward: the whole recompute-VJP in ONE kernel.

Round-3's deep/marchy backward paths paid for their tape in HBM: the
segmented kernels (ops/pallas_kernel.vjp_pallas_segmented) park every
chunk-boundary DFS carry in HBM (~50 full frames per boundary), and marchy
scenes fell off the kernel entirely to a row-blocked lax recompute.  This
module replaces both with a single Pallas kernel per tile grid that

  * re-runs the forward bounce loop as a ROLLED fori over K chunks, parking
    the chunk-boundary carries in a VMEM scratch stack (dynamic-indexed
    ``ref[pl.ds(k, 1)]`` stores — no HBM traffic, no per-chunk kernel
    launches, code size independent of scene depth);
  * walks the chunks in reverse with a second rolled fori whose body loads
    checkpoint k and re-runs its ``cA`` trips under ``jax.vjp`` — the
    transpose is straight-line code Mosaic lowers, traced ONCE;
  * handles the march loop (SURVEY.md §3.4 non-Euclidean propagation) with a
    nested custom-VJP: the march fwd checkpoints every ``cB`` steps as SSA
    residuals, and its bwd walks the steps in reverse by ANALYTIC INVERSION
    (x = x1 - h*v1; v from the |v|=1 constraint) re-seeded from each chunk
    checkpoint — no store pass, no per-step VMEM stack, step masks recovered
    exactly from the final carry so the replayed step needs no geometry
    side-probes, and a dynamic-trip-count reverse fori gives step-granular
    early exit (docs/PERF.md §5; the round-4 store-pass sweep remains as
    ``MARCH_REVERSIBLE = False``);
  * skips drained work at TILE granularity with ``lax.cond``: bounce chunks
    whose checkpointed stacks are empty pass cotangents through unchanged,
    and tiles with no marching ray skip the march machinery entirely — the
    backward inherits the forward's early-exit economics.

Together: no HBM boundary carries, one kernel launch for the entire
backward, and every scene — straight, deep, marchy, 4D — stays on the
Pallas path in both directions.  Capability probes for the Mosaic features
this rests on live in tools/mosaic_probe.py.

Reference contract: SURVEY.md §6 "speed-of-light fwd+bwd per chip" over the
§3.3/§3.4 trace semantics (the reference itself has no autodiff — SURVEY §1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.compile import CameraParams
from . import march as M
from . import trace as T
from . import vec as V
from .pallas_kernel import (SEQ_GRID, _cdiv, _grads_from_rows, _merge_carry,
                            _pack_camera, _split_carry, _table_views,
                            _unpack_tables)
from .vec import Vec

# chunk-size defaults from the v5e sweeps (tools/ckpt_sweep.py, 720p).
# VMEM cost ~ K * carry_leaves * tile
#           + (march_steps/cB) * march_leaves * tile
# (the reversible sweep removed the old +cB step-stack term): bigger tiles
# win until the checkpoint stacks overflow VMEM — measured crash points:
# (8,256) with expr materials, cA>=2 marchy at (8,256), and (16,256)
# anywhere (re-confirmed round 5 with the reversible sweep: the Level-A
# carry stacks, not the march stack, are what overflows).
DEFAULT_TRIP_CHUNK_STRAIGHT = 8   # config2 62 trips: cA=8 -> 58.5 Mrays/s
DEFAULT_MARCH_CHUNK = 16
MAX_LEVEL_A_CHUNKS = 16           # cap K so ckpt stacks stay in VMEM

# March reverse-sweep strategy (trace-time constant): True = analytic step
# inversion (no store pass, no VMEM step stack, step-granular early exit —
# see make_march_ckpt); False = the round-4 store-pass sweep.  Module-level
# so tools can A/B the two without threading a new parameter through every
# kernel partial.  NOTE: read at trace time — after flipping it, call
# vjp_pallas_ckpt.clear_cache() / train_step_pallas.clear_cache() or the
# jitted wrappers will replay the previously-traced strategy.
MARCH_REVERSIBLE = True

# Reversible-sweep shell strategy (trace-time constant, same caching caveat
# as MARCH_REVERSIBLE).  True: ONE jax.vjp over the acceleration FIELD per
# reverse step — its primal output `a` feeds the analytic reconstruction and
# its transpose the table/position cotangents, while the cheap
# normalize/madd shell around it is transposed BY HAND (exact, using the
# reconstruction identities u = s*v1, |u| = s).  In source terms this
# removes one full accel-field evaluation per step versus jax.vjp over the
# whole step (which re-evaluates the field at the point the reconstruction
# just did) — but MEASURED it is NOT faster: XLA already CSEs the duplicate
# field eval (same inputs, same point), and the hand shell runs ~5% SLOWER
# on config5/config7 (A/B on v5e, 720p fused train step, 2026-08-21:
# config5 17.56 vs 16.72 ms, config6 13.65 vs 13.72, config7 14.36 vs
# 13.73).  Kept as a parked, parity-tested experiment (grads match lax to
# 1.9e-6 on-chip, tools/ckpt_vjp_probe.py under the flag); default stays
# the whole-step jax.vjp the sweep data was measured on.
MARCH_FUSED_SHELL = False


def default_plan(static, tile, trip_chunk, march_chunk):
    """(tile, trip_chunk, march_chunk) defaults for vjp_pallas_ckpt."""
    trips = max(1, static.max_nodes - 1)
    has_expr = any(k == "expr" for k in static.mat_kinds)
    if tile is None:
        if static.has_warp and not has_expr and static.max_depth <= 4:
            tile = (8, 256)    # config5 25.8 -> 34.5, config7 -> 43.4
        else:
            tile = (8, 128)    # expr march residuals / deep stacks: VMEM
    has_tex = any(t >= 0 for t in static.surf_texture)
    if trip_chunk is None:
        if static.has_warp:
            # one trip per chunk keeps only one march-custom residual set
            # live, but cap the checkpoint count for very deep trees
            trip_chunk = max(1, -(-trips // MAX_LEVEL_A_CHUNKS))
        elif has_tex:
            # texture-sampler residuals are fat: config3 at 720p needs one
            # trip per chunk — round-5 sweep (720p, render+ckpt-bwd, N=30):
            # (8,128) cA=1 65.0 Mrays/s; cA=2 and (8,256) cA=1 both
            # overflow VMEM
            trip_chunk = 1
        else:
            # round-5 sweep, config2 62 trips (720p, render+ckpt-bwd,
            # N=30): (8,128) cA=4 59.8 / cA=8 67.4 / cA=16 59.5 Mrays/s;
            # (8,256) cA>=8 overflows VMEM
            trip_chunk = DEFAULT_TRIP_CHUNK_STRAIGHT
    if march_chunk is None:
        # round-5 reversible-sweep data (config5 720p, (8,256), cA=1,
        # render+ckpt-bwd, N=30): cB=16 45.4, cB=32 45.8, cB=64 45.8
        # Mrays/s; grads at cB=16 and cB=64 both match lax to 3.3e-6
        # (tools/ckpt_vjp_probe.py --cases march_full).  32 halves the
        # checkpoint VMEM vs 16 at equal-best throughput while keeping
        # reconstruction chains half as long as 64.
        march_chunk = 20 if has_expr else 32
    return tile, trip_chunk, march_chunk


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_zeros(t):
    return jax.tree.map(lambda x: jnp.zeros(jnp.shape(x), x.dtype), t)


def _laundered(tree):
    """Force concrete Mosaic layouts by round-tripping through VMEM scratch.

    Broadcast constants and splats carry *replicated* layouts ({*,*} /
    {*,0}); a rolled scf.for carry whose INIT is replicated but whose body
    yields concrete values dies in Mosaic with "Invalid relayout:
    non-singleton dimension replicated in destination but not in source".
    A VMEM store/load pair pins the standard tiled layout.  Scalars and
    sub-2D leaves pass through untouched (they live in SREGs)."""
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, l in enumerate(leaves) if jnp.ndim(l) >= 2]
    if not idx:
        return tree

    def scoped(*refs):
        out = []
        for r, i in zip(refs, idx):
            r[...] = leaves[i]
            out.append(r[...])
        return tuple(out)

    outs = pl.run_scoped(
        scoped, *[pltpu.VMEM(jnp.shape(leaves[i]), leaves[i].dtype)
                  for i in idx])
    for i, o in zip(idx, outs):
        leaves[i] = o
    return jax.tree.unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Level B: checkpointed march custom-VJP (runs inside the trip transpose)
# ---------------------------------------------------------------------------

def make_march_ckpt(static, cB, reversible: bool | None = None):
    """Returns a ``march_impl`` for ops.trace.propagate whose backward is the
    hand-rolled checkpointed reverse sweep.

    Two reverse-sweep strategies share the same chunked forward:

    ``reversible=True`` (default): the march step is analytically inverted —
    ``x = x1 - h*v1`` and ``v`` from the unit-speed constraint (|v|=1 gives
    ``s = h(v1·a) + sqrt((h v1·a)^2 - h^2|a|^2 + 1)``, ``v = s*v1 - h*a(x)``)
    — so the reverse sweep reconstructs each pre-step state from its
    successor: NO store pass (1 of the ~4 march traversals gone), NO per-step
    VMEM stack, and the replayed step needs no geometry side-probes because
    the step masks derive EXACTLY from the final carry (a lane walked
    ``n = round(dist/h)`` steps; it was live at step i iff ``i < n`` and
    crossed at ``i == n-1`` iff any ``crossed`` flag is set).  Chunk
    checkpoints are still consumed (reconstruction restarts from each chunk's
    end state) so f32 drift never accumulates past ``cB`` steps, and the
    reverse fori runs a DYNAMIC ``clip(n_max - b*cB, 0, cB)`` trip count —
    step-granular early exit where the store-pass sweep was chunk-granular.
    Round 4 parked this as a Mosaic ``arith.cmpi`` legalization failure; the
    lowering-safe reformulation (validated by tools/mosaic_probe.py
    ``reversible_march_custom_vjp`` on-chip) keeps the reconstruction and
    every integer recovery OUTSIDE ``jax.vjp`` — the inverse map only picks
    the linearization point, no cotangent flows through it.

    ``reversible=False``: the round-4 store-pass sweep — each chunk re-runs
    forward storing per-step states in a VMEM stack, then walks the stack
    backwards.  The per-step state stack (one [cB, TH, TW] VMEM buffer per
    march-carry leaf) is allocated INSIDE the bwd with pl.run_scoped: a
    custom_vjp bwd must not close over refs allocated outside it — the Read
    effects then reference variables that are not inputs of the transposed
    jaxpr ("JaxprInputEffect does not have corresponding jaxpr input")."""
    if reversible is None:
        reversible = MARCH_REVERSIBLE
    steps = static.march_steps
    nB = max(1, -(-steps // cB))

    def _chunk(body, carry, base):
        """cB steps starting at global step ``base`` (static); steps past
        ``march_steps`` are exact no-ops (value-parity with the plain
        fori/while march)."""
        gate = base + cB > steps

        def stepf(i, c):
            out = body(c)
            if not gate:
                return out
            pad = (base + i) >= steps
            return jax.tree.map(lambda a, b: jnp.where(pad, a, b), c, out)

        return jax.lax.fori_loop(0, cB, stepf, carry)

    def _run_fwd(tables, time, mat_ids, org, d0, h, active):
        accel_fn = T.make_accel(static, tables, mat_ids, time)
        body = M.make_march_body(static, tables, accel_fn, h)
        carry = _laundered(M.march_init(static, tables, org, d0, active))
        cks = []
        for b in range(nB):
            cks.append(carry)
            # chunk-level early exit (both directions skip chunks whose
            # lanes are all done — the checkpointed analog of the forward
            # while-march): once every lane's done flag is set the chunk
            # is an exact identity
            carry = jax.lax.cond(jnp.all(carry[2] == 1),
                                 lambda c: c,
                                 lambda c, b=b: _chunk(body, c, b * cB),
                                 carry)
        return carry, tuple(cks)

    def _encode(outs):
        hit, p, dvec, ent, n, u, v = outs
        return (hit.astype(jnp.float32), p, dvec, ent.astype(jnp.float32),
                n, u, v)

    # The any-marching-ray gate lives INSIDE the custom_vjp fwd/bwd (plain
    # primal/cotangent conds), never AROUND the custom_vjp call: a lax.cond
    # wrapping a custom_vjp does not linearize under the outer chunk vjp
    # (Mosaic's scan pattern-matcher rejects the residual-threaded scans the
    # cond linearization produces).  Gated-off tiles cost one cond and some
    # zeros in either direction.

    def _gated_fwd(tables, time, mat_f, org, d0, h, active_f):
        active = active_f > 0.5
        carry0 = M.march_init(static, tables, org, d0, active)

        def live(args):
            tables, time, mat_f, org, d0, h, active_f = args
            carry, cks = _run_fwd(tables, time, mat_f.astype(jnp.int32),
                                  org, d0, h, active_f > 0.5)
            return (_encode(M.march_finish(static, tables, org, carry)),
                    cks, carry)

        def dead(args):
            tables, time, mat_f, org, d0, h, active_f = args
            zf = jnp.zeros_like(org.x)
            out = (zf, org, d0, zf, Vec(zf, zf, zf, zf), zf, zf)
            return (out, tuple(carry0 for _ in range(nB)), carry0)

        return jax.lax.cond(
            jnp.any(active), live, dead,
            (tables, time, mat_f, org, d0, h, active_f))

    @jax.custom_vjp
    def march(tables, time, mat_f, org, d0, h, active_f):
        out, _, _ = _gated_fwd(tables, time, mat_f, org, d0, h, active_f)
        return out

    def march_fwd(tables, time, mat_f, org, d0, h, active_f):
        out, cks, carry = _gated_fwd(tables, time, mat_f, org, d0, h,
                                     active_f)
        return out, (tables, time, mat_f, org, d0, h, active_f, cks, carry)

    def march_bwd(res, cots):
        tables, time, mat_f, org, d0, h, active_f, cks, carryT = res
        mat_ids = mat_f.astype(jnp.int32)
        _, d_p, d_dvec, _, d_n, d_u, d_v = cots   # hit/ent cots are inert

        # ---- 1) transpose the bisection finish at the final carry ----
        flT, ilT, metaT = _split_carry(carryT)

        def fin(tbl, org_, fl):
            carry = _merge_carry(fl, ilT, metaT)
            hit, p, dvec, ent, n, u, v = M.march_finish(static, tbl, org_,
                                                        carry)
            return (p, dvec, n, u, v)

        ck_leaves, ck_treedef = jax.tree.flatten(cks[0])

        # ---- 2) rolled reverse sweep over march chunks (scoped scratch,
        #         tile-gated: a no-marching-ray tile pays one cond) --------
        def sweep(*st_refs):
            def live_sweep(cots):
                d_p, d_dvec, d_n, d_u, d_v = cots
                _, vjp_fin = jax.vjp(fin, tables, org, flT)
                d_tbl, d_org_fin, dfl = vjp_fin((d_p, d_dvec, d_n, d_u,
                                                 d_v))
                d_tbl_s = d_tbl
                d_time = jnp.zeros((), jnp.float32)
                d_h = jnp.zeros_like(h)
                dfl, d_tbl_s, d_h = _laundered((dfl, d_tbl_s, d_h))
                for b in reversed(range(nB)):
                    base = b * cB
                    gate = base + cB > steps
                    alive_b = jnp.any(cks[b][2] == 0)

                    def run_chunk_bwd(acc, b=b, base=base, gate=gate):
                        dfl, d_tbl_s, d_time, d_h = acc

                        def store_step(i, c, base=base, gate=gate):
                            for r, leaf in zip(st_refs,
                                               jax.tree.leaves(c)):
                                r[pl.ds(i, 1)] = leaf[None]
                            accel_fn = T.make_accel(static, tables,
                                                    mat_ids, time)
                            body = M.make_march_body(static, tables,
                                                     accel_fn, h)
                            out = body(c)
                            if not gate:
                                return out
                            pad = (base + i) >= steps
                            return jax.tree.map(
                                lambda a, o: jnp.where(pad, a, o), c, out)

                        jax.lax.fori_loop(0, cB, store_step, cks[b])

                        def rev(j, acc, base=base, gate=gate):
                            dfl, d_tbl, d_time, d_h = acc
                            i = cB - 1 - j
                            leaves_i = [r[pl.ds(i, 1)][0] for r in st_refs]
                            carry_i = jax.tree.unflatten(ck_treedef,
                                                         leaves_i)
                            fl_i, il_i, meta_i = _split_carry(carry_i)

                            def stepf(fl, tbl, tm, hh):
                                accel_fn = T.make_accel(static, tbl,
                                                        mat_ids, tm)
                                body = M.make_march_body(static, tbl,
                                                         accel_fn, hh)
                                out = body(_merge_carry(fl, il_i, meta_i))
                                if gate:
                                    pad = (base + i) >= steps
                                    out = jax.tree.map(
                                        lambda a, o: jnp.where(pad, a, o),
                                        _merge_carry(fl, il_i, meta_i),
                                        out)
                                return _split_carry(out)[0]

                            _, vjp = jax.vjp(stepf, fl_i, tables, time, h)
                            dfl, dt_i, dtm_i, dh_i = vjp(dfl)
                            return (dfl, _tree_add(d_tbl, dt_i),
                                    d_time + dtm_i, d_h + dh_i)

                        return jax.lax.fori_loop(
                            0, cB, rev, (dfl, d_tbl_s, d_time, d_h))

                    dfl, d_tbl_s, d_time, d_h = jax.lax.cond(
                        alive_b, run_chunk_bwd, lambda acc: acc,
                        (dfl, d_tbl_s, d_time, d_h))
                return dfl, d_tbl_s, d_time, d_h, d_org_fin

            def dead_sweep(cots):
                fl0, _, _ = _split_carry(cks[0])
                zvec = lambda: Vec(*(jnp.zeros_like(org.x)
                                     for _ in range(4)))
                return (jax.tree.map(jnp.zeros_like, fl0),
                        _tree_zeros(tables), jnp.zeros((), jnp.float32),
                        jnp.zeros_like(h), zvec())

            return jax.lax.cond(jnp.any(active_f > 0.5), live_sweep,
                                dead_sweep, (d_p, d_dvec, d_n, d_u, d_v))

        dfl, d_tbl, d_time, d_h, d_org_fin = pl.run_scoped(
            sweep, *[pltpu.VMEM((cB,) + l.shape, l.dtype)
                     for l in ck_leaves])

        # ---- 3) map carry0 cotangents back to the march inputs ----
        # carry0 = (x=org, v=d0, done, sx0=org, sx1=org, sv=d0, sides,
        #           crossed, dist=0): float order (x, v, sx0, sx1, sv, dist)
        c0 = M.march_init(static, tables, org, d0, active_f > 0.5)
        _, _, meta0 = _split_carry(c0)
        d_c0 = _merge_carry(dfl, jax.tree.map(jnp.zeros_like,
                                              _split_carry(c0)[1]), meta0)
        dx, dv, _, dsx0, dsx1, dsv, _, _, _ = d_c0
        vadd = lambda a, b: Vec(a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w)
        d_org = vadd(vadd(dx, dsx0), vadd(dsx1, d_org_fin))
        d_d0 = vadd(dv, dsv)
        # march_init's sides come from G.side(org) — integer predicates,
        # zero cotangent (matches the plain fori march's AD)
        return (d_tbl, d_time, jnp.zeros_like(mat_f), d_org, d_d0, d_h,
                jnp.zeros_like(active_f))

    def march_bwd_rev(res, cots):
        """Reverse sweep by analytic step inversion (see docstring)."""
        tables, time, mat_f, org, d0, h, active_f, cks, carryT = res
        mat_ids = mat_f.astype(jnp.int32)
        _, d_p, d_dvec, _, d_n, d_u, d_v = cots
        flT, ilT, metaT = _split_carry(carryT)

        def fin(tbl, org_, fl):
            carry = _merge_carry(fl, ilT, metaT)
            hit, p, dvec, ent, n, u, v = M.march_finish(static, tbl, org_,
                                                        carry)
            return (p, dvec, n, u, v)

        def live_sweep(cots):
            d_p, d_dvec, d_n, d_u, d_v = cots
            _, vjp_fin = jax.vjp(fin, tables, org, flT)
            d_tbl_s, d_org_fin, dfl = vjp_fin((d_p, d_dvec, d_n, d_u, d_v))
            d_time = jnp.zeros((), jnp.float32)
            d_h = jnp.zeros_like(h)
            dfl, d_tbl_s, d_h = _laundered((dfl, d_tbl_s, d_h))

            # exact per-lane step history from the final carry: a lane
            # walked n = round(dist/h) steps; live at step i iff i < n;
            # the crossing (if any) happened at exactly i == n-1.  An h=0
            # lane never moves (dist stays 0) — the max() keeps n_f at 0
            # instead of NaN, making its sweep an exact identity, which is
            # also what the step map is for such a lane.
            xT, vT, doneT, sx0T, sx1T, svT, sidesT, crossedT, distT = carryT
            n_f = jnp.round(distT / jnp.maximum(h, 1e-12))
            anyc = crossedT[0]
            for cc in crossedT[1:]:
                anyc = anyc | cc
            anyc_b = anyc == 1
            n_max = jnp.max(n_f).astype(jnp.int32)
            accel_prim = T.make_accel(static, tables, mat_ids, time)

            def accel_f(tbl, tm, x):
                return T.make_accel(static, tbl, mat_ids, tm)(x)

            acc0 = (dfl, d_tbl_s, d_time, d_h)
            for b in reversed(range(nB)):
                cend = cks[b + 1] if b + 1 < nB else carryT
                xe, ve = cend[0], cend[1]
                wb = min(cB, steps - b * cB)        # chunk width (static)
                n_live = jnp.clip(n_max - b * cB, 0, wb)

                def run_chunk_bwd(acc, b=b, xe=xe, ve=ve, n_live=n_live):
                    dfl, d_tbl, d_time, d_h = acc

                    def rev(j, a2):
                        dfl, d_tbl, d_time, d_h, xc, vc = a2
                        i_f = (b * cB + (n_live - 1 - j)).astype(jnp.float32)
                        live = i_f < n_f - 0.5
                        newly = anyc_b & (jnp.abs(i_f - (n_f - 1.0)) < 0.5)

                        # ---- reconstruction: primal only, OUTSIDE the vjp
                        xp = V.where(live, V.madd(xc, -h, vc), xc)
                        if MARCH_FUSED_SHELL:
                            # one field evaluation total: jax.vjp's primal
                            # feeds the reconstruction AND picks the
                            # linearization (the masks stay outside — the
                            # Mosaic-safety rule is unchanged)
                            a, vjp_a = jax.vjp(accel_f, tables, time, xp)
                        else:
                            a = accel_prim(xp)
                        va = V.dot(vc, a)
                        disc = jnp.maximum(
                            (h * va) ** 2 - h * h * V.norm2(a) + 1.0, 0.0)
                        s = h * va + jnp.sqrt(disc)
                        vp = V.where(live, V.madd(V.scale(vc, s), -h, a), vc)

                        if MARCH_FUSED_SHELL:
                            # ---- hand-transposed shell.  Forward (live):
                            #   u  = vp + hh*a(xp);  v1 = u/|u|;
                            #   x1 = xp + hh*v1;     dist1 = dist + hh
                            # with the reconstruction identities u = s*vc,
                            # |u| = s, v1 = vc (|vc| = 1).  newly lanes
                            # (⊂ live) additionally copy (xp, x1, v1) into
                            # the (sx0, sx1, sv) segment slots.
                            dcar = _merge_carry(dfl, ilT, metaT)
                            gx, gv, _, gsx0, gsx1, gsv, _, _, gdist = dcar
                            zero = jnp.zeros_like(h)
                            zv = Vec(zero, zero, zero, zero)
                            g_x1 = V.add(V.where(live, gx, zv),
                                         V.where(newly, gsx1, zv))
                            g_v1 = V.add(V.where(live, gv, zv),
                                         V.where(newly, gsv, zv))
                            g_v1 = V.madd(g_v1, h, g_x1)    # x1 = xp + h*v1
                            # normalize transpose at v1 = vc, |u| = s
                            s_safe = jnp.maximum(s, 1e-12)
                            g_u = V.scale(
                                V.madd(g_v1, -V.dot(vc, g_v1), vc),
                                1.0 / s_safe)
                            g_a = V.scale(g_u, h)           # u = vp + h*a
                            dt_i, dtm_i, g_xa = vjp_a(g_a)
                            g_xp = V.add(V.add(V.where(live, zv, gx),
                                               V.where(newly, gsx0, zv)),
                                         V.add(g_x1, g_xa))
                            g_vp = V.add(V.where(live, zv, gv), g_u)
                            dh_i = (V.dot(g_x1, vc) + V.dot(g_u, a)
                                    + jnp.where(live, gdist, zero))
                            dfl = _split_carry(
                                (g_xp, g_vp, doneT,
                                 V.where(newly, zv, gsx0),
                                 V.where(newly, zv, gsx1),
                                 V.where(newly, zv, gsv),
                                 sidesT, crossedT, gdist))[0]
                            return (dfl, _tree_add(d_tbl, dt_i),
                                    d_time + dtm_i, d_h + dh_i, xp, vp)

                        dist_i = jnp.where(live, i_f * h, distT)
                        sx0_i = V.where(live, org, sx0T)
                        sx1_i = V.where(live, org, sx1T)
                        sv_i = V.where(live, d0, svT)
                        fl_i = _split_carry(
                            (xp, vp, doneT, sx0_i, sx1_i, sv_i, sidesT,
                             crossedT, dist_i))[0]

                        # ---- the replayed step: float math + exact masks,
                        #      no side probes (live/newly are vjp constants)
                        def stepf(fl, tbl, tm, hh):
                            c = _merge_carry(fl, ilT, metaT)
                            x, v, dn, sx0, sx1, sv, sd, cr, dist = c
                            afn = T.make_accel(static, tbl, mat_ids, tm)
                            v1 = V.normalize(V.madd(v, hh, afn(x)))
                            x1 = V.madd(x, hh, v1)
                            out = (V.where(live, x1, x),
                                   V.where(live, v1, v), dn,
                                   V.where(newly, x, sx0),
                                   V.where(newly, x1, sx1),
                                   V.where(newly, v1, sv), sd, cr,
                                   jnp.where(live, dist + hh, dist))
                            return _split_carry(out)[0]

                        _, vjp = jax.vjp(stepf, fl_i, tables, time, h)
                        dfl, dt_i, dtm_i, dh_i = vjp(dfl)
                        return (dfl, _tree_add(d_tbl, dt_i), d_time + dtm_i,
                                d_h + dh_i, xp, vp)

                    out = jax.lax.fori_loop(
                        0, n_live, rev, (dfl, d_tbl, d_time, d_h, xe, ve))
                    return out[:4]

                acc0 = jax.lax.cond(n_live > 0, run_chunk_bwd,
                                    lambda acc: acc, acc0)
            dfl, d_tbl_s, d_time, d_h = acc0
            return dfl, d_tbl_s, d_time, d_h, d_org_fin

        def dead_sweep(cots):
            fl0, _, _ = _split_carry(cks[0])
            zvec = lambda: Vec(*(jnp.zeros_like(org.x) for _ in range(4)))
            return (jax.tree.map(jnp.zeros_like, fl0), _tree_zeros(tables),
                    jnp.zeros((), jnp.float32), jnp.zeros_like(h), zvec())

        dfl, d_tbl, d_time, d_h, d_org_fin = jax.lax.cond(
            jnp.any(active_f > 0.5), live_sweep, dead_sweep,
            (d_p, d_dvec, d_n, d_u, d_v))

        # ---- map carry0 cotangents back to the march inputs (same as the
        #      store-pass sweep) ----
        c0 = M.march_init(static, tables, org, d0, active_f > 0.5)
        _, _, meta0 = _split_carry(c0)
        d_c0 = _merge_carry(dfl, jax.tree.map(jnp.zeros_like,
                                              _split_carry(c0)[1]), meta0)
        dx, dv, _, dsx0, dsx1, dsv, _, _, _ = d_c0
        vadd = lambda a, b: Vec(a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w)
        d_org = vadd(vadd(dx, dsx0), vadd(dsx1, d_org_fin))
        d_d0 = vadd(dv, dsv)
        return (d_tbl, d_time, jnp.zeros_like(mat_f), d_org, d_d0, d_h,
                jnp.zeros_like(active_f))

    march.defvjp(march_fwd, march_bwd_rev if reversible else march_bwd)

    def impl(st, tbl, tm, mids, org, d, h, wm):
        hit_f, p, dvec, ent_f, n, u, v = march(
            tbl, tm, mids.astype(jnp.float32), org, d, h,
            wm.astype(jnp.float32))
        return hit_f > 0.5, p, dvec, ent_f.astype(jnp.int32), n, u, v

    return impl


def _march_impl_fast(st, tbl, tm, mids, org, d, h, wm):
    """Forward-sweep march: the early-exiting while loop (value-identical to
    the fixed-trip fori — masked steps are no-ops — and it exits immediately
    on tiles with no marching ray)."""
    accel_fn = T.make_accel(st, tbl, mids, tm)
    return M.march_hit(st, tbl, org, d, accel_fn, h, differentiable=False,
                       active=wm)


# ---------------------------------------------------------------------------
# Level A: the kernel
# ---------------------------------------------------------------------------

def _carry5_shapes(static, TH, TW):
    """ShapeDtypeStructs of the (sp, ar, ag, ab, slots) bounce carry."""
    f = lambda: jax.ShapeDtypeStruct((TH, TW), jnp.float32)
    i = lambda: jax.ShapeDtypeStruct((TH, TW), jnp.int32)
    vec = lambda: Vec(f(), f(), f(), f())
    S = static.max_depth + 1
    slot = lambda: (vec(), vec(), f(), i(), i())
    carry = (i(), f(), f(), f(), tuple(slot() for _ in range(S)))
    leaves, treedef = jax.tree.flatten(carry)
    return leaves, treedef


def _ckpt_kernel(static, H, W, TH, TW, n_views, cA, cB, fused, R,
                 cam_ref, *refs):
    """``fused=False``: refs = (*views, g, d_cam_out, *d_view_outs) — the
    plain backward, cotangent ``g`` supplied by the caller.

    ``fused=True``: refs = (*views, target, loss_out, d_cam_out,
    *d_view_outs) — the ENTIRE training step in one kernel: the forward
    sweep's accumulated colors become the rendered tile, the MSE loss
    contribution and its cotangent (2·(img−target)·norm on valid pixels)
    are computed in-register, and the reverse sweep runs immediately — no
    separate render kernel, no HBM round-trip for the image or cotangent.
    ``norm`` (the global 1/(H·W·3) of the loss mean) rides cam_row[0,19];
    ``R`` is the valid row count of this launch's slab."""
    view_refs = refs[:n_views]
    g_ref = refs[n_views]             # cotangent (plain) or target (fused)
    out_refs = refs[n_views + 1:]     # [loss,] d_cam_row, d_views

    cam_row = cam_ref[:]
    views = tuple(r[:] for r in view_refs)
    g_tile = g_ref[:]                 # [3, TH, TW]

    # program_id must be read OUTSIDE run_scoped: the scoped body is
    # re-traced during state discharge (interpret mode) without the grid
    # context, so only the already-materialised scalars may be closed over
    iy0 = pl.program_id(0) * TH
    ix0 = pl.program_id(1) * TW
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    trips = static.max_nodes - 1

    def rays(cr):
        cam = CameraParams(position=cr[0, 0:4], forward=cr[0, 4:8],
                           up=cr[0, 8:12], right=cr[0, 12:16],
                           tan_half_fov=cr[0, 16])
        yi = (iy0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
              ).astype(jnp.float32) + cr[0, 18]
        xi = (ix0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
              ).astype(jnp.float32)
        return T.camera_rays(cam, xi, yi, W, H)

    def write_grads(dcr, dvs, loss=None):
        outs = [dcr] + list(dvs)
        if fused:
            outs = [loss.reshape(1, 1)] + outs
        for o, gr in zip(out_refs, outs):
            @pl.when(first)
            def _(o=o, gr=gr):
                o[...] = gr

            @pl.when(jnp.logical_not(first))
            def _(o=o, gr=gr):
                o[...] += gr

    def fused_seed(r, g, b):
        """(loss contribution, cotangent channels) for this tile's render.

        Padded lanes (rows >= R of the slab, cols >= W) are masked out of
        both the loss and the cotangent."""
        norm = cam_row[0, 19]
        ly = iy0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
        lx = ix0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
        mask = ((ly < R) & (lx < W)).astype(jnp.float32)
        dr = (r - g_tile[0]) * mask
        dg = (g - g_tile[1]) * mask
        db = (b - g_tile[2]) * mask
        loss = (jnp.sum(dr * dr) + jnp.sum(dg * dg)
                + jnp.sum(db * db)) * norm
        two_n = 2.0 * norm
        return loss, (dr * two_n, dg * two_n, db * two_n)

    if static.max_depth < 2 or trips < 1:
        # no deferred branches: the peel IS the whole trace
        march_diff = (make_march_ckpt(static, cB)
                      if static.has_warp else None)

        def peel_rgb(cr, *vs):
            tbl = _unpack_tables(vs)
            org, d = rays(cr)
            ar, ag, ab, _, _ = T.bounce_init(static, tbl, org, d, True,
                                             True, cr[0, 17],
                                             march_impl=march_diff)
            return (ar, ag, ab)

        (r, g, b), vjp = jax.vjp(peel_rgb, cam_row, *views)
        if fused:
            loss, seed = fused_seed(r, g, b)
        else:
            loss, seed = None, (g_tile[0], g_tile[1], g_tile[2])
        douts = vjp(seed)
        write_grads(douts[0], douts[1:], loss)
        return

    K = _cdiv(trips, cA)
    ck_shapes, treedef5 = _carry5_shapes(static, TH, TW)
    is_f = tuple(jnp.issubdtype(s.dtype, jnp.floating) for s in ck_shapes)

    def scoped(*ck_refs):
        march_diff = (make_march_ckpt(static, cB)
                      if static.has_warp else None)
        march_fast = _march_impl_fast if static.has_warp else None
        time = cam_row[0, 17]
        tables_v = _unpack_tables(views)

        # ---- forward sweep: peel + K rolled chunks, checkpoints in VMEM --
        org0, d0 = rays(cam_row)
        ar, ag, ab, slots, sp = T.bounce_init(static, tables_v, org0, d0,
                                              True, True, time,
                                              march_impl=march_fast)
        carry0 = (sp, ar, ag, ab, slots)

        body_fast = T.make_bounce_body(static, tables_v, True, True, time,
                                       max_trips=trips,
                                       march_impl=march_fast)

        def fwd_chunk(k, c5):
            for r, leaf in zip(ck_refs, jax.tree.leaves(c5)):
                r[pl.ds(k, 1)] = leaf[None]

            def run(c5):
                c6 = (c5[0], k * cA, c5[1], c5[2], c5[3], c5[4])
                for _ in range(cA):
                    c6 = body_fast(c6)
                return (c6[0], c6[2], c6[3], c6[4], c6[5])

            return jax.lax.cond(jnp.any(c5[0] > 0), run, lambda c: c, c5)

        c5_T = jax.lax.fori_loop(0, K, fwd_chunk, carry0)

        # ---- loss + cotangent seed ----
        if fused:
            loss, seed = fused_seed(c5_T[1], c5_T[2], c5_T[3])
        else:
            loss, seed = None, (g_tile[0], g_tile[1], g_tile[2])

        # ---- backward sweep: rolled reverse chunk loop ----
        f_leaves = [s for s, f in zip(ck_shapes, is_f) if f]
        dfl0 = tuple(
            list(seed)
            + [jnp.zeros(s.shape, s.dtype) for s in f_leaves[3:]])
        dcr0 = jnp.zeros((1, 24), jnp.float32)
        dvs0 = tuple(jnp.zeros(v.shape, jnp.float32) for v in views)

        def bwd_chunk(j, acc):
            dfl, dcr, dvs = acc
            k = K - 1 - j
            leaves_k = [r[pl.ds(k, 1)][0] for r in ck_refs]
            c5_k = jax.tree.unflatten(treedef5, leaves_k)
            fl_k, il_k, meta_k = _split_carry(c5_k)

            def live(args):
                fl_k, dfl = args

                def chunk_fn(fl, cr, *vs):
                    tbl = _unpack_tables(vs)
                    body = T.make_bounce_body(static, tbl, True, True,
                                              cr[0, 17], max_trips=trips,
                                              march_impl=march_diff)
                    c5 = _merge_carry(fl, il_k, meta_k)
                    c6 = (c5[0], k * cA, c5[1], c5[2], c5[3], c5[4])
                    for _ in range(cA):
                        c6 = body(c6)
                    return _split_carry(
                        (c6[0], c6[2], c6[3], c6[4], c6[5]))[0]

                _, vjp = jax.vjp(chunk_fn, fl_k, cam_row, *views)
                douts = vjp(tuple(dfl))
                return (tuple(douts[0]), douts[1], tuple(douts[2:]))

            def dead(args):
                fl_k, dfl = args
                return (tuple(dfl), jnp.zeros((1, 24), jnp.float32),
                        tuple(jnp.zeros(v.shape, jnp.float32)
                              for v in views))

            dfl2, dcr_i, dvs_i = jax.lax.cond(jnp.any(c5_k[0] > 0), live,
                                              dead, (fl_k, dfl))
            return (dfl2, dcr + dcr_i,
                    tuple(a + b for a, b in zip(dvs, dvs_i)))

        dfl, dcr, dvs = jax.lax.fori_loop(0, K, bwd_chunk,
                                          (dfl0, dcr0, dvs0))

        # ---- transpose the peel ----
        def peel_fl(cr, *vs):
            tbl = _unpack_tables(vs)
            org, d = rays(cr)
            ar, ag, ab, slots, sp = T.bounce_init(static, tbl, org, d, True,
                                                  True, cr[0, 17],
                                                  march_impl=march_diff)
            return _split_carry((sp, ar, ag, ab, slots))[0]

        _, vjp = jax.vjp(peel_fl, cam_row, *views)
        douts = vjp(tuple(dfl))
        dcr = dcr + douts[0]
        dvs = tuple(a + b for a, b in zip(dvs, douts[1:]))
        write_grads(dcr, dvs, loss)

    pl.run_scoped(
        scoped,
        *[pltpu.VMEM((K,) + s.shape, s.dtype) for s in ck_shapes])


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 8, 10, 11, 12))
def vjp_pallas_ckpt(static, tables, cam, H: int, W: int, g, tile=None,
                    time=0.0, interpret: bool = False, y0=0.0,
                    rows: int | None = None, trip_chunk: int | None = None,
                    march_chunk: int | None = None):
    """Backward of a Pallas render through the in-kernel checkpointed VJP.

    Same contract as pallas_kernel.vjp_pallas: returns (d_tables, d_cam,
    d_time) with dtypes matching the primals; ``y0``/``rows`` restrict to a
    row slab of the global frame (the sharded training path).  ``tile`` /
    ``trip_chunk`` / ``march_chunk`` default to the measured v5e plan
    (default_plan); pass explicit values to override."""
    tile, trip_chunk, march_chunk = default_plan(static, tile, trip_chunk,
                                                 march_chunk)
    TH, TW = tile
    R = H if rows is None else rows
    Rp, Wp = _cdiv(R, TH) * TH, _cdiv(W, TW) * TW
    views = _table_views(tables)
    n_views = len(views)
    grid = (Rp // TH, Wp // TW)

    g = jnp.moveaxis(jnp.asarray(g, jnp.float32), -1, 0)        # [3, R, W]
    g = jnp.pad(g, ((0, 0), (0, Rp - R), (0, Wp - W)))          # [3, Rp, Wp]
    cam_row = _pack_camera(cam, time, y0)

    in_specs = [pl.BlockSpec((1, 24), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)]
    for v in views:
        in_specs.append(pl.BlockSpec(v.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((3, TH, TW), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((1, 24), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((1, 24), jnp.float32)]
    for v in views:
        out_specs.append(pl.BlockSpec(v.shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(v.shape, jnp.float32))

    outs = pl.pallas_call(
        partial(_ckpt_kernel, static, H, W, TH, TW, n_views, trip_chunk,
                march_chunk, False, R),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=SEQ_GRID,    # grad accumulation needs a sequential grid
    )(cam_row, *views, g)

    return _grads_from_rows(outs[0], outs[1:], tables, cam)


@partial(jax.jit, static_argnums=(0, 4, 5, 7, 9, 11, 12, 13))
def train_step_pallas(static, tables, cam, target, H: int, W: int,
                      time=0.0, tile=None, y0=0.0,
                      rows: int | None = None, norm=None,
                      interpret: bool = False,
                      trip_chunk: int | None = None,
                      march_chunk: int | None = None):
    """The WHOLE inverse-rendering gradient step in ONE Pallas kernel:
    render, MSE loss against ``target``, and gradients of
    ``norm * sum((img - target)^2)`` w.r.t. every table, the camera and
    time — the forward sweep's colors never leave VMEM and no separate
    render kernel runs (fused=True path of _ckpt_kernel).

    ``norm`` defaults to 1/(H*W*3), i.e. the loss is the mean squared
    error over the full frame; the sharded trainer passes the global norm
    so per-shard losses/grads psum to the global quantities.  Returns
    (loss, d_tables, d_cam, d_time)."""
    tile, trip_chunk, march_chunk = default_plan(static, tile, trip_chunk,
                                                 march_chunk)
    TH, TW = tile
    R = H if rows is None else rows
    Rp, Wp = _cdiv(R, TH) * TH, _cdiv(W, TW) * TW
    views = _table_views(tables)
    n_views = len(views)
    grid = (Rp // TH, Wp // TW)

    if norm is None:
        norm = 1.0 / (H * W * 3)
    tgt = jnp.moveaxis(jnp.asarray(target, jnp.float32), -1, 0)
    tgt = jnp.pad(tgt, ((0, 0), (0, Rp - R), (0, Wp - W)))
    cam_row = _pack_camera(cam, time, y0)
    cam_row = cam_row.at[0, 19].set(jnp.asarray(norm, jnp.float32))

    in_specs = [pl.BlockSpec((1, 24), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)]
    for v in views:
        in_specs.append(pl.BlockSpec(v.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((3, TH, TW), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 24), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.float32),
                  jax.ShapeDtypeStruct((1, 24), jnp.float32)]
    for v in views:
        out_specs.append(pl.BlockSpec(v.shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(v.shape, jnp.float32))

    outs = pl.pallas_call(
        partial(_ckpt_kernel, static, H, W, TH, TW, n_views, trip_chunk,
                march_chunk, True, R),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=SEQ_GRID,    # loss + grad accumulation across programs
    )(cam_row, *views, tgt)

    loss = outs[0][0, 0]
    d_tables, d_cam, d_time = _grads_from_rows(outs[1], outs[2:], tables,
                                               cam)
    return loss, d_tables, d_cam, d_time
