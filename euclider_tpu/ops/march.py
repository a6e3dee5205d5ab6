"""Non-Euclidean ray propagation: bounded-step march through warped space.

Reference semantics (SURVEY.md §3.4): rays inside a non-vacuum "space
material" do not travel straight — propagation *within* the material is owned
by that material.  Here a WarpSpace material bends rays toward/away from an
attractor each step:

    a(x) = strength * (c - x) / |c - x|^3
    v'   = normalize(v + h * a(x));   x' = x + h * v'

Boundary detection is uniform over all shapes: per step, each entity's side
predicate (geometry.side — membership, or hyperplane side for sheets) is
compared before/after the step; a flip marks a crossing.  The crossing is
refined *after* the march loop by bisection on the stored step segment, so
the hot loop stays lean.  Everything is fixed-trip-count, masked, and
batched — the 'iterative bounded-depth march' mandated by BASELINE.json:5.

The loop is decomposed into march_init / make_march_body / march_finish so
the in-kernel checkpointed backward (ops/pallas_vjp.py) can drive the same
step function under its hand-rolled reverse sweep; march_hit composes them
for the forward paths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry as G
from . import vec as V
from .vec import Vec

BISECT_ITERS = 10


def warp_accel(center: Vec, strength, x: Vec) -> Vec:
    d = V.sub(center, x)
    r2 = V.norm2(d) + 1e-4
    inv_r3 = r2 ** jnp.asarray(-1.5, r2.dtype)
    return V.scale(d, strength * inv_r3)


def march_init(static, tables, org: Vec, d0: Vec, active=None):
    """Initial march carry: (x, v, done, sx0, sx1, sv, sides, crossed, dist).

    Loop carries use int32 flags, not bool: Mosaic rejects i1 vector
    carries ("Unsupported target bitwidth for truncation").  The zero
    leaves are derived from org.x (``org.x * 0``) rather than broadcast
    constants: inside the chunked Pallas backward (ops/pallas_vjp.py) a
    broadcast zero gets a *replicated* Mosaic layout, and a loop carry
    initialised replicated but updated with concrete-layout values hits
    "Invalid relayout: non-singleton dimension replicated in destination
    but not in source".  XLA const-folds the multiply on the lax path."""
    ents = static.entities
    zero = org.x * 0.0
    zi = zero.astype(jnp.int32)
    sides0 = tuple(G.side(e.shape, tables, org).astype(jnp.int32)
                   for e in ents)
    crossed0 = tuple(zi for _ in range(len(ents)))
    done0 = zi if active is None else (~active).astype(jnp.int32)
    return (org, d0, done0,                               # x, v, done
            org, org, d0,                                 # seg x0, x1, v
            sides0, crossed0, zero)                       # sides, crossed, dist


def make_march_body(static, tables, accel_fn, h):
    """One march step: body(carry) -> carry (shared by the forward loops and
    the checkpointed reverse sweep in ops/pallas_vjp.py)."""
    ents = static.entities
    E = len(ents)

    def side_i(node, p):
        return G.side(node, tables, p).astype(jnp.int32)

    def body(carry):
        x, v, done, sx0, sx1, sv, sides, crossed, dist = carry
        a = accel_fn(x)
        v1 = V.normalize(V.madd(v, h, a))
        x1 = V.madd(x, h, v1)
        new_sides = tuple(side_i(e.shape, x1) for e in ents)
        cr = tuple((sides[i] != new_sides[i]).astype(jnp.int32)
                   for i in range(E))
        any_cr = cr[0]
        for c in cr[1:]:
            any_cr = any_cr | c
        newly = ((1 - done) & any_cr) == 1
        done_b = done == 1
        sx0 = V.where(newly, x, sx0)
        sx1 = V.where(newly, x1, sx1)
        sv = V.where(newly, v1, sv)
        crossed = tuple(jnp.where(newly, cr[i], crossed[i]) for i in range(E))
        done_next = done | newly.astype(jnp.int32) \
            | (dist > static.t_max).astype(jnp.int32)
        x = V.where(done_b, x, x1)
        v = V.where(done_b, v, v1)
        sides = tuple(jnp.where(done_b, sides[i], new_sides[i])
                      for i in range(E))
        dist = jnp.where(done_b, dist, dist + h)
        return (x, v, done_next, sx0, sx1, sv, sides, crossed, dist)

    return body


def march_finish(static, tables, org: Vec, carry):
    """Bisection refinement of the first crossing recorded in ``carry``.

    Returns (hit, p, dir_at_hit, ent_sel, normal, u, v) — the march_hit
    output contract."""
    ents = static.entities
    zero = jnp.zeros_like(org.x)
    _, _, _, sx0, sx1, sv, _, crossed_i, _ = carry
    crossed = tuple(c == 1 for c in crossed_i)

    # refine each crossed entity by bisection on [sx0, sx1]; keep the nearest
    hit = jnp.zeros_like(org.x, dtype=bool)
    best_lam = jnp.full_like(org.x, 2.0)
    best_p = org
    best_n = Vec(zero, zero, zero, zero)
    best_u = zero
    best_v = zero
    ent_sel = jnp.zeros_like(org.x, dtype=jnp.int32)

    for ei, e in enumerate(ents):
        node = e.shape
        need_uv = (static.surf_need_uv[e.surface]
                   if static.surf_need_uv else True)
        s0 = G.side(node, tables, sx0)
        lo = jnp.zeros_like(org.x)
        hi = jnp.ones_like(org.x)
        for _ in range(BISECT_ITERS):
            mid = 0.5 * (lo + hi)
            pm = V.add(V.scale(sx0, 1.0 - mid), V.scale(sx1, mid))
            same = G.side(node, tables, pm) == s0
            lo = jnp.where(same, mid, lo)
            hi = jnp.where(same, hi, mid)
        lam = hi
        p = V.add(V.scale(sx0, 1.0 - lam), V.scale(sx1, lam))
        # leaf-level normal/uv: the leaf whose boundary is nearest at p
        lvs = G.leaves(node)
        n_e = G.leaf_normal(lvs[0], tables, p)
        babs = G.boundary_abs(lvs[0], tables, p)
        if need_uv:
            u_e, v_e = G.leaf_uv(lvs[0], tables, p, static.dim)
        else:
            u_e = v_e = zero
        for leaf in lvs[1:]:
            b = G.boundary_abs(leaf, tables, p)
            take = b < babs
            babs = jnp.where(take, b, babs)
            n_e = V.where(take, G.leaf_normal(leaf, tables, p), n_e)
            if need_uv:
                uu, vv = G.leaf_uv(leaf, tables, p, static.dim)
                u_e = jnp.where(take, uu, u_e)
                v_e = jnp.where(take, vv, v_e)
        take = crossed[ei] & (lam < best_lam)
        best_lam = jnp.where(take, lam, best_lam)
        best_p = V.where(take, p, best_p)
        best_n = V.where(take, n_e, best_n)
        best_u = jnp.where(take, u_e, best_u)
        best_v = jnp.where(take, v_e, best_v)
        hit = hit | crossed[ei]

        ent_sel = jnp.where(take, jnp.int32(ei), ent_sel)

    return hit, best_p, sv, ent_sel, best_n, best_u, best_v


def march_hit(static, tables, org: Vec, d0: Vec, accel_fn, h,
              differentiable: bool = False, active=None):
    """March a batch of rays; returns the first entity-boundary crossing.

    ``accel_fn(x: Vec) -> Vec`` is the per-ray acceleration field (already
    material-dispatched by the caller — ops.trace.make_accel) and ``h`` the
    per-ray step size.  Straight-material rays can pass through with a zero
    field (they march straight); callers normally mask them out — pass their
    mask as ``active`` so the forward path's early-exit while_loop can skip
    the whole march when no ray needs it.

    With ``differentiable=True`` the loop is a static fori_loop (reverse-mode
    differentiable); otherwise a while_loop that exits as soon as every
    active ray is done.

    Returns (hit, p, dir_at_hit, ent_sel, normal, u, v) where ent_sel is an
    i32 entity index (garbage when ~hit) and normal is unoriented.
    """
    carry = march_init(static, tables, org, d0, active)
    body0 = make_march_body(static, tables, accel_fn, h)
    body = lambda _, c: body0(c)

    if differentiable:
        carry = jax.lax.fori_loop(0, static.march_steps, body, carry)
    else:
        def cond(sc):
            step, c = sc
            return (step < static.march_steps) & jnp.any(c[2] == 0)

        def wbody(sc):
            step, c = sc
            return step + 1, body(step, c)

        _, carry = jax.lax.while_loop(cond, wbody, (jnp.int32(0), carry))

    return march_finish(static, tables, org, carry)
