"""The tracing core: per-ray trace loop over composable scenes.

Replicates the semantics of euclider's ``Universe::trace`` (upstream
``src/universe/mod.rs``; SURVEY.md §3.3) in an iteration-friendly,
fully-batched form:

  * The reference's bounded *recursion* (reflection + translucent
    transmission branches) becomes a masked **DFS stack loop**: each ray
    carries a stack of at most ``max_depth + 1`` deferred branches
    (origin, direction, weight, material, remaining depth).  Because the
    recursion tree is binary and contributions combine *linearly*
    (color = ratio·refl + (1-ratio)·(alpha·surface + (1-alpha)·through)),
    every node's local term can be accumulated with a scalar path weight —
    the loop pops a branch, shades it, and pushes up to two children.
  * The reference's (material TypeId, shape TypeId) intersector dispatch and
    (from, to) transition dispatch become *compile-time specialisation*:
    Python-unrolled loops over the static scene topology (SURVEY §3.3
    replication notes / BASELINE.json:5 integer-coded dispatch, taken one
    step further: the codes are burned into the XLA program).
  * Straight-space propagation uses analytic intersections; warped-space
    propagation uses ops.march.  Both feed one segment-hit record.

Exact semantics are pinned in docs/SEMANTICS.md; the NumPy and C++ oracles
(euclider_tpu.oracle) implement the same contract scalar-recursively.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry as G
from . import march as M
from . import shading
from . import vec as V
from .vec import Vec

PUSH = 1e-3    # offset to escape a surface when spawning a secondary ray
W_EPS = 1e-4   # path-weight cutoff: branches below this contribute nothing


# ---------------------------------------------------------------------------
# material queries (compile-time specialised; SURVEY §3.3 'material_at')
# ---------------------------------------------------------------------------

def material_at(static, tables, p: Vec):
    """Material id at a point: first entity (scene order) containing it wins,
    else the ambient material."""
    mat = jnp.full(jnp.shape(p.x), static.ambient, jnp.int32)
    for ei in reversed(range(len(static.entities))):
        e = static.entities[ei]
        inside = G.member(e.shape, tables, p)
        mat = jnp.where(inside, jnp.int32(e.material), mat)
    return mat


def mat_lookup(tables_column, mat_ids):
    """column[mat_ids] with a static where-chain (no gather)."""
    out = jnp.broadcast_to(tables_column[0], jnp.shape(mat_ids))
    for m in range(1, tables_column.shape[0]):
        out = jnp.where(mat_ids == m, tables_column[m], out)
    return out


WARP_KINDS = ("warp", "expr")   # material kinds that march instead of flying


def warp_mask(static, mat_ids):
    mask = jnp.zeros(jnp.shape(mat_ids), bool)
    for m, kind in enumerate(static.mat_kinds):
        if kind in WARP_KINDS:
            mask = mask | (mat_ids == m)
    return mask


def warp_step(static, tables, mat_ids):
    """Per-ray march step size h, selected from the material tables."""
    shape = jnp.shape(mat_ids)
    dt = jnp.asarray(tables.mat_warp_step).dtype
    h = jnp.full(shape, 0.05, dt)
    for m, kind in enumerate(static.mat_kinds):
        if kind in WARP_KINDS:
            h = jnp.where(mat_ids == m, tables.mat_warp_step[m], h)
    return h


def make_accel(static, tables, mat_ids, time=0.0):
    """Acceleration field a(x) for marching rays, per-ray-dispatched over
    the scene's warped materials (compile-time specialised like everything
    else): 'warp' materials contribute the attractor field, 'expr' materials
    their compiled expression field (scene/expr.py)."""
    from ..scene import expr as E

    any_attractor = any(k == "warp" for k in static.mat_kinds)
    expr_mats = [m for m, k in enumerate(static.mat_kinds) if k == "expr"]
    if any_attractor:
        shape = jnp.shape(mat_ids)
        dt = jnp.asarray(tables.mat_warp_step).dtype
        zf = jnp.zeros(shape, dt)
        wc = Vec(zf, zf, zf, zf)
        ws = zf
        for m, kind in enumerate(static.mat_kinds):
            if kind == "warp":
                sel = mat_ids == m
                row = tables.mat_warp_center[m]
                wc = V.where(sel, Vec(row[0], row[1], row[2], row[3]), wc)
                ws = jnp.where(sel, tables.mat_warp_strength[m], ws)
    # safe=True: partial-domain functions (sqrt/log/asin/acos/div) are
    # domain-guarded with the double-where pattern, because the field is
    # evaluated at EVERY ray position and masked afterwards — a NaN on an
    # unselected lane would ride 0*NaN through V.where's VJP and poison all
    # gradients (ADVICE r2).  Domain-valid scenes are numerically unchanged.
    lib = E.jax_lib(safe=True) if expr_mats else None

    def accel(x: Vec) -> Vec:
        if any_attractor:
            a = M.warp_accel(wc, ws, x)   # ws == 0 where not an attractor
        else:
            zf = jnp.zeros_like(x.x)
            a = Vec(zf, zf, zf, zf)
        for m in expr_mats:
            env = {"x": x.x, "y": x.y, "z": x.z, "w": x.w, "t": time}
            for i in range(8):
                env[f"p{i}"] = tables.mat_expr_params[m, i]
            comps = tuple(E.eval_ast(t, env, lib)
                          for t in static.mat_exprs[m])
            a = V.where(mat_ids == m, Vec(*comps), a)
        return a

    return accel


# ---------------------------------------------------------------------------
# segment propagation: nearest hit in the current space
# ---------------------------------------------------------------------------

def nearest_hit_straight(static, tables, org: Vec, d: Vec):
    zf = jnp.zeros_like(org.x)
    best_t = jnp.full_like(org.x, static.t_max)
    hit = jnp.zeros_like(org.x, bool)
    ent = jnp.zeros_like(org.x, jnp.int32)
    n = Vec(zf, zf, zf, zf)
    u = zf
    v = zf
    for ei, e in enumerate(static.entities):
        need_uv = (static.surf_need_uv[e.surface]
                   if static.surf_need_uv else True)
        t_e, hit_e, n_e, u_e, v_e = G.entity_hit_straight(
            e.shape, tables, org, d, static.dim, static.t_max, need_uv)
        take = hit_e & (t_e < best_t)
        best_t = jnp.where(take, t_e, best_t)
        hit = hit | take
        ent = jnp.where(take, jnp.int32(ei), ent)
        n = V.where(take, n_e, n)
        u = jnp.where(take, u_e, u)
        v = jnp.where(take, v_e, v)
    return best_t, hit, ent, n, u, v


def propagate(static, tables, org: Vec, d: Vec, mat_ids,
              differentiable: bool = False, time=0.0, march_impl=None):
    """One segment: from org along d inside material mat_ids until the first
    entity boundary.  Returns (hit, p, dir_at_hit, ent, normal, u, v).

    ``march_impl`` overrides how warped-space rays are marched: a callable
    (static, tables, time, mat_ids, org, d, h, active) -> march_hit's seven
    outputs.  The in-kernel checkpointed backward (ops/pallas_vjp.py) passes
    its custom-VJP march here; the default is the plain fori/while loop."""
    t, hit, ent, n, u, v = nearest_hit_straight(static, tables, org, d)
    p = V.madd(org, t, d)
    dout = d
    if static.has_warp:
        wm = warp_mask(static, mat_ids)
        h = warp_step(static, tables, mat_ids)
        if march_impl is not None:
            mh_hit, mh_p, mh_d, mh_ent, mh_n, mh_u, mh_v = march_impl(
                static, tables, time, mat_ids, org, d, h, wm)
        else:
            accel_fn = make_accel(static, tables, mat_ids, time)
            mh_hit, mh_p, mh_d, mh_ent, mh_n, mh_u, mh_v = M.march_hit(
                static, tables, org, d, accel_fn, h,
                differentiable=differentiable, active=wm)
        # logical merge, not jnp.where: Mosaic cannot lower selects between
        # i1 vectors ("Unsupported target bitwidth for truncation")
        hit = (wm & mh_hit) | (~wm & hit)
        p = V.where(wm, mh_p, p)
        dout = V.where(wm, mh_d, dout)
        ent = jnp.where(wm, mh_ent, ent)
        n = V.where(wm, mh_n, n)
        u = jnp.where(wm, mh_u, u)
        v = jnp.where(wm, mh_v, v)
    return hit, p, dout, ent, n, u, v


# ---------------------------------------------------------------------------
# DFS stack machinery (per-ray, masked; capacity = max_depth + 1)
# ---------------------------------------------------------------------------

def _slot_where(m, a, b):
    return (V.where(m, a[0], b[0]), V.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]), jnp.where(m, a[3], b[3]),
            jnp.where(m, a[4], b[4]))


def read_slot(slots, idx):
    out = slots[0]
    for k in range(1, len(slots)):
        out = _slot_where(idx == k, slots[k], out)
    return out


def write_slot(slots, idx, mask, val, kmax=None):
    """Masked write of ``val`` into slot ``idx``; ``kmax`` statically bounds
    which slots can be targeted (e.g. the peeled first node can only write
    slots 0 and 1), eliding dead select chains."""
    kmax = len(slots) if kmax is None else min(kmax, len(slots))
    return tuple(_slot_where(mask & (idx == k), val, slots[k])
                 if k < kmax else slots[k]
                 for k in range(len(slots)))


# ---------------------------------------------------------------------------
# the trace loop
# ---------------------------------------------------------------------------

def _shade_node(static, tables, org: Vec, d: Vec, wgt, mat, depth, active,
                differentiable, used_surfs, do_transmit, do_reflect,
                depth_ge2, texture_matmul=False, time=0.0,
                march_impl=None):
    """Shade one DFS node: propagate to the nearest boundary, accumulate the
    local color term, and emit up to two deferred branches.

    Returns (dr, dg, db, branches) with branches a list of
    (push_mask, (org, dir, weight, material, depth)) — transmission first,
    then reflection, matching the reference's recursion order (SURVEY §3.3).
    ``depth_ge2`` is None when depth >= 2 is statically known (the peeled
    primary node), else the per-ray boolean.
    """
    ents = static.entities
    bshape = jnp.shape(org.x)
    dt = jnp.asarray(org.x).dtype
    zf = jnp.zeros(bshape, dt)

    hit, p, dout, ent, n, u, v = propagate(static, tables, org, d, mat,
                                           differentiable, time, march_impl)
    hit = hit & active
    miss = active & ~hit

    bg = tables.background
    dr = jnp.where(miss, wgt * bg[0], 0.0)
    dg = jnp.where(miss, wgt * bg[1], 0.0)
    db = jnp.where(miss, wgt * bg[2], 0.0)

    # orient the geometric normal against the incoming direction
    flip = V.dot(n, dout) > 0.0
    n = V.where(flip, V.scale(n, -1.0), n)

    # surface color / reflectivity of the winning entity
    cols = {s: shading.eval_surface(static, tables, s, u, v, texture_matmul)
            for s in used_surfs}
    cr, cg, cb, ca, refl = zf, zf, zf, jnp.ones(bshape, dt), zf
    fres = zf
    any_fres = any(not (static.surf_fres0 or (False,) * len(
        static.surf_kinds))[e.surface] for e in ents) if not differentiable \
        else True
    for ei, e in enumerate(ents):
        sel = ent == ei
        c = cols[e.surface]
        cr = jnp.where(sel, c[0], cr)
        cg = jnp.where(sel, c[1], cg)
        cb = jnp.where(sel, c[2], cb)
        ca = jnp.where(sel, c[3], ca)
        refl = jnp.where(sel, tables.surf_refl[e.surface], refl)
        if any_fres:
            fres = jnp.where(sel, tables.surf_fresnel[e.surface], fres)

    if any_fres:
        # get_reflection_ratio with a Schlick fresnel term (reference's
        # composable reflection-ratio closures, SURVEY §2.1 Surfaces):
        # ratio = rho + (1-rho) * fresnel * (1 - cos_i)^5, cos_i against
        # the oriented normal.  fresnel == 0 reproduces the constant ratio
        # exactly (the static surf_fres0 hint elides this block then).
        cos_i = jnp.clip(-V.dot(dout, n), 0.0, 1.0)
        m1 = 1.0 - cos_i
        m2 = m1 * m1
        refl = refl + (1.0 - refl) * fres * (m2 * m2 * m1)

    # local emitted term: weight * (1-ratio) * alpha * surface_color
    lw = wgt * (1.0 - refl) * ca
    dr = dr + jnp.where(hit, lw * cr, 0.0)
    dg = dg + jnp.where(hit, lw * cg, 0.0)
    db = db + jnp.where(hit, lw * cb, 0.0)

    branches = []

    if do_transmit:
        # --- transmission branch (translucent surfaces; SURVEY §3.3/3.4) ---
        p_past = V.madd(p, PUSH, dout)
        m_to = material_at(static, tables, p_past)
        eta = mat_lookup(tables.mat_ior, mat) / mat_lookup(tables.mat_ior, m_to)
        tdir, tok = V.refract(dout, n, eta)
        t_org = V.madd(p, PUSH, tdir)
        t_mat = m_to
        if static.has_portal:
            any_portal = jnp.zeros(bshape, bool)
            for ei, e in enumerate(ents):
                if e.portal is None:
                    continue
                selp = ent == ei
                lin = tables.portal_lin[e.portal]
                tr = tables.portal_tr[e.portal]
                pp = V.add(V.matvec(lin, p), Vec(tr[0], tr[1], tr[2], tr[3]))
                pd = V.normalize(V.matvec(lin, dout))
                t_org = V.where(selp, V.madd(pp, PUSH, pd), t_org)
                tdir = V.where(selp, pd, tdir)
                tok = tok | selp
                any_portal = any_portal | selp
            # teleported rays land in a fresh region: re-resolve their material
            t_mat = jnp.where(any_portal,
                              material_at(static, tables, t_org), t_mat)

        w_t = wgt * (1.0 - refl) * (1.0 - ca)
        push_t = hit & tok & (w_t > W_EPS)
        if depth_ge2 is not None:
            push_t = push_t & depth_ge2
        branches.append((push_t, (t_org, tdir, w_t, t_mat, depth - 1)))

    if do_reflect:
        # --- reflection branch -------------------------------------------
        rdir = V.reflect(dout, n)
        r_org = V.madd(p, PUSH, rdir)
        w_r = wgt * refl
        push_r = hit & (w_r > W_EPS)
        if depth_ge2 is not None:
            push_r = push_r & depth_ge2
        branches.append((push_r, (r_org, rdir, w_r, mat, depth - 1)))

    return dr, dg, db, branches


def _bounce_plan(static, differentiable):
    """Static branch-liveness plan shared by trace_batch and the chunked
    backward (pallas_kernel): which deferred branches can exist at all."""
    ents = static.entities
    D = static.max_depth
    prune = not differentiable
    sa1 = static.surf_alpha1 or (False,) * len(static.surf_kinds)
    sr0 = static.surf_refl0 or (False,) * len(static.surf_kinds)
    any_transmit = any((e.portal is not None) or not sa1[e.surface]
                       for e in ents)
    any_reflect = any(not sr0[e.surface] for e in ents)
    do_transmit = D >= 2 and (any_transmit or not prune)
    do_reflect = D >= 2 and (any_reflect or not prune)
    used_surfs = sorted({e.surface for e in ents})
    return used_surfs, do_transmit, do_reflect


def bounce_init(static, tables, org0: Vec, d0: Vec, differentiable,
                texture_matmul, time, march_impl=None):
    """Peel the primary node; returns (ar, ag, ab, slots, sp) — the loop
    carry minus the trip counter — or (ar, ag, ab, None, None) when the
    scene statically has no deferred branches."""
    used_surfs, do_transmit, do_reflect = _bounce_plan(static,
                                                       differentiable)
    D = static.max_depth
    S = D + 1
    bshape = jnp.shape(org0.x)
    dt = jnp.asarray(org0.x).dtype
    zf = jnp.zeros(bshape, dt)
    zi = jnp.zeros(bshape, jnp.int32)
    zvec = Vec(zf, zf, zf, zf)

    ar, ag, ab, branches = _shade_node(
        static, tables, org0, d0, jnp.ones(bshape, dt),
        jnp.full(bshape, static.ambient, jnp.int32),
        jnp.full(bshape, jnp.int32(D)), jnp.ones(bshape, bool),
        differentiable, used_surfs, do_transmit, do_reflect,
        depth_ge2=None, texture_matmul=texture_matmul, time=time,
        march_impl=march_impl)
    if not branches:
        return ar, ag, ab, None, None

    empty = (zvec, zvec, zf, zi, zi)
    slots = tuple(empty for _ in range(S))
    sp = zi
    for k, (mask, val) in enumerate(branches):
        slots = write_slot(slots, sp, mask, val, kmax=k + 1)
        sp = sp + mask.astype(jnp.int32)
    return ar, ag, ab, slots, sp


def make_bounce_body(static, tables, differentiable, texture_matmul, time,
                     max_trips=None, march_impl=None):
    """One trip of the DFS loop: body(carry) with
    carry = (sp, it, ar, ag, ab, slots).

    ``max_trips`` additionally gates the trip on the global trip counter
    ``it`` (trips at it >= max_trips are exact no-ops) — the chunked
    backward (ops/pallas_vjp.py) pads its rolled chunk loop to a multiple of
    the chunk size, and padded trips must not pop nodes the forward never
    shaded (the truncated-traversal hazard, ADVICE r3)."""
    used_surfs, do_transmit, do_reflect = _bounce_plan(static,
                                                       differentiable)

    def body(carry):
        sp, it, ar, ag, ab, slots = carry
        active = sp > 0
        if max_trips is not None:
            active = active & (it < max_trips)
        top = jnp.maximum(sp - 1, 0)
        org, d, wgt, mat, depth = read_slot(slots, top)
        sp = jnp.where(active, sp - 1, sp)

        dr, dg, db, branches = _shade_node(
            static, tables, org, d, wgt, mat, depth, active,
            differentiable, used_surfs, do_transmit, do_reflect,
            depth_ge2=(depth >= 2), texture_matmul=texture_matmul,
            time=time, march_impl=march_impl)
        ar, ag, ab = ar + dr, ag + dg, ab + db

        for mask, val in branches:
            slots = write_slot(slots, sp, mask, val)
            sp = sp + mask.astype(jnp.int32)

        return (sp, it + 1, ar, ag, ab, slots)

    return body


def trace_batch(static, tables, org0: Vec, d0: Vec,
                differentiable: bool = False, texture_matmul: bool = False,
                time=0.0, remat: bool = False, unroll: bool = False):
    """Trace a batch of primary rays; returns (r, g, b) arrays shaped like
    org0.x.

    With ``differentiable=True`` the bounce loop runs a static
    ``max_nodes``-trip fori_loop (reverse-mode differentiable; masked
    iterations are no-ops) instead of an early-exiting while_loop — same
    semantics, needed because lax.while_loop has no reverse-mode rule.
    ``remat=True`` checkpoints the loop body, so a backward pass stores one
    carry per trip instead of every intermediate — the knob that lets the
    Pallas backward kernel keep a whole tile's tape in VMEM.
    ``unroll=True`` runs the differentiable loop as straight-line Python-
    unrolled code: required inside the Pallas backward kernel, where
    Mosaic cannot lower the residual-stacking scan that reverse-mode AD
    makes of a fori_loop.

    The primary node is peeled out of the loop (its stack state is known),
    and statically-dead branches are pruned: depth-1 scenes can never push,
    and — in the non-differentiable path only — scenes whose IR surfaces are
    all exactly opaque (alpha == 1, no portals) skip the transmission
    machinery, all-matte scenes (reflectivity == 0) the reflection push.
    Both prunings are value-exact: the elided branches have weight exactly 0.
    """
    # --- peeled primary node (stack state statically known) ---------------
    ar, ag, ab, slots, sp = bounce_init(static, tables, org0, d0,
                                        differentiable, texture_matmul,
                                        time)
    if slots is None:
        return ar, ag, ab

    body = make_bounce_body(static, tables, differentiable, texture_matmul,
                            time)

    def cond(carry):
        sp, it, _, _, _, _ = carry
        return (it < static.max_nodes - 1) & jnp.any(sp > 0)

    carry = (sp, jnp.int32(0), ar, ag, ab, slots)
    if differentiable:
        step = jax.checkpoint(body) if remat else body
        if unroll:
            for _ in range(static.max_nodes - 1):
                carry = step(carry)
        else:
            carry = jax.lax.fori_loop(0, static.max_nodes - 1,
                                      lambda _, c: step(c), carry)
    else:
        carry = jax.lax.while_loop(cond, body, carry)
    _, _, ar, ag, ab, _ = carry
    return ar, ag, ab


# ---------------------------------------------------------------------------
# camera rays + whole-image renderer (the lax backend)
# ---------------------------------------------------------------------------

def camera_rays(cam, xi, yi, W: int, H: int):
    """Pinhole rays, dimension-generic (basis vectors live in R^4).

    Reference: d3/d4 camera get_ray_point / get_ray_direction
    (SURVEY.md §2.1 Cameras).  The frame is re-orthonormalised here
    (Gram-Schmidt) so camera parameters stay freely differentiable.
    The compute dtype follows ``xi`` (f32 everywhere; f64 when the caller
    renders in double precision — the CustomFloat axis of SURVEY L0).
    """
    dt = jnp.asarray(xi).dtype
    f = V.normalize(V.from_array(cam.forward, dt))
    r0 = V.from_array(cam.right, dt)
    r = V.normalize(V.madd(r0, -V.dot(r0, f), f))
    u0 = V.from_array(cam.up, dt)
    u1 = V.madd(u0, -V.dot(u0, f), f)
    u = V.normalize(V.madd(u1, -V.dot(u1, r), r))

    aspect = W / H
    t = jnp.asarray(cam.tan_half_fov, dt)
    ndx = ((xi + 0.5) / W * 2.0 - 1.0) * (aspect * t)
    ndy = (1.0 - (yi + 0.5) / H * 2.0) * t
    d = V.normalize(Vec(f.x + ndx * r.x + ndy * u.x,
                        f.y + ndx * r.y + ndy * u.y,
                        f.z + ndx * r.z + ndy * u.z,
                        f.w + ndx * r.w + ndy * u.w))
    org = V.splat(V.from_array(cam.position, dt), jnp.shape(xi))
    return org, d


def render_image(static, tables, cam, H: int, W: int,
                 differentiable: bool = False, time=0.0):
    """Render a full frame with the pure-lax backend -> [H, W, 3] float32.

    Pass ``differentiable=True`` when taking gradients through the render.
    ``time`` is the scene time handed to time-dependent materials (the
    reference's ``trace(time, ...)`` argument, SURVEY.md §3.3) — a traced
    scalar, so animating it does not recompile.
    """
    dt = jnp.asarray(tables.surf_color).dtype
    yi = jax.lax.broadcasted_iota(dt, (H, W), 0)
    xi = jax.lax.broadcasted_iota(dt, (H, W), 1)
    org, d = camera_rays(cam, xi, yi, W, H)
    r, g, b = trace_batch(static, tables, org, d, differentiable, time=time)
    return jnp.stack([r, g, b], axis=-1)


render_image_jit = jax.jit(render_image, static_argnums=(0, 3, 4, 5))


def render_rays(static, tables, cam, xi, yi, W: int, H: int,
                differentiable: bool = False, time=0.0):
    """Trace an arbitrary batch of pixel coordinates (sub-tile / sparse)."""
    org, d = camera_rays(cam, xi, yi, W, H)
    return trace_batch(static, tables, org, d, differentiable, time=time)
