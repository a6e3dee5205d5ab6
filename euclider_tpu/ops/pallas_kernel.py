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

DEFAULT_TILE = (16, 128)


def _pack_camera(cam: CameraParams, time=0.0) -> jnp.ndarray:
    """Camera params (+ scene time, slot 17) packed into a (1, 24) f32
    SMEM-friendly row."""
    row = jnp.concatenate([
        jnp.asarray(cam.position, jnp.float32).reshape(4),
        jnp.asarray(cam.forward, jnp.float32).reshape(4),
        jnp.asarray(cam.up, jnp.float32).reshape(4),
        jnp.asarray(cam.right, jnp.float32).reshape(4),
        jnp.reshape(jnp.asarray(cam.tan_half_fov, jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(time, jnp.float32), (1,)),
        jnp.zeros((6,), jnp.float32),
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
        portal_lin=plin[:].reshape(-1, 4, 4),
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
          ).astype(jnp.float32)
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


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def render_image_pallas(static, tables, cam, H: int, W: int,
                        tile=DEFAULT_TILE, loop: str = "while",
                        interpret: bool = False, time=0.0):
    """Render a frame with the Pallas megakernel -> [H, W, 3] float32.

    tile: (TILE_H, TILE_W); TILE_W should be a multiple of 128 and TILE_H a
    multiple of 8 for clean (sublane, lane) tiling.  loop='while' early-exits
    when every ray's stack drains; 'fori' runs the static max_nodes trips
    (used by the differentiable path).
    """
    TH, TW = tile
    Hp, Wp = _cdiv(H, TH) * TH, _cdiv(W, TW) * TW
    views = _table_views(tables)
    grid = (Hp // TH, Wp // TW)

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
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(_pack_camera(cam, time), *views)
    return jnp.transpose(out[:, :H, :W], (1, 2, 0))


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, blocked lax backward (recompute)
# ---------------------------------------------------------------------------

BWD_BLOCK_ROWS = 64


def vjp_blocked(static, tables, cam, H: int, W: int, g,
                block_rows: int = BWD_BLOCK_ROWS, time=0.0):
    """Backward pass of a full-frame render in row blocks.

    jax.vjp of the whole-frame differentiable render materialises the
    bounce-loop tape for every pixel at once (O(H·W·max_nodes) residuals) —
    at 720p that is GBs and caps gradient resolution.  The pixel sum in any
    loss is linear over rows, so the VJP is computed per row block inside a
    lax.scan and accumulated: peak memory drops to one block's tape while
    the math stays exactly the recompute VJP (block results are sums of
    per-pixel cotangent contributions; padded rows carry zero cotangents and
    contribute exactly zero).
    """
    import jax.numpy as jnp

    bh = min(block_rows, H)
    nb = -(-H // bh)
    Hp = nb * bh
    g = jnp.pad(jnp.asarray(g, jnp.float32), ((0, Hp - H), (0, 0), (0, 0)))
    dt = jnp.asarray(tables.surf_color).dtype

    def frender(y0, t, c):
        yi = y0.astype(dt) + jax.lax.broadcasted_iota(dt, (bh, W), 0)
        xi = jax.lax.broadcasted_iota(dt, (bh, W), 1)
        r, gq, b = T.render_rays(static, t, c, xi, yi, W, H, True, time)
        return jnp.stack([r, gq, b], axis=-1)

    def block(carry, i):
        gt, gc = carry
        y0 = i * bh
        gblk = jax.lax.dynamic_slice(g, (y0, 0, 0), (bh, W, 3))
        _, vjp = jax.vjp(lambda t, c: frender(y0, t, c), tables, cam)
        dgt, dgc = vjp(gblk)
        gt = jax.tree.map(jnp.add, gt, dgt)
        gc = jax.tree.map(jnp.add, gc, dgc)
        return (gt, gc), None

    zt = jax.tree.map(lambda a: jnp.zeros(jnp.shape(a), jnp.asarray(a).dtype),
                      tables)
    zc = jax.tree.map(lambda a: jnp.zeros(jnp.shape(a), jnp.asarray(a).dtype),
                      cam)
    (gt, gc), _ = jax.lax.scan(block, (zt, zc), jnp.arange(nb))
    return gt, gc


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def render_image_pallas_diff(static, tables, cam, H: int, W: int):
    return render_image_pallas(static, tables, cam, H, W)


def _fwd(static, tables, cam, H, W):
    return render_image_pallas(static, tables, cam, H, W), (tables, cam)


def _bwd(static, H, W, res, g):
    tables, cam = res
    return vjp_blocked(static, tables, cam, H, W, g)


render_image_pallas_diff.defvjp(_fwd, _bwd)
