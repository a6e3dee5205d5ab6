"""Device-mesh sharded rendering: rays/tiles data-parallel over chips.

The reference's only parallelism is a CPU thread pool over pixel rows
(SURVEY.md §2.2).  The TPU-native equivalent: a 1D ``rows`` mesh over all
devices (single- or multi-host), the frame sharded by row-blocks with
``shard_map``, scene tables + camera replicated.  Each device traces its own
slab fully independently — zero collectives in the forward render — and the
sharded output feeds either a host gather (viewer) or a sharded loss
(train.inverse, where the gradient psum rides the backward pass).

Multi-host: call parallel.distributed.initialize() first; the same code then
runs with a global mesh and jax.make_array-style global outputs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import trace as T

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D mesh over (up to) all visible devices, axis name 'rows'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), axis_names=("rows",))


def _local_slab(static, H, W, Hl, differentiable, time, tables, cam):
    """Render this device's row slab; offset comes from the mesh position."""
    row0 = jax.lax.axis_index("rows") * Hl
    yi = (row0.astype(jnp.float32)
          + jax.lax.broadcasted_iota(jnp.float32, (Hl, W), 0))
    xi = jax.lax.broadcasted_iota(jnp.float32, (Hl, W), 1)
    org, d = T.camera_rays(cam, xi, yi, W, H)
    r, g, b = T.trace_batch(static, tables, org, d, differentiable,
                            time=time)
    return jnp.stack([r, g, b], axis=-1)


def _local_slab_pallas(static, H, W, Hl, tile, interpret, time, tables, cam):
    """This device's row slab through the Pallas megakernel: the sharded
    multi-chip path inherits the single-chip kernel's throughput (SURVEY
    §2.2 DP row + §7 step 4 — tiles sharded across chips AND each chip
    running the megakernel)."""
    from ..ops.pallas_kernel import render_image_pallas

    row0 = jax.lax.axis_index("rows") * Hl
    return render_image_pallas(static, tables, cam, H, W, tile, "while",
                               interpret, time, row0.astype(jnp.float32),
                               Hl)


def _local_slab_pallas_diff(static, H, W, Hl, tile, interpret, time, tables,
                            cam):
    """Differentiable per-shard Pallas render: megakernel forward + Pallas
    backward per chip via the custom_vjp (the same composition the sharded
    training path uses, train/inverse.py)."""
    from ..ops.pallas_kernel import render_image_pallas_diff

    row0 = jax.lax.axis_index("rows") * Hl
    return render_image_pallas_diff(static, tables, cam, H, W, time, "auto",
                                    tile, interpret,
                                    row0.astype(jnp.float32), Hl)


def render_image_sharded(static, tables, cam, H: int, W: int,
                         mesh: Mesh | None = None,
                         differentiable: bool = False,
                         backend: str = "lax", tile=(16, 128),
                         interpret: bool = False, time=0.0):
    """Sharded full-frame render -> [H, W, 3], rows sharded over the mesh.

    ``backend='pallas'`` runs the megakernel per shard; with
    ``differentiable=True`` gradients go through the per-chip Pallas
    backward (render_image_pallas_diff inside the shard_map — the same
    composition the sharded training path uses).  On a CPU mesh pass
    ``interpret=True``.
    """
    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    if H % n:
        raise ValueError(f"H={H} not divisible by mesh size {n}")
    Hl = H // n
    if backend == "pallas":
        slab = _local_slab_pallas_diff if differentiable \
            else _local_slab_pallas
        local = partial(slab, static, H, W, Hl, tile, interpret, time)
    else:
        local = partial(_local_slab, static, H, W, Hl, differentiable, time)
    f = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                  out_specs=P("rows"), check_vma=False)
    return f(tables, cam)


render_image_sharded_jit = jax.jit(render_image_sharded,
                                   static_argnums=(0, 3, 4, 5, 6, 7, 8, 9))


def gather_frame(img) -> "jax.Array":
    """Bring a (possibly sharded) frame to host memory (the preview path —
    replaces the reference's SDL2 blit; async double-buffering lives in
    viewer.simulation)."""
    return jax.device_get(img)
