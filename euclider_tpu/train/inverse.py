"""Inverse rendering: fit scene/camera parameters to target images.

The 'training' counterpart mandated by the north star (BASELINE.json:5):
rays/tiles sharded across the mesh, parameter gradients all-reduced with
psum as part of the backward pass (the transpose of the replicated-in /
pmean-out shard_map automatically inserts the psum, which XLA overlaps with
the remaining backward computation).

Typical use:
    params = InverseParams(tables, cam)
    step, opt_state = make_train_step(static, H, W, mesh, optax.adam(1e-2),
                                      params)
    params, opt_state, loss = step(params, opt_state, target_image)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import trace as T
from ..parallel.mesh import shard_map


class InverseParams(NamedTuple):
    tables: object   # SceneTables
    cam: object      # CameraParams


def _local_loss(static, H, W, Hl, tables, cam, time, target_slab):
    row0 = jax.lax.axis_index("rows") * Hl
    yi = (row0.astype(jnp.float32)
          + jax.lax.broadcasted_iota(jnp.float32, (Hl, W), 0))
    xi = jax.lax.broadcasted_iota(jnp.float32, (Hl, W), 1)
    org, d = T.camera_rays(cam, xi, yi, W, H)
    r, g, b = T.trace_batch(static, tables, org, d, differentiable=True,
                            time=time)
    img = jnp.stack([r, g, b], axis=-1)
    l = jnp.mean((img - target_slab) ** 2)
    return jax.lax.pmean(l, "rows")


def _local_loss_pallas(static, H, W, Hl, tile, interpret, tables, cam,
                       time, target_slab):
    """Per-shard loss through the differentiable Pallas path: megakernel
    forward AND Pallas backward kernel per chip (custom_vjp inside the
    shard_map; the grads' psum still rides the shard_map transpose)."""
    from ..ops.pallas_kernel import render_image_pallas_diff

    row0 = jax.lax.axis_index("rows") * Hl
    img = render_image_pallas_diff(static, tables, cam, H, W, time, "auto",
                                   tile, interpret,
                                   row0.astype(jnp.float32), Hl)
    l = jnp.mean((img - target_slab) ** 2)
    return jax.lax.pmean(l, "rows")


def make_loss_fn(static, H: int, W: int, mesh: Mesh,
                 backend: str = "lax", tile=(16, 128),
                 interpret: bool = False):
    """Sharded MSE loss vs a rows-sharded target.

    backend='pallas' runs both the forward render and the backward pass
    through the Pallas kernels on every chip (interpret=True on CPU
    meshes); 'lax' is the whole-XLA path.

    The returned loss takes an optional scene ``time`` (the reference's
    ``trace(time, ...)`` argument, SURVEY.md §3.3): animated ExprSpace
    scenes can be inverse-rendered per frame, and time itself receives a
    gradient through both backends."""
    n = mesh.devices.size
    if H % n:
        raise ValueError(f"H={H} not divisible by mesh size {n}")
    Hl = H // n
    if backend == "pallas":
        local = partial(_local_loss_pallas, static, H, W, Hl, tile,
                        interpret)
    else:
        local = partial(_local_loss, static, H, W, Hl)
    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(), P(), P("rows")),
                        out_specs=P(), check_vma=False)

    def loss(params: InverseParams, target, time=0.0):
        return sharded(params.tables, params.cam,
                       jnp.asarray(time, jnp.float32), target)

    return loss


def make_fused_value_and_grad(static, H: int, W: int, mesh: Mesh,
                              tile=None, interpret: bool = False):
    """Sharded MSE loss AND gradients through the FUSED training kernel
    (ops/pallas_vjp.train_step_pallas): each chip runs ONE Pallas kernel
    that renders its slab, computes the loss contribution and cotangent
    in-register, and transposes — the per-shard partial losses and grads
    are then psum-reduced over the mesh.  Numerically the same step as
    jax.value_and_grad(make_loss_fn(...)) for the MSE loss, minus one
    whole render kernel per step."""
    from ..ops.pallas_vjp import train_step_pallas

    n = mesh.devices.size
    if H % n:
        raise ValueError(f"H={H} not divisible by mesh size {n}")
    Hl = H // n

    def local(tables, cam, time, target_slab):
        row0 = jax.lax.axis_index("rows") * Hl
        loss, gt, gc, gtm = train_step_pallas(
            static, tables, cam, target_slab, H, W, time, tile,
            row0.astype(jnp.float32), Hl, 1.0 / (H * W * 3), interpret)
        return jax.tree.map(lambda x: jax.lax.psum(x, "rows"),
                            (loss, gt, gc, gtm))

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(), P(), P("rows")),
                        out_specs=(P(), P(), P(), P()), check_vma=False)

    def value_and_grad(params: InverseParams, target, time=0.0):
        loss, gt, gc, _ = sharded(params.tables, params.cam,
                                  jnp.asarray(time, jnp.float32), target)
        return loss, InverseParams(gt, gc)

    return value_and_grad


def make_train_step(static, H: int, W: int, mesh: Mesh, optimizer,
                    params: InverseParams, backend: str = "lax",
                    tile=(16, 128), interpret: bool = False):
    """Returns (jitted step fn, initial optimizer state).

    step(params, opt_state, target, time=0.0) -> (params, opt_state, loss).
    Gradients of the replicated params are psum-reduced over the mesh inside
    the backward pass.  backend='pallas' runs forward AND backward through
    the Pallas kernels on each chip (see make_loss_fn);
    backend='pallas-fused' runs the whole step — render, loss, cotangent,
    transpose — as ONE kernel per chip (make_fused_value_and_grad).
    """
    if backend == "pallas-fused":
        vg = make_fused_value_and_grad(
            static, H, W, mesh, None if tile == (16, 128) else tile,
            interpret)
    else:
        loss_fn = make_loss_fn(static, H, W, mesh, backend, tile, interpret)
        vg = jax.value_and_grad(loss_fn)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, target, time=0.0):
        l, g = vg(params, target, time)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return step, opt_state


def shard_target(target, mesh: Mesh):
    """Place a host target image with rows sharded over the mesh."""
    return jax.device_put(target, NamedSharding(mesh, P("rows")))
