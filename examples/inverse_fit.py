"""Inverse rendering demo: recover scene parameters from a target image.

Renders a ground-truth frame of the grad_probe scene, perturbs the sphere
position + colors, then gradient-descends back using the sharded training
step (rows-sharded rays, psum-reduced parameter grads).

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/inverse_fit.py
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import euclider_tpu as et
    from euclider_tpu.parallel.mesh import make_mesh
    from euclider_tpu.train.inverse import (InverseParams, make_loss_fn,
                                            shard_target)
    from euclider_tpu.utils import checkpointing

    sc = et.get_scene("grad_probe")
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tables = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32)
                          if hasattr(x, "dtype") else x, tables)

    n_dev = max(1, len(jax.devices()))
    mesh = make_mesh(n_dev)
    H, W = 8 * n_dev * 2, 64
    print(f"mesh: {n_dev} devices; image {W}x{H}")

    target = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    target_s = shard_target(target, mesh)

    # perturb: move the first sphere and tint the surfaces
    perturbed = tables._replace(
        shape_vec=tables.shape_vec.at[0, 0].add(0.35).at[0, 2].add(-0.3),
        surf_color=tables.surf_color.at[:, :3].add(0.15))
    params = InverseParams(perturbed, cam)

    loss_fn = make_loss_fn(static, H, W, mesh)
    # optimize geometry + colors (leave camera fixed): mask the updates
    label = InverseParams(
        tables=type(tables)(*["opt" if f in ("shape_vec", "surf_color")
                              else "frozen" for f in tables._fields]),
        cam="frozen")
    opt = optax.multi_transform(
        {"opt": optax.adam(2e-2), "frozen": optax.set_to_zero()}, label)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, target):
        l, g = jax.value_and_grad(loss_fn)(params, target)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    err0 = float(jnp.abs(params.tables.shape_vec[0] -
                         tables.shape_vec[0]).max())
    for i in range(120):
        params, opt_state, loss = step(params, opt_state, target_s)
        if i % 20 == 0:
            print(f"step {i:4d}  loss {float(loss):.6f}")
    err1 = float(jnp.abs(params.tables.shape_vec[0] -
                         tables.shape_vec[0]).max())
    print(f"sphere-position error: {err0:.3f} -> {err1:.3f}")

    checkpointing.save("/tmp/inverse_fit_ckpt", params)
    print("checkpoint saved to /tmp/inverse_fit_ckpt")
    return err1 < err0 * 0.5


if __name__ == "__main__":
    ok = main()
    print("RECOVERED" if ok else "DID NOT CONVERGE")
    raise SystemExit(0 if ok else 1)
