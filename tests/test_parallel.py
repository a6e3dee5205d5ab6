"""Sharded rendering + distributed training step on the 8-device CPU mesh
(SURVEY.md §4.4: multi-host logic without a cluster)."""
import jax
import numpy as np
import optax
import pytest

import euclider_tpu as et
from euclider_tpu.parallel.mesh import (gather_frame, make_mesh,
                                        render_image_sharded)
from euclider_tpu.train.inverse import (InverseParams, make_loss_fn,
                                        make_train_step, shard_target)

from conftest import assert_images_close


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def _f32(t):
    import jax.numpy as jnp
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), t)


def test_sharded_render_matches_single(compiled_scenes, mesh):
    _, static, tables, cam = compiled_scenes["config2_mirror_glass"]
    H, W = 32, 64
    a = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    b = np.asarray(render_image_sharded(static, tables, cam, H, W, mesh))
    assert_images_close(a, b, atol=1e-5, msg="sharded-vs-single")
    # output really is sharded over rows
    img = render_image_sharded(static, tables, cam, H, W, mesh)
    assert len(img.sharding.device_set) == 8


@pytest.mark.parametrize("name", ["config2_mirror_glass",
                                  "config5_warp_portal"])
def test_sharded_pallas_matches_single(compiled_scenes, mesh, name):
    """Megakernel × mesh composition (SURVEY §2.2 DP row + §7 step 4): the
    rows-sharded render with backend='pallas' runs one Pallas launch per
    device over its row slab (y0-offset ray generation) and must equal the
    single-device lax render — including slabs smaller than a tile (Hl=4
    rows here) and the march+portal code paths."""
    _, static, tables, cam = compiled_scenes[name]
    H, W = 32, 64
    a = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    b = np.asarray(render_image_sharded(static, tables, cam, H, W, mesh,
                                        False, "pallas", (8, 128), True))
    assert_images_close(a, b, atol=1e-5, msg=f"sharded-pallas {name}")
    img = render_image_sharded(static, tables, cam, H, W, mesh,
                               False, "pallas", (8, 128), True)
    assert len(img.sharding.device_set) == 8


def test_sharded_render_uneven_rejected(compiled_scenes, mesh):
    _, static, tables, cam = compiled_scenes["config1_sphere_room"]
    with pytest.raises(ValueError, match="not divisible"):
        render_image_sharded(static, tables, cam, 30, 64, mesh)


def test_gather_frame(compiled_scenes, mesh):
    _, static, tables, cam = compiled_scenes["config1_sphere_room"]
    img = render_image_sharded(static, tables, cam, 16, 32, mesh)
    host = gather_frame(img)
    assert isinstance(np.asarray(host), np.ndarray)


def test_train_step_converges(compiled_scenes, mesh):
    """Inverse rendering sanity: recover a perturbed sphere color."""
    _, static, tables, cam = compiled_scenes["grad_probe"]
    tables = _f32(tables)
    H, W = 16, 32

    target = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    target_sharded = shard_target(target, mesh)

    # perturb the surface colors, then optimize ONLY the colors back
    # (optimizing every parameter incl. geometry/camera from a color-only
    # perturbation is ill-posed at test scale)
    import jax.numpy as jnp
    loss_fn = make_loss_fn(static, H, W, mesh)

    def color_loss(cols, target):
        t = tables._replace(surf_color=cols[0], surf_color2=cols[1])
        return loss_fn(InverseParams(t, cam), target)

    cols = (jnp.asarray(tables.surf_color).at[:, :3].add(0.2),
            jnp.asarray(tables.surf_color2).at[:, :3].add(-0.15))
    opt = optax.adam(3e-2)
    opt_state = opt.init(cols)

    @jax.jit
    def step(cols, opt_state, target):
        l, g = jax.value_and_grad(color_loss)(cols, target)
        updates, opt_state = opt.update(g, opt_state, cols)
        return optax.apply_updates(cols, updates), opt_state, l

    l0 = float(color_loss(cols, target_sharded))
    for _ in range(40):
        cols, opt_state, loss = step(cols, opt_state, target_sharded)
    l1 = float(loss)
    assert l1 < l0 * 0.2, (l0, l1)


def test_sharded_pallas_training_matches_lax(mesh):
    """Multi-chip training through the megakernels: make_loss_fn
    backend='pallas' runs the Pallas forward AND the Pallas backward kernel
    per shard (custom_vjp inside shard_map, y0-offset slabs); loss and
    psum-reduced parameter grads must match the sharded lax path.

    Depth 2 keeps the interpret-mode compile of the unrolled backward
    transpose cheap (depth 3 at 720p is covered on real hardware by
    tools/tpu_bwd_probe.py)."""
    from dataclasses import replace

    import jax.numpy as jnp

    sc = et.get_scene("grad_probe")
    sc = replace(sc, settings=replace(sc.settings, max_depth=2))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tables = _f32(tables)
    H, W = 16, 32

    loss_lax = make_loss_fn(static, H, W, mesh)
    loss_pal = make_loss_fn(static, H, W, mesh, "pallas", (8, 128), True)
    params = InverseParams(tables, cam)
    target = shard_target(np.zeros((H, W, 3), np.float32), mesh)

    ll, gl = jax.value_and_grad(lambda p: loss_lax(p, target))(params)
    lp, gp = jax.value_and_grad(lambda p: loss_pal(p, target))(params)
    assert np.isclose(float(ll), float(lp), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gp)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        tol = 1e-3 * max(np.abs(a).max(), 1.0) if a.size else 0.0
        assert np.abs(a - b).max() <= tol, np.abs(a - b).max()


def test_sharded_fused_train_matches_lax(mesh):
    """The fused per-chip training kernel composes with the mesh: each
    shard's single-kernel loss/grads psum to the global loss and the same
    replicated grads as the sharded lax value_and_grad.

    Depth 1 (the peel-only fused path) keeps the 8-way interpret compile
    tractable — XLA:CPU takes an hour on the depth-2 kernel under
    shard_map; the deep and marchy fused paths are covered single-device
    by test_gradients.test_fused_train_step_matches_value_and_grad."""
    from dataclasses import replace

    import jax.numpy as jnp
    from euclider_tpu.train.inverse import make_fused_value_and_grad

    sc = et.get_scene("grad_probe")
    sc = replace(sc, settings=replace(sc.settings, max_depth=1))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tables = _f32(tables)
    H, W = 16, 32

    target = np.random.default_rng(2).uniform(size=(H, W, 3)).astype(
        np.float32)
    target_sharded = shard_target(target, mesh)
    params = InverseParams(tables, cam)

    loss_lax = make_loss_fn(static, H, W, mesh)
    ll, gl = jax.value_and_grad(
        lambda p: loss_lax(p, target_sharded))(params)

    vg = make_fused_value_and_grad(static, H, W, mesh, (8, 128), True)
    lf, gf = vg(params, target_sharded)

    assert np.isclose(float(ll), float(lf), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gf)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        tol = 1e-3 * max(np.abs(a).max(), 1.0) if a.size else 0.0
        assert np.abs(a - b).max() <= tol


def test_sharded_fused_train_marchy_2dev(mesh):
    """The fused training kernel × mesh composition at REAL scene
    complexity (VERDICT r4 item 3: depth reductions were the only
    multi-device fused coverage): config5's march+portal+alpha paths at
    depth 2 / 23 march steps, sharded over a 2-device sub-mesh.  XLA:CPU
    interpret-mode compile cost scales with device count, so 2 devices
    buys the marchy kernel in CI time where the 8-way compile took an
    hour; shard_map semantics (slab offsets, psum of loss and grads) are
    device-count-independent and the 8-way composition is covered at
    depth 1 by test_sharded_fused_train_matches_lax."""
    from dataclasses import replace

    from euclider_tpu.parallel.mesh import make_mesh
    from euclider_tpu.train.inverse import make_fused_value_and_grad

    mesh2 = make_mesh(2)
    sc = et.get_scene("config5_warp_portal")
    sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                      march_steps=23))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tables = _f32(tables)
    H, W = 16, 32

    target = np.random.default_rng(3).uniform(size=(H, W, 3)).astype(
        np.float32)
    target_sharded = shard_target(target, mesh2)
    params = InverseParams(tables, cam)

    loss_lax = make_loss_fn(static, H, W, mesh2)
    ll, gl = jax.value_and_grad(
        lambda p: loss_lax(p, target_sharded))(params)

    vg = make_fused_value_and_grad(static, H, W, mesh2, (8, 128), True)
    lf, gf = vg(params, target_sharded)

    assert np.isclose(float(ll), float(lf), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gf)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        tol = 1e-3 * max(np.abs(a).max(), 1.0) if a.size else 0.0
        assert np.abs(a - b).max() <= tol


def test_sharded_pallas_diff_render(mesh):
    """render_image_sharded(differentiable=True, backend='pallas') must no
    longer raise (VERDICT r3 item 5): it routes to render_image_pallas_diff
    per shard, matches the lax forward, and its gradients match the sharded
    differentiable lax path."""
    from dataclasses import replace

    import jax.numpy as jnp

    sc = et.get_scene("grad_probe")
    sc = replace(sc, settings=replace(sc.settings, max_depth=2))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tables = _f32(tables)
    H, W = 16, 32

    def mean_pal(t):
        img = render_image_sharded(static, t, cam, H, W, mesh, True,
                                   "pallas", (8, 128), True)
        return jnp.mean(img * img)

    def mean_lax(t):
        img = render_image_sharded(static, t, cam, H, W, mesh, True)
        return jnp.mean(img * img)

    vp, gp = jax.value_and_grad(mean_pal)(tables)
    vl, gl = jax.value_and_grad(mean_lax)(tables)
    assert np.isclose(float(vp), float(vl), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gp)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        tol = 1e-3 * max(np.abs(a).max(), 1.0) if a.size else 0.0
        assert np.abs(a - b).max() <= tol


def test_animated_scene_sharded_train(mesh):
    """Scene time threads through the sharded loss (VERDICT r3 weak item 3):
    an ExprSpace field depending on `t` produces different losses at
    different times, and the train step accepts a time argument."""
    import jax.numpy as jnp
    import optax
    from euclider_tpu.scene.ir import (Camera, Entity, ExprSpace, HalfSpace,
                                       RenderSettings, Scene, SmoothSurface,
                                       Sphere, UniformSurface)

    wobble = ExprSpace(ax="p0 * sin(3.0 * t + z)", ay="0", az="0", aw="0",
                       step=0.15, params=(0.8,))
    sc = Scene(
        dim=3,
        name="animated_probe",
        entities=(
            Entity(Sphere((0.0, 0.0, -4.0), 1.4), material=wobble,
                   surface=UniformSurface((0.0, 0.0, 0.0, 0.0)),
                   name="wobble_region"),
            # smooth (C^inf in the hit position) surfaces: a uniform color
            # would make d(loss)/d(time) identically zero at interior pixels
            Entity(Sphere((0.0, 0.0, -7.0), 1.0),
                   surface=SmoothSurface(uv_scale=2.0),
                   name="backdrop"),
            Entity(HalfSpace((0.0, -1.0, 0.0), 1.2),
                   surface=SmoothSurface(uv_scale=0.5),
                   name="floor"),
        ),
        camera=Camera(position=(0.0, 0.3, 1.0, 0.0),
                      forward=(0.0, -0.1, -0.99, 0.0),
                      up=(0.0, 1.0, 0.0, 0.0), right=(1.0, 0.0, 0.0, 0.0),
                      fov_deg=60.0),
        # depth 3: the ray must enter the wobble region (1), march through
        # it (2), and continue to the backdrop (3) for `t` to move a color
        settings=RenderSettings(max_depth=3, march_steps=32,
                                background=(0.05, 0.05, 0.08)),
    )
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tables = _f32(tables)
    H, W = 16, 32

    loss_fn = make_loss_fn(static, H, W, mesh)
    params = InverseParams(tables, cam)
    target = shard_target(np.zeros((H, W, 3), np.float32), mesh)

    l0 = float(loss_fn(params, target, 0.0))
    l1 = float(loss_fn(params, target, 0.9))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert abs(l0 - l1) > 1e-6, "time had no effect on the animated scene"

    # time itself is differentiable through the sharded loss
    gt = float(jax.grad(lambda tm: loss_fn(params, target, tm))(
        jnp.float32(0.4)))
    assert np.isfinite(gt) and gt != 0.0

    # and the train step takes time
    step, opt_state = make_train_step(static, H, W, mesh, optax.adam(1e-2),
                                      params)
    params2, _, l = step(params, opt_state, target, 0.9)
    assert np.isfinite(float(l))
    assert np.isclose(float(l), l1, rtol=1e-5)


def test_grads_replicated_after_psum(compiled_scenes, mesh):
    """Parameter grads must come out identical (replicated) on every device."""
    _, static, tables, cam = compiled_scenes["grad_probe"]
    tables = _f32(tables)
    H, W = 16, 32
    loss_fn = make_loss_fn(static, H, W, mesh)
    target = shard_target(np.zeros((H, W, 3), np.float32), mesh)
    g = jax.grad(lambda p: loss_fn(p, target))(InverseParams(tables, cam))
    gc = np.asarray(g.tables.surf_color)
    assert np.isfinite(gc).all()
    assert np.abs(gc).sum() > 0
