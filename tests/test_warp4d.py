"""config7_warp4d: the 4D x non-Euclidean acceptance scene (VERDICT r2 #8 —
SURVEY §3.4 portals/warp and §3.5 4D instantiation exercised *jointly*).

The scene puts a WarpSpace hypersphere and a 4D portal pair in R^4 with a
w-tilted camera; these tests lock oracle parity, the actual 4D behavior
(w-dependence, warp deflection, portal teleport), Pallas kernel parity and
the warp-strength gradient."""
import numpy as np

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle
from euclider_tpu.oracle.native_oracle import render_native

from conftest import assert_images_close

H, W = 20, 24


def _scene(compiled_scenes):
    return compiled_scenes["config7_warp4d"]


def test_matches_both_oracles(compiled_scenes):
    _, static, tables, cam = _scene(compiled_scenes)
    assert static.dim == 4 and static.has_warp and static.has_portal
    img = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    gold = render_oracle(static, tables, cam, H, W)
    assert_images_close(img, gold, atol=1e-4, max_bad_frac=0.01,
                        msg="warp4d lax-vs-numpy")
    nat = render_native(static, tables, cam, H, W)
    assert_images_close(nat, gold, atol=1e-6, msg="warp4d native-vs-numpy")


def test_warp_and_portal_are_live(compiled_scenes):
    """Zeroing the warp strength and removing the portal must each change
    the image — the 4D feature surface is actually on screen."""
    _, static, tables, cam = _scene(compiled_scenes)
    base = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    t0 = tables._replace(
        mat_warp_strength=np.zeros_like(tables.mat_warp_strength))
    assert np.abs(np.asarray(
        et.render_image_jit(static, t0, cam, H, W)) - base).max() > 1e-2
    # portal translation -> 0 keeps the transition but kills the teleport
    t1 = tables._replace(portal_tr=np.zeros_like(tables.portal_tr),
                         portal_lin=np.broadcast_to(
                             np.eye(4, dtype=np.float32),
                             tables.portal_lin.shape).copy())
    assert np.abs(np.asarray(
        et.render_image_jit(static, t1, cam, H, W)) - base).max() > 1e-2


def test_w_axis_matters(compiled_scenes):
    """Moving the camera along w changes the slice of every 4D object —
    the dimension is real, not padded dead weight."""
    _, static, tables, cam = _scene(compiled_scenes)
    a = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    pos = np.asarray(cam.position).copy()
    pos[3] += 0.6
    b = np.asarray(et.render_image_jit(
        static, tables, cam._replace(position=pos), H, W))
    assert np.abs(a - b).max() > 1e-2


def test_pallas_interpret_matches_lax(compiled_scenes):
    from euclider_tpu.ops.pallas_kernel import render_image_pallas
    _, static, tables, cam = _scene(compiled_scenes)
    a = np.asarray(et.render_image_jit(static, tables, cam, 8, 128))
    b = np.asarray(render_image_pallas(static, tables, cam, 8, 128,
                                       (8, 128), "while", True))
    assert_images_close(a, b, atol=1e-5, msg="pallas-vs-lax warp4d")


def test_warp_strength_gradient_matches_fd():
    """d(image)/d(strength) through a 4D march: per-pixel autodiff (jvp)
    vs oracle central differences on non-silhouette pixels.

    Needs a smooth (C^inf) surface behind the 4D warp region — config7's
    uniform/checker surfaces have zero interior gradient (boundary motion
    only).  The comparison is per-pixel with test_gradients' silhouette
    masking: a strength change also moves refraction-caustic boundaries
    across pixels, so a scene-mean FD is step-size unstable in 4D."""
    from test_gradients import _fd_vs_jvp

    from euclider_tpu.scene import ir

    region = ir.Entity(ir.Sphere((0, 0, -4, 0.1), 1.8),
                       material=ir.WarpSpace(center=(0, 0, -4, 0.1),
                                             strength=0.25, step=0.05),
                       surface=ir.UniformSurface((0, 0, 0, 0.0)))
    wall = ir.Entity(ir.Hyperplane((0, 0, 1, 0.2), -8.0),
                     surface=ir.SmoothSurface(uv_scale=0.5))
    sc = ir.Scene(dim=4, entities=(region, wall),
                  camera=ir.Camera(position=(0, 0, 0, 0),
                                   forward=(0.0, -0.02, -0.999, 0.035),
                                   up=(0, 1, 0, 0), right=(1, 0, 0, 0)),
                  settings=ir.RenderSettings(max_depth=3, march_steps=200,
                                             background=(0.1, 0.1, 0.2)))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    idx = int(np.nonzero(np.asarray(tables.mat_warp_strength))[0][0])

    def set_param(t, c, v):
        import jax.numpy as jnp
        ws = jnp.asarray(t.mat_warp_strength, jnp.float32).at[idx].set(v)
        return t._replace(mat_warp_strength=ws), c

    def get_param(t, c):
        return float(np.asarray(t.mat_warp_strength)[idx])

    _fd_vs_jvp(static, tables, cam, set_param, get_param,
               h=1e-3, tol=0.08, bad_frac=0.05)
