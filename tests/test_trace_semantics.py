"""Semantic tests of the trace engine: backends agree, physics behaves.

The oracle-parity test is the central correctness gate (SURVEY.md §4.1-4.2):
the batched DFS-stack TPU renderer must reproduce the scalar recursive
oracle on every acceptance config."""
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle
from euclider_tpu.scene import ir

from conftest import assert_images_close

RES = (20, 32)


@pytest.mark.parametrize("name", et.ACCEPTANCE + ("grad_probe",
                                                   "fresnel_probe"))
def test_lax_matches_oracle(name, compiled_scenes):
    _, static, tables, cam = compiled_scenes[name]
    H, W = RES
    a = et.render_image_jit(static, tables, cam, H, W)
    b = render_oracle(static, tables, cam, H, W)
    # float32 vs float64 scalar recursion: expect ~1e-7; allow margin, and
    # a couple of decision-boundary pixels at most
    assert_images_close(a, b, atol=1e-4, max_bad_frac=0.01, msg=name)


@pytest.mark.parametrize("name", ["config2_mirror_glass", "config5_warp_portal"])
def test_differentiable_path_equals_while_path(name, compiled_scenes):
    _, static, tables, cam = compiled_scenes[name]
    H, W = RES
    a = et.render_image_jit(static, tables, cam, H, W, False)
    b = et.render_image_jit(static, tables, cam, H, W, True)
    assert_images_close(a, b, atol=1e-6, msg=name)


def _render_scene(sc, H=16, W=24):
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    return np.asarray(et.render_image_jit(static, tables, cam, H, W))


def test_background_only():
    sc = ir.Scene(dim=3, entities=(),
                  settings=ir.RenderSettings(background=(0.2, 0.3, 0.4)))
    img = _render_scene(sc)
    assert np.allclose(img, [0.2, 0.3, 0.4], atol=1e-6)


def test_depth1_no_secondary():
    """max_depth=1: a perfect mirror contributes nothing (child depth 0)."""
    mirror = ir.Entity(ir.Sphere((0, 0, -3), 1.0),
                       surface=ir.UniformSurface((1, 1, 1, 1.0),
                                                 reflectivity=1.0))
    sc = ir.Scene(dim=3, entities=(mirror,),
                  settings=ir.RenderSettings(max_depth=1,
                                             background=(0.5, 0.0, 0.0)))
    img = _render_scene(sc)
    center = img[8, 12]
    # reflectivity 1 -> local term 0; no recursion at depth 1 -> black
    assert np.allclose(center, 0.0, atol=1e-6)


def test_mirror_sees_background():
    """depth 2 mirror reflects the background color."""
    mirror = ir.Entity(ir.Sphere((0, 0, -3), 1.0),
                       surface=ir.UniformSurface((1, 1, 1, 1.0),
                                                 reflectivity=1.0))
    sc = ir.Scene(dim=3, entities=(mirror,),
                  settings=ir.RenderSettings(max_depth=2,
                                             background=(0.5, 0.25, 0.125)))
    img = _render_scene(sc)
    assert np.allclose(img[8, 12], [0.5, 0.25, 0.125], atol=1e-5)


def test_translucent_sheet_blends():
    """alpha-blending through a translucent hyperplane sheet over background."""
    sheet = ir.Entity(ir.Hyperplane((0, 0, 1), -2.0),
                      surface=ir.UniformSurface((1.0, 0.0, 0.0, 0.25)))
    sc = ir.Scene(dim=3, entities=(sheet,),
                  settings=ir.RenderSettings(max_depth=3,
                                             background=(0.0, 1.0, 0.0)))
    img = _render_scene(sc)
    # 0.25*red + 0.75*green
    assert np.allclose(img[8, 12], [0.25, 0.75, 0.0], atol=1e-5)


def test_portal_teleports_view():
    """A camera looking into a portal sees what sits at the target."""
    portal = ir.Entity(ir.Sphere((0, 0, -3), 1.0),
                       surface=ir.UniformSurface((0, 0, 0, 0.0)),
                       portal=ir.Portal(translation=(10.0, 0.0, 0.0)))
    marker = ir.Entity(ir.Sphere((10.0, 0.0, -6.0), 1.0),
                       surface=ir.UniformSurface((0.0, 0.3, 0.9, 1.0)))
    sc = ir.Scene(dim=3, entities=(portal, marker),
                  settings=ir.RenderSettings(max_depth=4,
                                             background=(1.0, 1.0, 0.0)))
    img = _render_scene(sc)
    assert np.allclose(img[8, 12], [0.0, 0.3, 0.9], atol=1e-5)


def test_warp_zero_strength_is_straight():
    """WarpSpace with strength 0 must render like vacuum (march == analytic)."""
    def build(mat):
        region = ir.Entity(ir.Sphere((0, 0, -4), 2.0), material=mat,
                           surface=ir.UniformSurface((0, 0, 0, 0.0)))
        target = ir.Entity(ir.Sphere((0, 0, -4), 0.8),
                           surface=ir.UniformSurface((0.9, 0.4, 0.1, 1.0)))
        floor = ir.Entity(ir.HalfSpace((0, -1, 0), 1.5),
                          surface=ir.CheckerSurface())
        return ir.Scene(dim=3, entities=(region, target, floor),
                        settings=ir.RenderSettings(
                            max_depth=3, march_steps=600,
                            background=(0.1, 0.1, 0.2)))
    img_warp = _render_scene(build(ir.WarpSpace(strength=0.0, step=0.02)))
    img_vac = _render_scene(build(ir.Vacuum()))
    # marched straight lines vs analytic: small step error at silhouettes
    assert_images_close(img_warp, img_vac, atol=0.02, max_bad_frac=0.06,
                        msg="warp0-vs-vacuum")


def test_warp_bends_rays():
    """Nonzero warp strength must change the image (lensing)."""
    def build(s):
        region = ir.Entity(ir.Sphere((0, 0, -4), 1.8),
                           material=ir.WarpSpace(center=(0, 0, -4),
                                                 strength=s, step=0.04),
                           surface=ir.UniformSurface((0, 0, 0, 0.0)))
        floor = ir.Entity(ir.HalfSpace((0, -1, 0), 1.5),
                          surface=ir.CheckerSurface())
        return ir.Scene(dim=3, entities=(region, floor),
                        settings=ir.RenderSettings(max_depth=3,
                                                   background=(0.1, 0.1, 0.2)))
    a = _render_scene(build(0.0))
    b = _render_scene(build(0.6))
    assert np.abs(a - b).max() > 0.1


def test_4d_slicing():
    """An object displaced in w is invisible to a w-aligned 3D camera slice."""
    def build(w):
        return ir.Scene(
            dim=4,
            entities=(ir.Entity(ir.Sphere((0, 0, -4, w), 1.0),
                                surface=ir.UniformSurface((1, 0, 0, 1))),),
            camera=ir.Camera(position=(0, 0, 0, 0), forward=(0, 0, -1, 0),
                             up=(0, 1, 0, 0), right=(1, 0, 0, 0)),
            settings=ir.RenderSettings(max_depth=2, background=(0, 0, 0)))
    visible = _render_scene(build(0.0))
    hidden = _render_scene(build(2.0))
    assert visible.max() > 0.5          # sphere seen
    assert np.allclose(hidden, 0.0)     # sphere fully outside the w-slice


def test_fresnel_head_on_vs_grazing():
    """Schlick ratio: ~0 head-on (cos_i=1) and ->1 at grazing incidence.

    A fresnel-only sphere (rho=0, fresnel=1) over a red background: the
    center pixel keeps the surface color; the silhouette-adjacent pixels
    are dominated by reflected background."""
    ball = ir.Entity(ir.Sphere((0, 0, -3), 1.0),
                     surface=ir.UniformSurface((0.0, 1.0, 0.0, 1.0),
                                               reflectivity=0.0, fresnel=1.0))
    sc = ir.Scene(dim=3, entities=(ball,),
                  settings=ir.RenderSettings(max_depth=2,
                                             background=(1.0, 0.0, 0.0)))
    img = _render_scene(sc, 64, 96)
    center = img[32, 48]
    assert center[1] > 0.95 and center[0] < 0.05, center  # green, no fresnel
    # scan the horizontal center row for the sphere edge: last hit column
    row = img[32]
    hit = np.where(row[:, 1] + row[:, 0] * 0 > 0.0)[0]
    # a grazing pixel: strongly red (reflected background)
    grazing = row[np.where(row[:, 0] > 0.5)[0]]
    assert len(grazing) > 0, "no grazing-angle fresnel reflection found"


def test_fresnel_zero_matches_plain():
    """fresnel=0 must reproduce the constant-ratio image bit-for-bit."""
    def build(f):
        ball = ir.Entity(ir.Sphere((0, 0, -3), 1.0),
                         surface=ir.UniformSurface((0.2, 0.7, 0.3, 1.0),
                                                   reflectivity=0.3,
                                                   fresnel=f))
        return ir.Scene(dim=3, entities=(ball,),
                        settings=ir.RenderSettings(max_depth=3,
                                                   background=(0.3, 0.2, 0.6)))
    a = _render_scene(build(0.0))
    b = _render_scene(build(1e-12))  # forces the fresnel code path
    assert np.abs(a - b).max() < 1e-6


def test_nested_materials_ior():
    """Entering glass bends rays; scene order resolves containment."""
    glass = ir.Entity(ir.Sphere((0, 0, -3), 1.0), material=ir.Dielectric(1.5),
                      surface=ir.UniformSurface((1, 1, 1, 0.0)))
    wall = ir.Entity(ir.Hyperplane((0, 0, 1), -8.0),
                     surface=ir.CheckerSurface(uv_scale=0.5))
    sc = ir.Scene(dim=3, entities=(glass, wall),
                  settings=ir.RenderSettings(max_depth=6,
                                             background=(0, 0, 0)))
    img = _render_scene(sc, 32, 48)
    no_glass = ir.Scene(dim=3, entities=(wall,),
                        settings=ir.RenderSettings(max_depth=6,
                                                   background=(0, 0, 0)))
    img2 = _render_scene(no_glass, 32, 48)
    # refraction must visibly distort the checker wall behind the sphere
    assert np.abs(img - img2).max() > 0.3
