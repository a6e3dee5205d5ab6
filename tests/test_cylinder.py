"""Cylinder primitive: membership, intersections, UV, CSG composition, and
cross-backend agreement (lax / Pallas-interpret / NumPy oracle / C++ oracle).
Dimension-generic: the axis lives in R^4 (SURVEY.md §2.1 shapes, §8.5)."""
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle
from euclider_tpu.scene import ir

from conftest import assert_images_close

H, W = 20, 32


def _cyl_scene():
    """Vertical cylinder + CSG (cylinder bored out of a sphere) + floor."""
    pillar = ir.Entity(ir.Cylinder((1.2, 0.0, -5.0), (0.0, 1.0, 0.0), 0.5),
                       surface=ir.CheckerSurface(uv_scale=3.0),
                       name="pillar")
    bored = ir.Csg("difference", (
        ir.Sphere((-1.2, 0.0, -4.5), 1.0),
        ir.Cylinder((-1.2, 0.0, -4.5), (0.0, 0.0, 1.0), 0.45),
    ))
    ring = ir.Entity(bored, surface=ir.UniformSurface((0.8, 0.5, 0.2, 1.0),
                                                      reflectivity=0.1),
                     name="ring")
    floor = ir.Entity(ir.HalfSpace((0.0, -1.0, 0.0), 1.2),
                      surface=ir.CheckerSurface(uv_scale=0.8), name="floor")
    return ir.Scene(
        dim=3, name="cylinder_test",
        entities=(pillar, ring, floor),
        camera=ir.Camera(position=(0.0, 0.4, 1.0),
                         forward=(0.0, -0.12, -1.0)),
        settings=ir.RenderSettings(max_depth=3, background=(0.05, 0.06, 0.1)))


@pytest.fixture(scope="module")
def compiled():
    sc = _cyl_scene()
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    return sc, static, tables, cam


def test_member_inside_outside(compiled):
    from euclider_tpu.ops import geometry as G
    from euclider_tpu.ops import vec as V
    import jax.numpy as jnp
    _, static, tables, _ = compiled
    tb = tables
    node = static.entities[0].shape
    assert node[0] == "cylinder"

    def q(x, y, z):
        p = V.vec(jnp.float32(x), jnp.float32(y), jnp.float32(z))
        return bool(G.member(node, tb, p))

    assert q(1.2, 0.0, -5.0)          # on the axis
    assert q(1.2, 7.0, -5.0)          # infinite along the axis
    assert q(1.5, -3.0, -5.0)         # within the radius, any height
    assert not q(1.9, 0.0, -5.0)      # outside the radius
    assert not q(0.0, 0.0, -5.0)


def test_lax_matches_numpy_oracle(compiled):
    _, static, tables, cam = compiled
    a = et.render_image_jit(static, tables, cam, H, W)
    b = render_oracle(static, tables, cam, H, W)
    assert_images_close(a, b, atol=1e-4, max_bad_frac=0.01, msg="cyl-lax")


def test_lax_matches_native_oracle(compiled):
    from euclider_tpu.oracle.native_oracle import render_native
    _, static, tables, cam = compiled
    a = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    b = render_native(static, tables, cam, H, W)
    assert_images_close(a, b, atol=1e-4, max_bad_frac=0.01, msg="cyl-native")


def test_pallas_interpret_matches_lax(compiled):
    from euclider_tpu.ops.pallas_kernel import render_image_pallas
    _, static, tables, cam = compiled
    a = np.asarray(et.render_image_jit(static, tables, cam, 16, 128))
    b = np.asarray(render_image_pallas(static, tables, cam, 16, 128,
                                       (8, 128), "while", True))
    assert_images_close(a, b, atol=1e-5, msg="cyl-pallas")


def test_4d_cylinder_slicing():
    """A 4D cylinder with w-axis: visible at any w offset along its axis,
    invisible when displaced perpendicular to it in w."""
    def build(center):
        cyl = ir.Entity(ir.Cylinder(center, (0.0, 0.0, 0.0, 1.0), 0.8),
                        surface=ir.UniformSurface((1, 0, 0, 1)))
        return ir.Scene(
            dim=4, entities=(cyl,),
            camera=ir.Camera(position=(0, 0, 0, 0), forward=(0, 0, -1, 0),
                             up=(0, 1, 0, 0), right=(1, 0, 0, 0)),
            settings=ir.RenderSettings(max_depth=2, background=(0, 0, 0)))

    def render(sc):
        static, tables = et.compile_scene(sc)
        cam = et.compile_camera(sc.camera)
        return np.asarray(et.render_image_jit(static, tables, cam, 16, 24))

    # axis along w: the 3D slice at w=0 sees a sphere-like cross-section
    # regardless of the center's w coordinate
    assert render(build((0, 0, -4, 0))).max() > 0.5
    assert render(build((0, 0, -4, 5.0))).max() > 0.5
    # displaced perpendicular to the axis (x): leaves the view
    assert render(build((9.0, 0, -4, 0))).max() == 0.0


def test_cylinder_json_roundtrip(tmp_path):
    from euclider_tpu.scene import jsonio
    sc = _cyl_scene()
    p = str(tmp_path / "cyl.json")
    jsonio.save_scene(sc, p)
    sc2 = jsonio.load_scene(p)
    assert sc2.entities[0].shape == sc.entities[0].shape
    assert sc2 == sc
