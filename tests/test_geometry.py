"""Unit tests for intersections, membership, CSG candidate logic.

Mirrors the reference's per-primitive intersector math (SURVEY.md §4.3:
per-primitive intersection, CSG interval logic, UV mapping)."""
import jax.numpy as jnp
import numpy as np

import euclider_tpu as et
from euclider_tpu.ops import geometry as G
from euclider_tpu.ops import vec as V
from euclider_tpu.scene import ir


def compile_shape(shape):
    sc = ir.Scene(dim=3, entities=(ir.Entity(shape),))
    static, tables = et.compile_scene(sc)
    return static.entities[0].shape, tables


def _ray(o, d):
    dd = np.asarray(d, np.float64)
    dd = dd / np.linalg.norm(dd)
    return V.from_array(jnp.asarray(o, jnp.float32)), \
        V.from_array(jnp.asarray(dd, jnp.float32))


def test_sphere_hit_distance():
    node, tables = compile_shape(ir.Sphere((0, 0, -5), 1.0))
    org, d = _ray([0, 0, 0], [0, 0, -1])
    t, hit, n, u, v = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert bool(hit)
    assert np.isclose(float(t), 4.0, atol=1e-5)
    assert np.allclose(V.to_array(n), [0, 0, 1, 0], atol=1e-5)


def test_sphere_miss():
    node, tables = compile_shape(ir.Sphere((0, 0, -5), 1.0))
    org, d = _ray([0, 3, 0], [0, 0, -1])
    _, hit, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert not bool(hit)


def test_sphere_inside_exit():
    node, tables = compile_shape(ir.Sphere((0, 0, 0), 2.0))
    org, d = _ray([0, 0, 0], [1, 0, 0])
    t, hit, n, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert bool(hit)
    assert np.isclose(float(t), 2.0, atol=1e-5)


def test_plane_hit():
    node, tables = compile_shape(ir.Hyperplane((0, 1, 0), -1.0))
    org, d = _ray([0, 0, 0], [0, -1, 0])
    t, hit, n, u, v = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert bool(hit)
    assert np.isclose(float(t), 1.0, atol=1e-5)


def test_plane_parallel_miss():
    node, tables = compile_shape(ir.Hyperplane((0, 1, 0), -1.0))
    org, d = _ray([0, 0, 0], [1, 0, 0])
    _, hit, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert not bool(hit)


def test_membership_primitives():
    node, tables = compile_shape(ir.Sphere((0, 0, 0), 1.0))
    inside = G.member(node, tables, V.from_array(jnp.asarray([0.5, 0, 0, 0])))
    outside = G.member(node, tables, V.from_array(jnp.asarray([1.5, 0, 0, 0])))
    assert bool(inside) and not bool(outside)

    node, tables = compile_shape(ir.HalfSpace((0, 1, 0), 0.0))
    below = G.member(node, tables, V.from_array(jnp.asarray([0, -1.0, 0, 0])))
    above = G.member(node, tables, V.from_array(jnp.asarray([0, 1.0, 0, 0])))
    assert bool(below) and not bool(above)


def test_csg_membership_algebra():
    a = ir.Sphere((0, 0, 0), 1.0)
    b = ir.Sphere((1.0, 0, 0), 1.0)
    cases = {
        "union": {(0.5, 0, 0): True, (1.7, 0, 0): True, (3.0, 0, 0): False},
        "intersection": {(0.5, 0, 0): True, (-0.5, 0, 0): False,
                         (1.5, 0, 0): False},
        "difference": {(-0.5, 0, 0): True, (0.5, 0, 0): False,
                       (1.5, 0, 0): False},
        "symdiff": {(-0.5, 0, 0): True, (0.5, 0, 0): False,
                    (1.5, 0, 0): True},
    }
    for op, pts in cases.items():
        node, tables = compile_shape(ir.Csg(op, (a, b)))
        for p, expect in pts.items():
            got = bool(G.member(node, tables, V.from_array(jnp.asarray(p + (0.0,)))))
            assert got == expect, f"{op} at {p}: {got} != {expect}"
    node, tables = compile_shape(ir.Csg("complement", (a,)))
    assert bool(G.member(node, tables, V.from_array(jnp.asarray([5., 0, 0, 0]))))
    assert not bool(G.member(node, tables, V.from_array(jnp.asarray([0., 0, 0, 0]))))


def test_csg_difference_shell_hit():
    """Ray into (big minus small) concentric spheres must hit the OUTER
    boundary going in, and the hole's INNER wall through the cavity."""
    shell = ir.Csg("difference", (ir.Sphere((0, 0, 0), 2.0),
                                  ir.Sphere((0, 0, 0), 1.0)))
    node, tables = compile_shape(shell)
    # from outside: first crossing at t=3 (outer surface)
    org, d = _ray([0, 0, 5], [0, 0, -1])
    t, hit, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert bool(hit) and np.isclose(float(t), 3.0, atol=1e-4)
    # from the cavity center: first crossing at t=1 (inner wall)
    org, d = _ray([0, 0, 0], [0, 0, -1])
    t, hit, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert bool(hit) and np.isclose(float(t), 1.0, atol=1e-4)


def test_csg_intersection_cut():
    """Sphere cut by halfspace: a ray aimed at the removed cap must pass
    through and hit the flat cut face."""
    cut = ir.Csg("intersection", (ir.Sphere((0, 0, 0), 1.0),
                                  ir.HalfSpace((0, 1, 0), 0.0)))  # keep y<0
    node, tables = compile_shape(cut)
    org, d = _ray([0, 0.5, 5], [0, 0, -1])  # passes above the kept half
    _, hit, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert not bool(hit)
    org, d = _ray([0, 2.0, 0.3], [0, -1, 0])  # straight down onto cut plane
    t, hit, n, *_ = G.entity_hit_straight(node, tables, org, d, 3, 100.0)
    assert bool(hit) and np.isclose(float(t), 2.0, atol=1e-4)
    assert np.allclose(V.to_array(n)[:3], [0, 1, 0], atol=1e-5)


def test_uv_sphere_poles_and_seam():
    node, tables = compile_shape(ir.Sphere((0, 0, 0), 1.0))
    u, v = G.leaf_uv(node, tables, V.from_array(jnp.asarray([0., 0, 1, 0])), 3)
    # +z pole: v=0 up to the contract's 1e-6 acos clip margin
    assert np.isclose(float(v), 0.0, atol=1e-3)
    u, v = G.leaf_uv(node, tables, V.from_array(jnp.asarray([1., 0, 0, 0])), 3)
    assert np.isclose(float(u), 0.5, atol=1e-6)
    assert np.isclose(float(v), 0.5, atol=1e-6)


def test_plane_tangent_frame_orthonormal():
    for nvec, dim in [((0, 1, 0), 3), ((0.3, 0.8, -0.5), 3),
                      ((0.2, -0.4, 0.6, 0.7), 4)]:
        n4 = np.zeros(4)
        n4[:len(nvec)] = nvec
        n4 /= np.linalg.norm(n4)
        n = V.from_array(jnp.asarray(n4, jnp.float32))
        t1, t2 = G.plane_tangent_frame(n, dim)
        for a, b in [(t1, t2), (t1, n), (t2, n)]:
            assert abs(float(V.dot(a, b))) < 1e-5
        assert np.isclose(float(V.norm(t1)), 1.0, atol=1e-5)
        assert np.isclose(float(V.norm(t2)), 1.0, atol=1e-5)
