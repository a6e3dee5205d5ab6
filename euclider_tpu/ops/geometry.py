"""Primitive + CSG geometry, specialised per static shape node.

Replaces the reference's per-(material, shape) intersector registry and lazy
intersection iterators (upstream ``src/universe/entity/mod.rs`` +
``d3/entity/*.rs``; SURVEY.md §2.1 'Intersection machinery').  The lazy
iterator protocol existed to feed CSG set operations; here a CSG composite
instead produces a *fixed* candidate set — every leaf primitive's boundary
crossings — and each candidate is validated with a membership-flip probe
(inside(x(t-δ)) != inside(x(t+δ))).  Fixed shapes, no sorting, no dynamic
allocation: a min-fold picks the nearest valid crossing.

All functions take batched component-SoA vectors (ops.vec.Vec) and static
shape nodes (scene.compile.ShapeNode); parameters come from SceneTables via
*static* row indices, so no gathers are emitted.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import mathx
from . import vec as V
from .vec import Vec

EPS_T = 1e-4      # minimum accepted hit distance along a ray
PROBE = 2e-4      # CSG membership probe offset around a candidate crossing

# Node grammar (from scene/compile.py):
#   ('sphere', row) | ('hyperplane', row) | ('halfspace', row)
#   | ('cylinder', row)            # two rows: [row]=center (+radius in sc),
#                                  #           [row+1]=unit axis
#   | (op, (child, ...)) with op in
#     {'union','intersection','difference','symdiff','complement'}

PRIMS = ("sphere", "hyperplane", "halfspace", "cylinder")


def is_primitive(node) -> bool:
    return node[0] in PRIMS


def leaves(node):
    """Primitive leaves of a shape node, in deterministic order."""
    if is_primitive(node):
        return [node]
    out = []
    for c in node[1]:
        out.extend(leaves(c))
    return out


def row_vec(tables, row: int) -> Vec:
    r = tables.shape_vec[row]
    return Vec(r[0], r[1], r[2], r[3])


# ---------------------------------------------------------------------------
# membership / side predicates
# ---------------------------------------------------------------------------

def _cyl_radial(tables, row: int, p: Vec) -> Vec:
    """Component of (p - center) perpendicular to the cylinder axis."""
    c = row_vec(tables, row)
    a = row_vec(tables, row + 1)
    pc = V.sub(p, c)
    return V.madd(pc, -V.dot(pc, a), a)


def member(node, tables, p: Vec):
    """Is point p inside the (volumetric) shape?  Hyperplanes are measure-zero
    and never contain points (reference Shape::is_point_inside)."""
    kind = node[0]
    if kind == "sphere":
        c = row_vec(tables, node[1])
        r = tables.shape_sc[node[1]]
        return V.norm2(V.sub(p, c)) < r * r
    if kind == "hyperplane":
        return jnp.zeros_like(p.x, dtype=bool)
    if kind == "halfspace":
        n = row_vec(tables, node[1])
        c = tables.shape_sc[node[1]]
        return V.dot(n, p) < c
    if kind == "cylinder":
        r = tables.shape_sc[node[1]]
        return V.norm2(_cyl_radial(tables, node[1], p)) < r * r
    ms = [member(ch, tables, p) for ch in node[1]]
    if kind == "union":
        out = ms[0]
        for m in ms[1:]:
            out = out | m
        return out
    if kind == "intersection":
        out = ms[0]
        for m in ms[1:]:
            out = out & m
        return out
    if kind == "difference":
        return ms[0] & ~ms[1]
    if kind == "symdiff":
        out = ms[0]
        for m in ms[1:]:
            out = out ^ m
        return out
    if kind == "complement":
        return ~ms[0]
    raise ValueError(f"unknown node {kind!r}")


def side(node, tables, p: Vec):
    """Boolean side predicate whose flips mark boundary crossings — equals
    membership for volumetric shapes, and the half-space side for a bare
    hyperplane (so marching can detect sheet crossings too)."""
    if node[0] == "hyperplane":
        n = row_vec(tables, node[1])
        c = tables.shape_sc[node[1]]
        return V.dot(n, p) < c
    return member(node, tables, p)


def boundary_abs(leaf, tables, p: Vec):
    """|signed distance-ish| to a leaf's boundary, for picking the leaf that
    generated a marched crossing."""
    kind, row = leaf
    if kind == "sphere":
        c = row_vec(tables, row)
        r = tables.shape_sc[row]
        return jnp.abs(V.norm(V.sub(p, c)) - r)
    if kind == "cylinder":
        r = tables.shape_sc[row]
        return jnp.abs(V.norm(_cyl_radial(tables, row, p)) - r)
    n = row_vec(tables, row)
    c = tables.shape_sc[row]
    return jnp.abs(V.dot(n, p) - c)


# ---------------------------------------------------------------------------
# leaf geometry: crossings, normals, uv
# ---------------------------------------------------------------------------

def leaf_crossings(leaf, tables, org: Vec, d: Vec):
    """All boundary crossings of a ray with one primitive.

    Returns a list of (t, valid) — fixed length 2 for spheres, 1 for
    plane/halfspace.  ``d`` is assumed unit-length.
    """
    kind, row = leaf
    if kind == "sphere":
        c = row_vec(tables, row)
        r = tables.shape_sc[row]
        oc = V.sub(org, c)
        b = V.dot(oc, d)                    # half-b; a == 1
        q = V.norm2(oc) - r * r
        disc = b * b - q
        ok = disc > 0.0
        # safe-where (not maximum): sqrt'(0)=inf would leak NaNs into
        # reverse-mode grads of rays that miss the sphere
        s = jnp.sqrt(jnp.where(ok, disc, 1.0))
        return [(-b - s, ok), (-b + s, ok)]
    if kind == "cylinder":
        # |q + t w|^2 = r^2 with q, w the radial parts of (o-c), d
        c = row_vec(tables, row)
        a = row_vec(tables, row + 1)
        r = tables.shape_sc[row]
        oc = V.sub(org, c)
        q = V.madd(oc, -V.dot(oc, a), a)
        w = V.madd(d, -V.dot(d, a), a)
        w2 = V.norm2(w)
        para = w2 < 1e-12                  # ray parallel to the axis
        w2s = jnp.where(para, 1.0, w2)
        b = V.dot(q, w) / w2s
        cc = (V.norm2(q) - r * r) / w2s
        disc = b * b - cc
        ok = (disc > 0.0) & ~para
        s = jnp.sqrt(jnp.where(ok, disc, 1.0))
        return [(-b - s, ok), (-b + s, ok)]
    # hyperplane / halfspace boundary: n·(o + t d) = c
    n = row_vec(tables, row)
    c = tables.shape_sc[row]
    nd = V.dot(n, d)
    safe = jnp.abs(nd) > 1e-12
    t = (c - V.dot(n, org)) / jnp.where(safe, nd, 1.0)
    return [(t, safe)]


def leaf_normal(leaf, tables, p: Vec) -> Vec:
    """Unoriented geometric unit normal at point p on the leaf's boundary."""
    kind, row = leaf
    if kind == "sphere":
        c = row_vec(tables, row)
        return V.normalize(V.sub(p, c))
    if kind == "cylinder":
        return V.normalize(_cyl_radial(tables, row, p))
    return row_vec(tables, row)  # unit normal (normalised at compile time)


def _axis_vec(i, dtype=jnp.float32):
    z = jnp.asarray(0.0, dtype)
    o = jnp.asarray(1.0, dtype)
    comps = [z, z, z, z]
    comps[i] = o
    return Vec(*comps)


def plane_tangent_frame(n: Vec, dim: int):
    """Two orthonormal tangents of a (hyper)plane, chosen deterministically:
    Gram-Schmidt the two coordinate axes with the smallest |n| components.
    Branchless (jnp.where chains on scalars) so it traces cleanly; the
    NumPy/C++ oracles replicate the same selection rule bit-for-bit."""
    comps = [jnp.abs(n.x), jnp.abs(n.y), jnp.abs(n.z), jnp.abs(n.w)]
    dtype = jnp.asarray(n.x).dtype
    big = jnp.asarray(1e9, dtype)
    vals = [comps[i] if i < dim else big for i in range(4)]

    # argmin over `dim` scalar values
    def argmin(vals, exclude=None):
        best_i = jnp.int32(0)
        best_v = big + 1.0
        for i, v in enumerate(vals):
            vv = v if exclude is None else jnp.where(exclude == i, big, v)
            take = vv < best_v
            best_v = jnp.where(take, vv, best_v)
            best_i = jnp.where(take, jnp.int32(i), best_i)
        return best_i

    a = argmin(vals)
    b = argmin(vals, exclude=a)

    def pick_axis(idx):
        out = _axis_vec(0, dtype)
        for i in range(1, 4):
            out = V.where(idx == i, _axis_vec(i, dtype), out)
        return out

    ea, eb = pick_axis(a), pick_axis(b)
    t1 = V.normalize(V.madd(ea, -V.dot(n, ea), n))
    t2 = V.madd(eb, -V.dot(n, eb), n)
    t2 = V.normalize(V.madd(t2, -V.dot(t1, t2), t1))
    return t1, t2


def leaf_uv(leaf, tables, p: Vec, dim: int):
    """UV coordinates at p (reference uv_sphere-style mapping; SURVEY §2.1).

    Sphere: longitude/latitude from the local x,y,z components (w ignored —
    well-defined in 4D too).  Plane/halfspace: coordinates in a deterministic
    tangent frame.
    """
    kind, row = leaf
    if kind == "sphere":
        c = row_vec(tables, row)
        loc = V.sub(p, c)
        # pole guards: atan2 grad is NaN at (0,0); acos grad is inf at +-1.
        # The 1e-6 clip margin is part of the semantics contract (oracles
        # apply the same clip).
        safe_x = jnp.where((jnp.abs(loc.x) + jnp.abs(loc.y)) < 1e-12,
                           1.0, loc.x)
        # mathx (not jnp) trig: Mosaic has no atan2/acos lowering, and using
        # one implementation everywhere keeps lax and Pallas bit-identical
        u = mathx.atan2(loc.y, safe_x) * (0.5 / jnp.pi) + 0.5
        rlen = V.norm(loc)
        cz = jnp.clip(loc.z / jnp.maximum(rlen, 1e-12),
                      -1.0 + 1e-6, 1.0 - 1e-6)
        v = mathx.acos(cz) / jnp.pi
        return u, v
    if kind == "cylinder":
        # u: angle around the axis in its deterministic tangent frame;
        # v: axial coordinate.  Same atan2 pole guard as the sphere.
        c = row_vec(tables, row)
        a = row_vec(tables, row + 1)
        pc = V.sub(p, c)
        ax = V.dot(pc, a)
        q = V.madd(pc, -ax, a)
        t1, t2 = plane_tangent_frame(a, dim)
        qx = V.dot(q, t1)
        qy = V.dot(q, t2)
        safe_x = jnp.where((jnp.abs(qx) + jnp.abs(qy)) < 1e-12, 1.0, qx)
        u = mathx.atan2(qy, safe_x) * (0.5 / jnp.pi) + 0.5
        return u, ax
    n = row_vec(tables, row)
    t1, t2 = plane_tangent_frame(n, dim)
    return V.dot(p, t1), V.dot(p, t2)


# ---------------------------------------------------------------------------
# per-entity nearest hit (straight rays)
# ---------------------------------------------------------------------------

def entity_hit_straight(node, tables, org: Vec, d: Vec, dim: int,
                        t_max: float, need_uv: bool = True):
    """Nearest valid boundary crossing of a straight ray with one shape.

    For primitives every root with t in (EPS_T, t_max) is a boundary.  For a
    CSG composite, a leaf crossing is a boundary iff the composite's
    membership flips across it (the membership-flip probe replacing the
    reference's lazy interval iteration).

    Returns (t, hit, normal, u, v): normal is the *unoriented* leaf normal at
    the crossing; all arrays batched like org.x.  ``need_uv=False`` elides
    the UV math (atan2/acos for spheres) and returns zero u, v — used when
    the entity's surface color is UV-independent.
    """
    csg = not is_primitive(node)
    best_t = jnp.full_like(org.x, t_max)
    best_hit = jnp.zeros_like(org.x, dtype=bool)
    best_n = Vec(jnp.zeros_like(org.x), jnp.zeros_like(org.x),
                 jnp.zeros_like(org.x), jnp.zeros_like(org.x))
    best_u = jnp.zeros_like(org.x)
    best_v = jnp.zeros_like(org.x)

    for leaf in leaves(node):
        for t, ok in leaf_crossings(leaf, tables, org, d):
            valid = ok & (t > EPS_T) & (t < t_max)
            if csg:
                pm = V.madd(org, t - PROBE, d)
                pp = V.madd(org, t + PROBE, d)
                valid = valid & (member(node, tables, pm)
                                 ^ member(node, tables, pp))
            p = V.madd(org, t, d)
            n = leaf_normal(leaf, tables, p)
            if need_uv:
                u, v = leaf_uv(leaf, tables, p, dim)
            else:
                u = v = jnp.zeros_like(t)
            take = valid & (t < best_t)
            best_t = jnp.where(take, t, best_t)
            best_hit = best_hit | take
            best_n = V.where(take, n, best_n)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
    return best_t, best_hit, best_n, best_u, best_v
