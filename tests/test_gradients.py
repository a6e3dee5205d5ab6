"""Gradient correctness: jax.grad / jvp vs finite differences of the oracle
and of the renderer itself (SURVEY.md §4.2; BASELINE 'pixel-gradient
allclose').

Silhouette pixels carry a boundary (Reynolds) term that interior-point
autodiff intentionally omits (discrete hit selection is stop-gradiented), so
comparisons exclude pixels whose finite difference is itself discontinuous —
standard practice for differentiable renderers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle

H, W = 16, 24


def _tab_to_f32(tables):
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tables)


def _fd_vs_jvp(static, tables, cam, set_param, get_param, h, tol, bad_frac=0.03):
    """Compare d(img)/dtheta by central differences (oracle, float64)
    against jax.jvp through the renderer, on non-silhouette pixels."""
    th0 = get_param(tables, cam)

    def render_jax(theta):
        t, c = set_param(tables, cam, theta)
        return et.render_image(static, _tab_to_f32(t), c, H, W, True)

    def render_orc(theta):
        t, c = set_param(tables, cam, theta)
        return render_oracle(static, t, c, H, W)

    img_p = render_orc(th0 + h)
    img_m = render_orc(th0 - h)
    fd = (img_p - img_m) / (2 * h)

    _, jv = jax.jvp(render_jax, (jnp.float32(th0),), (jnp.float32(1.0),))
    jv = np.asarray(jv, np.float64)

    # mask silhouette pixels: second-difference blowup marks discontinuities
    img_0 = render_orc(th0)
    nonsmooth = (np.abs(img_p + img_m - 2 * img_0).max(axis=-1)
                 > 10 * h * h + 1e-4 * h)
    mask = ~nonsmooth
    assert mask.mean() > 0.5, "silhouette mask ate the whole image"
    err = np.abs(fd - jv).max(axis=-1) * mask
    scale = max(np.abs(fd[mask]).max(), 1.0)
    bad = (err > tol * scale).mean()
    assert bad <= bad_frac, (
        f"grad mismatch on {bad:.3f} of pixels (tol {tol}, scale {scale:.3f}, "
        f"max err {err.max():.4f})")


@pytest.fixture(scope="module")
def probe(compiled_scenes):
    return compiled_scenes["grad_probe"]


def test_grad_sphere_center(probe):
    _, static, tables, cam = probe

    def set_p(t, c, th):
        sv = jnp.asarray(t.shape_vec).at[0, 2].set(th)
        return t._replace(shape_vec=sv), c

    def get_p(t, c):
        return float(np.asarray(t.shape_vec)[0, 2])

    _fd_vs_jvp(static, tables, cam, set_p, get_p, h=1e-4, tol=0.02)


def test_grad_sphere_radius(probe):
    _, static, tables, cam = probe

    def set_p(t, c, th):
        sc = jnp.asarray(t.shape_sc).at[0].set(th)
        return t._replace(shape_sc=sc), c

    def get_p(t, c):
        return float(np.asarray(t.shape_sc)[0])

    _fd_vs_jvp(static, tables, cam, set_p, get_p, h=1e-4, tol=0.02)


def test_grad_camera_position(probe):
    _, static, tables, cam = probe

    def set_p(t, c, th):
        pos = jnp.asarray(c.position).at[0].set(th)
        return t, c._replace(position=pos)

    def get_p(t, c):
        return float(np.asarray(c.position)[0])

    _fd_vs_jvp(static, tables, cam, set_p, get_p, h=1e-4, tol=0.02)


def test_grad_surface_color(probe):
    _, static, tables, cam = probe

    def set_p(t, c, th):
        col = jnp.asarray(t.surf_color).at[0, 0].set(th)
        return t._replace(surf_color=col), c

    def get_p(t, c):
        return float(np.asarray(t.surf_color)[0, 0])

    _fd_vs_jvp(static, tables, cam, set_p, get_p, h=1e-3, tol=0.01)


def test_grad_fresnel_coefficient(compiled_scenes):
    """d(img)/d(fresnel) through the Schlick reflection-ratio term."""
    _, static, tables, cam = compiled_scenes["fresnel_probe"]

    def set_p(t, c, th):
        f = jnp.asarray(t.surf_fresnel).at[0].set(th)
        return t._replace(surf_fresnel=f), c

    def get_p(t, c):
        return float(np.asarray(t.surf_fresnel)[0])

    _fd_vs_jvp(static, tables, cam, set_p, get_p, h=1e-3, tol=0.02)


def test_grad_reverse_mode_runs(probe):
    """reverse-mode end-to-end: grad of a scalar loss w.r.t. all tables."""
    _, static, tables, cam = probe
    tab = _tab_to_f32(tables)

    def loss(t, c):
        img = et.render_image(static, t, c, H, W, True)
        return jnp.mean((img - 0.3) ** 2)

    (gt, gc) = jax.grad(loss, argnums=(0, 1))(tab, cam)
    flat = [np.asarray(x) for x in jax.tree.leaves(gt)] + \
           [np.asarray(x) for x in jax.tree.leaves(gc)]
    assert all(np.isfinite(x).all() for x in flat)
    # geometry and camera grads must be nonzero for smooth surfaces
    assert np.abs(np.asarray(gt.shape_vec)).sum() > 0
    assert np.abs(np.asarray(gc.position)).sum() > 0


def test_grad_warp_strength():
    """Gradient flows through the iterative march (warp strength).

    Needs a smooth surface behind the warp region: with checker/uniform
    surfaces the strength gradient is zero a.e. (it only moves boundaries)."""
    from euclider_tpu.scene import ir
    region = ir.Entity(ir.Sphere((0, 0, -4), 1.8),
                       material=ir.WarpSpace(center=(0, 0, -4), strength=0.4,
                                             step=0.05),
                       surface=ir.UniformSurface((0, 0, 0, 0.0)))
    wall = ir.Entity(ir.Hyperplane((0, 0, 1), -8.0),
                     surface=ir.SmoothSurface(uv_scale=0.5))
    sc = ir.Scene(dim=3, entities=(region, wall),
                  settings=ir.RenderSettings(max_depth=3, march_steps=200,
                                             background=(0.1, 0.1, 0.2)))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    tab = _tab_to_f32(tables)

    def loss(ws):
        t = tab._replace(mat_warp_strength=ws)
        img = et.render_image(static, t, cam, 12, 16, True)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(tab.mat_warp_strength))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0

    # and it matches finite differences of the oracle
    ws0 = float(np.asarray(tables.mat_warp_strength)[1])
    idx = int(np.argmax(np.asarray(tables.mat_warp_strength) != 0.0)) \
        if np.any(np.asarray(tables.mat_warp_strength) != 0.0) else 1
    h = 1e-3

    def orc(wsv):
        t = tables._replace(mat_warp_strength=np.asarray(
            tables.mat_warp_strength).copy())
        t.mat_warp_strength[idx] = wsv
        return render_oracle(static, t, cam, 12, 16).mean()

    ws0 = float(np.asarray(tables.mat_warp_strength)[idx])
    fd = (orc(ws0 + h) - orc(ws0 - h)) / (2 * h)
    assert np.isclose(float(g[idx]), fd, rtol=0.15, atol=1e-3)


def test_blocked_vjp_matches_whole_frame(probe):
    """pallas_kernel.vjp_blocked (row-blocked recompute backward) must equal
    the whole-frame jax.vjp exactly — including with a block size that does
    not divide H (padded rows carry zero cotangents)."""
    from euclider_tpu.ops.pallas_kernel import vjp_blocked

    _, static, tables, cam = probe
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(0).normal(size=(H, W, 3)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda t, c: et.render_image(static, t, c, H, W, True), t32, cam)
    gt_ref, gc_ref = vjp(jnp.asarray(g))
    gt_blk, gc_blk, _ = vjp_blocked(static, t32, cam, H, W, g, block_rows=7)

    for a, b in zip(jax.tree.leaves((gt_ref, gc_ref)),
                    jax.tree.leaves((gt_blk, gc_blk))):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        # blocked accumulation reassociates f32 sums: allow ~1e-3 relative
        # to each leaf's magnitude (near-zero leaves get the atol floor)
        tol = 1e-3 * max(np.abs(a).max(), 1.0) if a.size else 0.0
        assert np.abs(a - b).max() <= tol, np.abs(a - b).max()


def _assert_grads_close(ref, got, rtol=1e-3):
    ra, ga = jax.tree.leaves(ref), jax.tree.leaves(got)
    assert len(ra) == len(ga)
    for a, b in zip(ra, ga):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        tol = rtol * max(np.abs(a).max(), 1.0) if a.size else 0.0
        assert np.abs(a - b).max() <= tol, np.abs(a - b).max()


def _depth2(name):
    """Compile a library scene at max_depth=2: the interpret-mode compile of
    the unrolled backward-kernel transpose is minutes per extra bounce on
    CPU XLA, and depth 2 already exercises both branch pushes + the loop.
    (Depth 3 at 720p is validated on real hardware by tools/tpu_bwd_probe.py
    — TPU_BWD_OK, max rel err 6e-5 vs the lax VJP.)"""
    from dataclasses import replace

    import euclider_tpu as et
    sc = et.get_scene(name)
    sc = replace(sc, settings=replace(sc.settings, max_depth=2))
    static, tables = et.compile_scene(sc)
    return static, tables, et.compile_camera(sc.camera)


def test_pallas_backward_kernel_matches_lax_vjp():
    """The dedicated Pallas backward kernel (per-tile recompute-VJP in VMEM,
    pallas_kernel.vjp_pallas) must reproduce the whole-frame lax jax.vjp —
    tables, camera AND time cotangents — including with tile padding
    (H, W not multiples of the tile)."""
    from euclider_tpu.ops.pallas_kernel import vjp_pallas

    static, tables, cam = _depth2("grad_probe")
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(1).normal(size=(H, W, 3)).astype(np.float32)
    tm = jnp.float32(0.0)

    _, vjp = jax.vjp(
        lambda t, c, tt: et.render_image(static, t, c, H, W, True, tt),
        t32, cam, tm)
    gt_ref, gc_ref, gtm_ref = vjp(jnp.asarray(g))
    gt_pal, gc_pal, gtm_pal = vjp_pallas(static, t32, cam, H, W, g,
                                         (8, 128), tm, True)
    _assert_grads_close((gt_ref, gc_ref), (gt_pal, gc_pal))
    assert np.isclose(float(gtm_ref), float(gtm_pal), atol=1e-4)


def test_pallas_segmented_backward_matches_lax_vjp():
    """The segmented deep-tree backward (vjp_pallas_segmented: K chunk
    kernels, boundary carries in HBM, one chunk's tape at a time) must
    reproduce the whole-frame lax jax.vjp.  chunk_trips=1 forces two
    segments even at depth 2, exercising the boundary hand-off; the 63-node
    config2 tree is validated on real hardware (SEG_TPU_OK, 3.3e-7)."""
    from euclider_tpu.ops.pallas_kernel import vjp_pallas_segmented

    static, tables, cam = _depth2("grad_probe")
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(3).normal(size=(H, W, 3)).astype(np.float32)
    tm = jnp.float32(0.0)

    _, vjp = jax.vjp(
        lambda t, c, tt: et.render_image(static, t, c, H, W, True, tt),
        t32, cam, tm)
    gt_ref, gc_ref, gtm_ref = vjp(jnp.asarray(g))
    gt_seg, gc_seg, gtm_seg = vjp_pallas_segmented(
        static, t32, cam, H, W, g, (8, 128), tm, True, 0.0, None, 1)
    _assert_grads_close((gt_ref, gc_ref), (gt_seg, gc_seg))
    assert np.isclose(float(gtm_ref), float(gtm_seg), atol=1e-4)


def test_pallas_segmented_truncated_tree():
    """Uneven chunking on a TRUNCATED traversal (settings.max_nodes caps the
    DFS below the full tree): trips=3 with chunk_trips=2 must run chunks of
    [2, 1] — the old K*c=4 overshoot popped a node the forward never shaded,
    so the gradients stopped corresponding to the rendered primal
    (ADVICE r3, medium)."""
    from dataclasses import replace

    from euclider_tpu.ops.pallas_kernel import vjp_pallas_segmented

    sc = et.get_scene("grad_probe")
    sc = replace(sc, settings=replace(sc.settings, max_depth=3, max_nodes=4))
    static, tables = et.compile_scene(sc)
    assert static.max_nodes == 4  # truncated: full depth-3 tree is 7
    cam = et.compile_camera(sc.camera)
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(5).normal(size=(H, W, 3)).astype(np.float32)
    tm = jnp.float32(0.0)

    _, vjp = jax.vjp(
        lambda t, c, tt: et.render_image(static, t, c, H, W, True, tt),
        t32, cam, tm)
    gt_ref, gc_ref, gtm_ref = vjp(jnp.asarray(g))
    gt_seg, gc_seg, gtm_seg = vjp_pallas_segmented(
        static, t32, cam, H, W, g, (8, 128), tm, True, 0.0, None, 2)
    _assert_grads_close((gt_ref, gc_ref), (gt_seg, gc_seg))
    assert np.isclose(float(gtm_ref), float(gtm_seg), atol=1e-4)


def test_pallas_ckpt_backward_matches_lax_vjp():
    """The in-kernel checkpointed VJP (pallas_vjp.vjp_pallas_ckpt: rolled
    chunk loops, VMEM checkpoint stacks, no HBM carries) must reproduce the
    whole-frame lax jax.vjp on a straight scene, including uneven chunk
    padding (trips=2 with trip_chunk=2 -> K=1) and tile padding."""
    from euclider_tpu.ops.pallas_vjp import vjp_pallas_ckpt

    static, tables, cam = _depth2("grad_probe")
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(7).normal(size=(H, W, 3)).astype(np.float32)
    tm = jnp.float32(0.0)

    _, vjp = jax.vjp(
        lambda t, c, tt: et.render_image(static, t, c, H, W, True, tt),
        t32, cam, tm)
    gt_ref, gc_ref, gtm_ref = vjp(jnp.asarray(g))
    gt_ck, gc_ck, gtm_ck = vjp_pallas_ckpt(static, t32, cam, H, W, g,
                                           (8, 128), tm, True,
                                           trip_chunk=2)
    _assert_grads_close((gt_ref, gc_ref), (gt_ck, gc_ck))
    assert np.isclose(float(gtm_ref), float(gtm_ck), atol=1e-4)


def test_march_step_analytic_inverse():
    """The reversible sweep's reconstruction (pallas_vjp.march_bwd_rev):
    one march step forward, then x = x1 - h*v1 and v from the |v|=1
    quadratic must recover the pre-step state to f32 precision — the
    invariant the no-store-pass backward rests on (docs/PERF.md §5)."""
    from euclider_tpu.ops import march as M
    from euclider_tpu.ops import vec as V
    from euclider_tpu.ops.vec import Vec

    rng = np.random.default_rng(0)
    n = 64
    mk = lambda s: jnp.asarray(rng.normal(size=(n,)) * s, jnp.float32)
    x = Vec(mk(1.0), mk(1.0), mk(1.0) - 3.0, mk(0.0))
    v = V.normalize(Vec(mk(1.0), mk(1.0), -jnp.abs(mk(1.0)) - 0.2, mk(0.0)))
    h = jnp.float32(0.12)
    center = Vec(*(jnp.float32(c) for c in (0.0, 0.0, -3.0, 0.0)))
    accel = lambda p: M.warp_accel(center, jnp.float32(0.8), p)

    # forward step (the march body's float core)
    v1 = V.normalize(V.madd(v, h, accel(x)))
    x1 = V.madd(x, h, v1)

    # analytic inverse
    xp = V.madd(x1, -h, v1)
    a = accel(xp)
    va = V.dot(v1, a)
    disc = jnp.maximum((h * va) ** 2 - h * h * V.norm2(a) + 1.0, 0.0)
    s = h * va + jnp.sqrt(disc)
    vp = V.madd(V.scale(v1, s), -h, a)

    for got, ref in [(xp, x), (vp, v)]:
        for c in "xyzw":
            err = np.abs(np.asarray(getattr(got, c))
                         - np.asarray(getattr(ref, c))).max()
            assert err < 5e-6, (c, err)


def test_pallas_ckpt_backward_march_storepass():
    """The store-pass sweep (MARCH_REVERSIBLE=False) is the
    bit-conservative fallback and must stay green now that the reversible
    sweep is the default (it is what every other march test exercises)."""
    from dataclasses import replace

    from euclider_tpu.ops import pallas_vjp as PV

    sc = et.get_scene("config5_warp_portal")
    sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                      march_steps=14))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(9).normal(size=(H, W, 3)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda t, c: et.render_image(static, t, c, H, W, True), t32, cam)
    gt_ref, gc_ref = vjp(jnp.asarray(g))

    PV.MARCH_REVERSIBLE = False
    PV.vjp_pallas_ckpt.clear_cache()
    try:
        gt, gc, _ = PV.vjp_pallas_ckpt(static, t32, cam, H, W, g,
                                       (8, 128), 0.0, True,
                                       trip_chunk=1, march_chunk=7)
    finally:
        PV.MARCH_REVERSIBLE = True
        PV.vjp_pallas_ckpt.clear_cache()
    _assert_grads_close((gt_ref, gc_ref), (gt, gc))


def test_pallas_ckpt_backward_march_fused_shell():
    """The parked fused-shell reverse step (MARCH_FUSED_SHELL=True: one
    jax.vjp over the accel FIELD + hand-transposed normalize/madd shell)
    must stay grad-correct even though it is not the default (measured ~5%
    slower than the whole-step jax.vjp on v5e — see the flag's comment in
    ops/pallas_vjp.py)."""
    from dataclasses import replace

    from euclider_tpu.ops import pallas_vjp as PV

    sc = et.get_scene("config5_warp_portal")
    sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                      march_steps=14))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(9).normal(size=(H, W, 3)).astype(np.float32)

    _, vjp = jax.vjp(
        lambda t, c: et.render_image(static, t, c, H, W, True), t32, cam)
    gt_ref, gc_ref = vjp(jnp.asarray(g))

    PV.MARCH_FUSED_SHELL = True
    PV.vjp_pallas_ckpt.clear_cache()
    try:
        gt, gc, _ = PV.vjp_pallas_ckpt(static, t32, cam, H, W, g,
                                       (8, 128), 0.0, True,
                                       trip_chunk=1, march_chunk=7)
    finally:
        PV.MARCH_FUSED_SHELL = False
        PV.vjp_pallas_ckpt.clear_cache()
    _assert_grads_close((gt_ref, gc_ref), (gt, gc))


def test_pallas_ckpt_backward_march():
    """Marchy scenes through the checkpointed VJP: the march custom-VJP
    (chunked forward with SSA residuals, VMEM step-stack reverse sweep,
    chunk-level early exit) must match the lax VJP — including the chunk
    padding path (23 steps with march_chunk=5) and portal transposes.
    This is the kernel coverage configs 5-7 route to via backward='auto'
    (round 3's top missing item: marchy backward was not a kernel at all)."""
    from dataclasses import replace

    from euclider_tpu.ops.pallas_vjp import vjp_pallas_ckpt

    sc = et.get_scene("config5_warp_portal")
    sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                      march_steps=23))
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = _tab_to_f32(tables)
    g = np.random.default_rng(9).normal(size=(H, W, 3)).astype(np.float32)
    tm = jnp.float32(0.25)

    _, vjp = jax.vjp(
        lambda t, c, tt: et.render_image(static, t, c, H, W, True, tt),
        t32, cam, tm)
    gt_ref, gc_ref, gtm_ref = vjp(jnp.asarray(g))
    gt_ck, gc_ck, gtm_ck = vjp_pallas_ckpt(static, t32, cam, H, W, g,
                                           (8, 128), tm, True,
                                           trip_chunk=1, march_chunk=5)
    _assert_grads_close((gt_ref, gc_ref), (gt_ck, gc_ck))
    assert np.isclose(float(gtm_ref), float(gtm_ck), atol=1e-4)


@pytest.mark.parametrize("case", ["straight", "march"])
def test_fused_train_step_matches_value_and_grad(case):
    """The fused training kernel (pallas_vjp.train_step_pallas: render +
    MSE loss + cotangent + transpose in ONE kernel, no separate render
    launch) must reproduce jax.value_and_grad of the lax MSE loss —
    including the padded-lane masking (H, W not tile multiples)."""
    from dataclasses import replace

    from euclider_tpu.ops.pallas_vjp import train_step_pallas

    if case == "straight":
        sc = et.get_scene("grad_probe")
        sc = replace(sc, settings=replace(sc.settings, max_depth=2))
        kw = dict(trip_chunk=2)
    else:
        sc = et.get_scene("config5_warp_portal")
        sc = replace(sc, settings=replace(sc.settings, max_depth=2,
                                          march_steps=23))
        kw = dict(trip_chunk=1, march_chunk=5)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = _tab_to_f32(tables)
    tgt = np.random.default_rng(11).uniform(size=(H, W, 3)).astype(
        np.float32)
    tm = jnp.float32(0.25)

    def loss_lax(t, c, tt):
        img = et.render_image(static, t, c, H, W, True, tt)
        return jnp.mean((img - tgt) ** 2)

    l_ref, (gt_ref, gc_ref, gtm_ref) = jax.value_and_grad(
        loss_lax, argnums=(0, 1, 2))(t32, cam, tm)
    l, gt, gc, gtm = train_step_pallas(static, t32, cam, tgt, H, W, tm,
                                       (8, 128), 0.0, None, None, True,
                                       **kw)
    assert np.isclose(float(l_ref), float(l), rtol=1e-5)
    _assert_grads_close((gt_ref, gc_ref), (gt, gc))
    assert np.isclose(float(gtm_ref), float(gtm), atol=1e-4)


def test_pallas_diff_render_auto_routes_march():
    """backward='auto' sends marchy scenes to the in-kernel checkpointed
    VJP through the custom_vjp wrapper (jax.grad end-to-end).  Uses the
    smooth-wall expr scene (test_expr_space._tiny_expr_scene): rays must
    pass THROUGH the region onto a smooth surface for expr-param
    gradients to be nonzero at interior pixels — invisible boundaries in
    front of uniform surfaces have no smooth color dependence."""
    from test_expr_space import _tiny_expr_scene

    from euclider_tpu.ops.pallas_kernel import render_image_pallas_diff

    sc = _tiny_expr_scene(march=15)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    t32 = _tab_to_f32(tables)

    def loss_pal(t):
        img = render_image_pallas_diff(static, t, cam, H, W, 0.3, "auto",
                                       (8, 128), True)
        return jnp.mean(img * img)

    def loss_lax(t):
        img = et.render_image(static, t, cam, H, W, True, 0.3)
        return jnp.mean(img * img)

    gp = jax.grad(loss_pal)(t32)
    gl = jax.grad(loss_lax)(t32)
    assert np.abs(np.asarray(gp.mat_expr_params)).sum() > 0
    _assert_grads_close(gl, gp)


def test_pallas_diff_render_textured():
    """End-to-end custom_vjp through render_image_pallas_diff on the CSG +
    texture scene: exercises the matmul texture sampler's transpose and the
    packed-texture cotangent unpacking."""
    from euclider_tpu.ops.pallas_kernel import render_image_pallas_diff

    static, tables, cam = _depth2("config3_csg_textured")
    t32 = _tab_to_f32(tables)

    def loss_pal(t):
        img = render_image_pallas_diff(static, t, cam, H, W, 0.0, "pallas",
                                       (8, 128), True)
        return jnp.mean(img * img)

    def loss_lax(t):
        img = et.render_image(static, t, cam, H, W, True)
        return jnp.mean(img * img)

    gp = jax.grad(loss_pal)(t32)
    gl = jax.grad(loss_lax)(t32)
    assert any(np.abs(np.asarray(t)).sum() > 0 for t in gp.textures)
    _assert_grads_close(gl, gp)
