"""Expression-driven space warps: the parser/AST (scene/expr.py), the
ExprSpace material (reference ComponentTransformation analog, SURVEY.md §2.1
'Materials & transitions'), backend parity, and parameter gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle
from euclider_tpu.scene import expr as E
from euclider_tpu.scene import ir

from conftest import assert_images_close


# --- parser / evaluator ------------------------------------------------------

def test_precedence_and_power():
    lib = E.numpy_lib()
    assert E.eval_ast(E.parse("1 + 2 * 3 ^ 2"), {}, lib) == 19.0
    assert E.eval_ast(E.parse("-2 ^ 2"), {}, lib) == -4.0      # -(2^2)
    assert E.eval_ast(E.parse("(-2) ^ 2"), {}, lib) == 4.0
    assert E.eval_ast(E.parse("2 ^ -2"), {}, lib) == 0.25
    assert E.eval_ast(E.parse("(1 + 2) * 3"), {}, lib) == 9.0
    assert E.eval_ast(E.parse("7 ^ 0"), {"x": 3.0}, lib) == 1.0


def test_functions_and_variables():
    env = {"x": 0.3, "y": -0.2, "z": 1.1, "w": 0.0, "p0": 2.0, "p1": 0.5}
    lib = E.numpy_lib()
    got = E.eval_ast(
        E.parse("p0*sin(x) + atan2(y, z) - min(x, y) + max(p1, w)"),
        env, lib)
    ref = (2.0 * np.sin(0.3) + np.arctan2(-0.2, 1.1)
           - min(0.3, -0.2) + max(0.5, 0.0))
    assert np.isclose(got, ref, rtol=0, atol=1e-15)
    # pi constant, unbound params default to 0
    assert np.isclose(E.eval_ast(E.parse("cos(pi) + p7"), {}, lib), -1.0)


def test_parse_errors():
    for bad in ["foo", "sin()", "1 +", "bar(1)", "x y", "min(1)",
                "sin(1, 2)", "(1", "1..2"]:
        with pytest.raises(E.ExprError):
            E.parse(bad)


def test_unparse_roundtrip():
    for s in ["p0 * sin(p1*y + p1*z)", "-x^2/4 + atan2(y, x)",
              "max(1, min(x, 2)) - floor(z) * sign(w)"]:
        ast = E.parse(s)
        assert E.parse(E.unparse(ast)) == ast


def test_free_params():
    assert E.free_params(E.parse("p0*sin(p3*x) + p3")) == (0, 3)
    assert E.free_params(E.parse("x + y")) == ()


def test_jax_eval_matches_numpy():
    src = "p0*sin(p1*y + z) - x^3 + sqrt(abs(w) + 1) + tanh(x/2)"
    ast = E.parse(src)
    rng = np.random.default_rng(0)
    env_np = {k: rng.normal() for k in ("x", "y", "z", "w")}
    env_np.update(p0=0.7, p1=1.3)
    ref = E.eval_ast(ast, env_np, E.numpy_lib())
    env_jx = {k: jnp.float32(v) for k, v in env_np.items()}
    got = float(E.eval_ast(ast, env_jx, E.jax_lib()))
    assert np.isclose(got, ref, rtol=2e-6, atol=2e-6)


def test_postfix_vm_contract():
    """to_postfix lowers with eval_ast's exact arithmetic — replay the
    program on a tiny Python VM and compare against eval_ast."""
    src = "p0*sin(p1*y + z) - x^3 + x^0.5 + atan2(y, x) - 2^-2"
    ast = E.parse(src)
    env = {"x": 0.8, "y": -0.4, "z": 1.2, "w": 0.0, "p0": 0.7, "p1": 1.3}
    ops, vals = E.to_postfix(ast)
    vars_ = [env["x"], env["y"], env["z"], env["w"],
             env["p0"], env["p1"], 0, 0, 0, 0, 0, 0]
    inv = {v: k for k, v in E.OPS.items()}
    lib = E.numpy_lib()
    st = []
    for op, val in zip(ops, vals):
        name = inv[op]
        if name == "const":
            st.append(val)
        elif name == "var":
            st.append(vars_[int(val)])
        elif name == "neg":
            st[-1] = -st[-1]
        elif name == "powi":
            n = int(val)
            a = st[-1]
            acc = 1.0 if n == 0 else a
            for _ in range(abs(n) - 1):
                acc *= a
            st[-1] = 1.0 / acc if n < 0 else acc
        elif name == "powf":
            b = st.pop()
            st[-1] = np.exp(b * np.log(st[-1]))
        elif name in ("add", "sub", "mul", "div", "min", "max", "atan2"):
            b = st.pop()
            a = st.pop()
            st.append({"add": a + b, "sub": a - b, "mul": a * b,
                       "div": a / b, "min": min(a, b), "max": max(a, b),
                       "atan2": np.arctan2(a, b)}[name])
        else:
            st[-1] = lib[name](st[-1])
    assert len(st) == 1
    ref = E.eval_ast(ast, env, lib)
    assert np.isclose(st[0], ref, rtol=0, atol=1e-15)


# --- the material end-to-end -------------------------------------------------

def _tiny_expr_scene(ax="p0 * sin(p1 * z)", ay="0", march=96):
    region = ir.Entity(ir.Sphere((0, 0, -4), 1.8),
                       material=ir.ExprSpace(ax=ax, ay=ay, step=0.06,
                                             params=(0.5, 2.0)),
                       surface=ir.UniformSurface((0, 0, 0, 0.0)))
    wall = ir.Entity(ir.Hyperplane((0, 0, 1), -8.0),
                     surface=ir.SmoothSurface(uv_scale=0.5))
    return ir.Scene(dim=3, entities=(region, wall),
                    settings=ir.RenderSettings(max_depth=3,
                                               march_steps=march,
                                               background=(0.1, 0.1, 0.2)))


def test_expr_scene_lax_matches_oracle():
    sc = _tiny_expr_scene()
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    a = et.render_image_jit(static, tables, cam, 12, 16)
    b = render_oracle(static, tables, cam, 12, 16)
    assert_images_close(a, b, atol=1e-4, max_bad_frac=0.01, msg="expr")


def test_expr_bends_rays():
    """The field must actually deflect rays: render with p0=0 (straight)
    and p0=0.5 and demand the images differ."""
    sc = _tiny_expr_scene()
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    a = np.asarray(et.render_image_jit(static, tables, cam, 12, 16))
    t0 = tables._replace(
        mat_expr_params=np.zeros_like(tables.mat_expr_params))
    b = np.asarray(et.render_image_jit(static, t0, cam, 12, 16))
    assert np.abs(a - b).max() > 1e-3


def test_expr_param_gradient_matches_fd():
    """d(image)/d(p0) through the march: autodiff vs oracle FD."""
    sc = _tiny_expr_scene(march=64)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    ep32 = jnp.asarray(tables.mat_expr_params, jnp.float32)

    def loss(ep):
        img = et.render_image(static, tables._replace(mat_expr_params=ep),
                              cam, 10, 12, True)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(ep32))
    assert np.isfinite(g).all()
    mi = int(np.argmax(np.abs(g).sum(axis=1)))  # the expr material row
    assert np.abs(g[mi]).sum() > 0

    h = 1e-3

    def orc(p0):
        ep = np.asarray(tables.mat_expr_params, np.float64).copy()
        ep[mi, 0] = p0
        return render_oracle(static, tables._replace(mat_expr_params=ep),
                             cam, 10, 12).mean()

    p0 = float(np.asarray(tables.mat_expr_params)[mi, 0])
    fd = (orc(p0 + h) - orc(p0 - h)) / (2 * h)
    assert np.isclose(float(g[mi, 0]), fd, rtol=0.15, atol=1e-3)


def test_expr_pallas_interpret_matches_lax(compiled_scenes):
    from euclider_tpu.ops.pallas_kernel import render_image_pallas
    _, static, tables, cam = compiled_scenes["config6_expr_space"]
    a = np.asarray(et.render_image_jit(static, tables, cam, 16, 128))
    b = np.asarray(render_image_pallas(static, tables, cam, 16, 128,
                                       (8, 128), "while", True))
    assert_images_close(a, b, atol=1e-5, msg="pallas-vs-lax expr")


def test_scene_time_plumbs_to_expressions():
    """The render's ``time`` argument (reference trace(time, ...) —
    SURVEY §3.3) reaches expression materials as ``t``, on every backend."""
    sc = _tiny_expr_scene(ax="p0 * sin(p1 * z + t)")
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    a = np.asarray(et.render_image_jit(static, tables, cam, 12, 16, False,
                                       0.0))
    b = np.asarray(et.render_image_jit(static, tables, cam, 12, 16, False,
                                       1.5))
    assert np.abs(a - b).max() > 1e-3          # time animates the field
    gold = render_oracle(static, tables, cam, 12, 16, time=1.5)
    assert_images_close(b, gold, atol=1e-4, max_bad_frac=0.01,
                        msg="expr time lax-vs-numpy")
    from euclider_tpu.oracle.native_oracle import render_native
    nat = render_native(static, tables, cam, 12, 16, time=1.5)
    assert_images_close(nat, gold, atol=1e-6, msg="expr time native")


def test_vm_stack_depth_rejected():
    """A right-nested expression deeper than the native VM's 64-slot stack
    must be rejected at IR-validation time (ADVICE r2: it would corrupt the
    C++ oracle's fixed `double st[64]`), while an equally long left-
    associated chain (O(1) stack) must pass."""
    deep = "x"
    for _ in range(80):
        deep = f"1 + ({deep})"            # right-nested: depth grows
    assert E.postfix_depth(E.parse(deep)) > E.VM_STACK
    with pytest.raises(E.ExprError):
        E.to_postfix(E.parse(deep))
    with pytest.raises(E.ExprError):
        ir.ExprSpace(ax=deep)
    flat = "x" + " + 1" * 200             # left-associated: depth 2
    assert E.postfix_depth(E.parse(flat)) == 2
    ir.ExprSpace(ax=flat)                 # accepted
    # depth simulation matches an actual VM replay
    src = "atan2(p0*sin(x+y*z), max(1, x^3 + (y+(z+w))))"
    ops, vals = E.to_postfix(E.parse(src))
    depth = cur = 0
    inv = {v: k for k, v in E.OPS.items()}
    for op in ops:
        name = inv[op]
        if name in ("const", "var"):
            cur += 1
        elif name in ("add", "sub", "mul", "div", "min", "max", "atan2",
                      "powf"):
            cur -= 1
        depth = max(depth, cur)
    assert E.postfix_depth(E.parse(src)) == depth


def test_pow_zero_nonfinite_matches_vm():
    """x^0 == 1 even for non-finite x, in eval_ast (both libs) and the C++
    VM alike (ADVICE r2: `1 + 0*a` was NaN for a=inf/nan)."""
    ast = E.parse("x ^ 0")
    for bad in (np.inf, -np.inf, np.nan):
        assert float(E.eval_ast(ast, {"x": bad}, E.numpy_lib())) == 1.0
        got = E.eval_ast(ast, {"x": jnp.float32(bad)}, E.jax_lib())
        assert float(got) == 1.0


def test_partial_domain_expr_gradients_finite():
    """A log/sqrt field whose domain excludes most of the scene must not
    NaN the gradients of rays *outside* the material (ADVICE r2 safe-where:
    0 * NaN used to propagate through V.where's VJP)."""
    # domain z <= -1: valid throughout the expr sphere (z in [-5.8, -2.2])
    # but NaN at the camera origin (z=0) where inactive rays sit
    sc = _tiny_expr_scene(ax="p0 * sqrt(-z - 1.0)", march=48)
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    ep32 = jnp.asarray(tables.mat_expr_params, jnp.float32)

    def loss(ep):
        img = et.render_image(static, tables._replace(mat_expr_params=ep),
                              cam, 8, 12, True)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(ep32))
    assert np.isfinite(g).all(), g


def test_expr_scene_json_roundtrip(tmp_path):
    from euclider_tpu.scene import jsonio
    sc = et.get_scene("config6_expr_space")
    path = tmp_path / "expr.json"
    jsonio.save_scene(sc, str(path))
    sc2 = jsonio.load_scene(str(path))
    assert sc2 == sc
