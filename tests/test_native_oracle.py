"""C++ oracle parity: the native ground-truth renderer must match both the
NumPy oracle (scalar recursion twin) and the lax renderer on every scene."""
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.oracle.cpu_oracle import render_oracle
from euclider_tpu.oracle.native_oracle import render_native

from conftest import assert_images_close

RES = (20, 32)


@pytest.mark.parametrize("name", et.ACCEPTANCE + ("grad_probe",))
def test_native_matches_numpy_oracle(name, compiled_scenes):
    _, static, tables, cam = compiled_scenes[name]
    H, W = RES
    a = render_oracle(static, tables, cam, H, W)
    b = render_native(static, tables, cam, H, W)
    if name == "config6_expr_space":
        # NumPy's SIMD sin/cos differ from libm by ~1 ulp; hundreds of march
        # steps can push a bisection the other way on boundary pixels
        assert_images_close(a, b, atol=1e-5, max_bad_frac=0.02, msg=name)
    else:
        # identical float64 recursion, float32 output cast: ~3e-8
        assert_images_close(a, b, atol=1e-6, msg=name)


def test_native_matches_lax_fullres():
    """Spot-check at higher resolution than the NumPy oracle can afford."""
    sc = et.get_scene("config2_mirror_glass")
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    a = np.asarray(et.render_image_jit(static, tables, cam, 90, 160))
    b = render_native(static, tables, cam, 90, 160)
    assert_images_close(a, b, atol=1e-4, max_bad_frac=0.01, msg="90x160")


def test_expr_vm_stack_bound():
    """The C VM must refuse (NaN) a raw program that would overflow its
    64-slot stack — defense in depth behind the Python-side IR validation
    (scene/expr.py), exercised straight through the ctypes ABI
    (VERDICT r3 'harden the two soft gates')."""
    import ctypes

    from euclider_tpu.oracle.native_oracle import _lib

    lib = _lib()
    lib.euclider_eval_expr.restype = ctypes.c_double

    def run(ops, vals):
        ops = np.asarray(ops, np.int32)
        vals = np.asarray(vals, np.float64)
        vars_ = np.zeros(13, np.float64)
        return lib.euclider_eval_expr(
            ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(ops),
            vars_.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    # a well-formed program still evaluates: (2 + 3) * 4 = 20
    ok = run([0, 0, 2, 0, 4], [2.0, 3.0, 0.0, 4.0, 0.0])
    assert ok == 20.0

    # 65 consecutive const pushes would write past st[63]: NaN, not UB
    deep = run([0] * 65, [1.0] * 65)
    assert np.isnan(deep)

    # a legal peak-depth-64 program (64 pushes, then 63 adds) evaluates
    # normally — the bound applies per-push, so depth == VM_STACK is fine
    # exactly as the Python-side check_vm_depth accepts it (ADVICE r4)
    full = run([0] * 64 + [2] * 63,
               [float(i) for i in range(64)] + [0.0] * 63)
    assert full == float(sum(range(64)))

    # pops are guarded too (ADVICE r4): a raw program starting with a
    # binary op would read/write st[-1]; unary on empty is as bad; and a
    # program leaving != 1 values would return uninitialized memory
    assert np.isnan(run([2], [0.0]))           # binary underflow
    assert np.isnan(run([9], [0.0]))           # unary underflow
    assert np.isnan(run([0, 0], [1.0, 2.0]))   # two leftovers
    assert np.isnan(run([], []))               # empty program
