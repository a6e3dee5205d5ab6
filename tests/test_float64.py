"""f32/f64 genericity of the lax render path (reference CustomFloat axis,
SURVEY.md L0): the same traced program runs in double precision when the
tables/camera arrays are f64.

Runs in a subprocess with JAX_ENABLE_X64=1 so the x64 flag never leaks into
the rest of the suite.
"""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""
    import os
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import euclider_tpu as et
    from euclider_tpu.oracle.cpu_oracle import render_oracle

    # grad_probe: smooth UV-dependent colors + reflections, so pixel values
    # involve real arithmetic (config1 colors are flat table constants that
    # every precision reproduces exactly)
    H, W = 12, 20
    sc = et.get_scene("grad_probe")
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)

    t64 = et.cast_tables(tables, np.float64)
    c64 = et.cast_camera(cam, np.float64)
    img64 = np.asarray(et.render_image(static, t64, c64, H, W))
    assert img64.dtype == np.float64, img64.dtype

    gold = render_oracle(static, tables, cam, H, W)
    err64 = np.abs(img64 - gold).max()
    # f64 vs the f64 scalar oracle: transcendental parity is capped by the
    # shared Mosaic-safe atan polynomial (~2e-9); everything else is exact
    # to f64 roundoff away from decision boundaries
    assert err64 < 1e-6, f"f64 err {err64}"

    img32 = np.asarray(et.render_image(static, tables, cam, H, W))
    err32 = np.abs(img32.astype(np.float64) - gold).max()
    assert err64 < err32, (err64, err32)  # doubling precision must help
    print(f"OK err64={err64:.2e} err32={err32:.2e}")
""")


def test_render_float64_subprocess():
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", SCRIPT], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
