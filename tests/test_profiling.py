"""utils/profiling.py (RenderMeter, profile_trace) and utils/validate.py
(oracle gates) — the observability layer (SURVEY.md §5 metrics/logging)
wired into cli --time, bench.py and tools/perfprobe.py."""
import json

import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.utils.profiling import RenderMeter, profile_trace
from euclider_tpu.utils.validate import assert_oracle_match, oracle_check


def test_render_meter_frames_and_add():
    m = RenderMeter(100, 200, n_chips=2)
    with m.frame():
        pass
    m.add(0.4, frames=4)            # 4 frames at 0.1 s each
    assert len(m.times) == 5
    assert np.isclose(sum(m.times[1:]), 0.4)
    r = m.report("unit")
    assert r["label"] == "unit"
    assert r["frames"] == 5
    assert r["resolution"] == "200x100"
    assert r["mrays_per_s"] > 0
    assert np.isclose(r["mrays_per_s_per_chip"], r["mrays_per_s"] / 2,
                      atol=0.02)
    json.dumps(r)                   # the log() record is valid JSON


def test_render_meter_empty():
    m = RenderMeter(10, 10)
    assert m.mrays_per_sec() == 0.0
    assert m.report()["ms_per_frame"] is None


def test_profile_trace_noop_and_real(tmp_path):
    with profile_trace(None):
        x = 1 + 1
    assert x == 2
    import jax.numpy as jnp
    with profile_trace(str(tmp_path)):
        float(jnp.arange(8.0).sum())
    assert any(tmp_path.iterdir()), "trace wrote nothing"


def _lax_render(st, t, c, h, w, tm):
    return et.render_image_jit(st, t, c, h, w, False, tm)


def test_oracle_check_passes_on_good_backend(compiled_scenes):
    _, static, tables, cam = compiled_scenes["config1_sphere_room"]
    frac, maxerr = oracle_check(static, tables, cam, _lax_render, 24, 32)
    assert frac >= 0.99, (frac, maxerr)
    assert_oracle_match(static, tables, cam, _lax_render, 24, 32,
                        label="config1")


def test_oracle_gate_fails_loudly(compiled_scenes):
    _, static, tables, cam = compiled_scenes["config1_sphere_room"]

    def broken(st, t, c, h, w, tm):
        return np.zeros((h, w, 3), np.float32)

    with pytest.raises(AssertionError, match="correctness gate FAILED"):
        assert_oracle_match(static, tables, cam, broken, 24, 32,
                            label="broken")


def test_cli_time_uses_render_meter(tmp_path, capsys):
    from euclider_tpu.cli import main
    out = tmp_path / "t.png"
    rc = main(["--scene", "config1_sphere_room", "--size", "32x24",
               "--out", str(out), "--time", "--time-frames", "2", "--cpu"])
    assert rc == 0
    cap = capsys.readouterr()
    rec = json.loads([ln for ln in cap.out.splitlines()
                      if ln.startswith("{")][0])
    assert rec["frames"] == 2
    assert rec["mrays_per_s"] > 0
