"""Terminal display backend: ANSI framing, scripted interactive loop, and
the stdlib PNG fallback encoder (viewer/terminal.py, cli.save_png)."""
import io
import os

import numpy as np

import euclider_tpu as et
from euclider_tpu.viewer.simulation import Simulation
from euclider_tpu.viewer.terminal import frame_to_ansi, run_interactive


def _img():
    rng = np.random.RandomState(0)
    return rng.rand(32, 48, 3).astype(np.float32)


def test_frame_to_ansi_shape_and_colors():
    s = frame_to_ansi(_img(), cols=24, rows=8)
    lines = s.split("\n")
    assert len(lines) == 8
    assert "▀" in s
    assert "\x1b[38;2;" in s and "\x1b[48;2;" in s  # truecolor fg + bg
    # every line resets attributes
    assert all(line.endswith("\x1b[0m") for line in lines)


def test_frame_to_ansi_extremes():
    img = np.zeros((8, 8, 3), np.float32)
    img[0] = 10.0    # clipping
    img[1] = -3.0
    s = frame_to_ansi(img, cols=8, rows=4)
    assert "255;255;255" in s and "0;0;0" in s


def test_run_interactive_scripted():
    """Headless scripted run: stdin is not a tty, so the loop renders
    max_frames frames and returns."""
    sc = et.get_scene("config1_sphere_room")
    sim = Simulation(sc, H=24, W=32, backend="lax")
    out = io.StringIO()
    n = run_interactive(sim, max_frames=3, out=out)
    assert n == 3
    assert "fps" in out.getvalue()


def test_stdlib_png_roundtrip(tmp_path):
    from euclider_tpu.cli import _write_png_stdlib
    from PIL import Image

    img = (_img() * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    _write_png_stdlib(img, p)
    back = np.asarray(Image.open(p).convert("RGB"))
    assert back.shape == img.shape
    assert (back == img).all()


def test_save_ansi(tmp_path):
    from euclider_tpu.viewer.terminal import save_ansi
    p = str(tmp_path / "frame.ans")
    save_ansi(_img(), p, cols=16, rows=6)
    assert os.path.getsize(p) > 100


def test_mouse_parser_drag_and_keys():
    """SGR mouse sequences become look deltas; everything else stays keys
    (VERDICT r2 #6: the mouse-look input path, fed by xterm reporting)."""
    from euclider_tpu.viewer.terminal import MouseParser

    mp = MouseParser()
    # press at (10,5), drag to (13,4) then (13,7), release; 'w' key mixed in
    data = ("w\x1b[<0;10;5M"          # left press
            "\x1b[<32;13;4M"          # drag motion
            "a\x1b[<32;13;7M"         # drag motion
            "\x1b[<0;13;7m")          # release
    keys, moves = mp.parse(data)
    assert keys == "wa"
    assert moves == [(3, -1), (0, 3)]
    # after release, motion without a press is anchored fresh (no jump)
    keys, moves = mp.parse("\x1b[<32;20;20M")
    assert moves == []
    keys, moves = mp.parse("\x1b[<32;22;21M")
    assert moves == [(2, 1)]


def test_mouse_look_turns_camera():
    sc = et.get_scene("config1_sphere_room")
    sim = Simulation(sc, H=8, W=12, backend="lax")
    f0 = np.asarray(sim.cam.forward).copy()
    sim.mouse_look(4, 0)
    f1 = np.asarray(sim.cam.forward)
    assert np.abs(f1 - f0).max() > 1e-3
