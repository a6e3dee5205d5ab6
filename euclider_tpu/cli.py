"""Command-line interface (reference: euclider's clap CLI, SURVEY.md §3.1).

    python -m euclider_tpu --scene config2_mirror_glass --out frame.png
    python -m euclider_tpu --scene scenes/config5_warp_portal.json \
        --size 1280x720 --backend pallas --out out.png
    python -m euclider_tpu --scene config5_warp_portal --animate 48 --orbit

Backends: lax (pure XLA), pallas (TPU megakernel), oracle (C++ scalar
ground truth), numpy (slow scalar twin).
"""
from __future__ import annotations

import argparse
import os
import sys


def _parse_size(s: str):
    try:
        w, h = s.lower().split("x")
        return int(h), int(w)
    except ValueError:
        raise SystemExit(f"error: --size wants WxH (e.g. 640x480), got {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="euclider_tpu",
        description="TPU-native differentiable non-Euclidean ray tracer")
    p.add_argument("--scene", required=True,
                   help="library scene name or path to a scene .json")
    p.add_argument("--size", default="640x480", help="WxH (default 640x480)")
    p.add_argument("--out", default="out.png", help="output PNG path")
    p.add_argument("--backend", default="lax",
                   choices=["lax", "pallas", "oracle", "numpy"])
    p.add_argument("--depth", type=int, default=None,
                   help="override max bounce depth")
    p.add_argument("--animate", type=int, default=0, metavar="N",
                   help="render N frames (orbiting camera) to out_%%04d.png")
    p.add_argument("--orbit-radius", type=float, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend for JAX")
    p.add_argument("--time", action="store_true",
                   help="print render timing and Mrays/s (RenderMeter "
                        "JSON record, utils/profiling.py)")
    p.add_argument("--time-frames", type=int, default=3,
                   help="frames to average with --time (default 3)")
    p.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="write a jax.profiler trace (TensorBoard/Perfetto) "
                        "of the timed render to DIR")
    p.add_argument("--view", action="store_true",
                   help="interactive terminal viewer (ANSI half-blocks; "
                        "wasdqe move, jl/ik/uo look, nm/,. 4D, x quit)")
    p.add_argument("--view-frames", type=int, default=None,
                   help="with --view: stop after N frames (scripted runs)")
    return p


def load_scene(spec: str):
    from .scene import jsonio, library
    if os.path.exists(spec):
        return jsonio.load_scene(spec)
    return library.get_scene(spec)


def render(scene, H, W, backend: str):
    import numpy as np
    from .scene.compile import compile_camera, compile_scene

    static, tables = compile_scene(scene)
    cam = compile_camera(scene.camera)
    if backend == "lax":
        from .ops.trace import render_image_jit
        return np.asarray(render_image_jit(static, tables, cam, H, W))
    if backend == "pallas":
        from .ops.pallas_kernel import render_image_pallas
        return np.asarray(render_image_pallas(static, tables, cam, H, W))
    if backend == "oracle":
        from .oracle.native_oracle import render_native
        return render_native(static, tables, cam, H, W)
    if backend == "numpy":
        from .oracle.cpu_oracle import render_oracle
        return render_oracle(static, tables, cam, H, W)
    raise ValueError(backend)


def save_png(img, path: str) -> None:
    import numpy as np
    arr = (np.clip(img, 0.0, 1.0) * 255).astype("uint8")
    try:
        from PIL import Image
        Image.fromarray(arr).save(path)
    except ImportError:       # stdlib fallback: minimal RGB8 PNG encoder
        _write_png_stdlib(arr, path)


def _write_png_stdlib(arr, path: str) -> None:
    """Zero-dependency PNG writer (8-bit RGB, no filtering)."""
    import struct
    import zlib

    h, w = arr.shape[:2]

    def chunk(tag, data):
        raw = tag + data
        return (struct.pack(">I", len(data)) + raw
                + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(rows, 6)))
        f.write(chunk(b"IEND", b""))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    H, W = _parse_size(args.size)
    try:
        scene = load_scene(args.scene)
    except KeyError as e:
        raise SystemExit(f"error: {e.args[0]}")
    except Exception as e:
        raise SystemExit(f"error: cannot load scene {args.scene!r}: {e}")
    if args.depth is not None:
        from dataclasses import replace
        scene = replace(scene, settings=replace(scene.settings,
                                                max_depth=args.depth))

    if args.view:
        from .viewer.simulation import Simulation
        from .viewer.terminal import run_interactive
        sim = Simulation(scene, H, W, backend=args.backend)
        n = run_interactive(sim, max_frames=args.view_frames)
        print(f"viewed {n} frames at {sim.fps:.1f} fps "
              f"({W}x{H}, backend={args.backend})")
        return 0

    if args.animate:
        from .viewer.simulation import render_orbit
        paths = render_orbit(scene, H, W, args.animate, args.out,
                             backend=args.backend,
                             radius=args.orbit_radius)
        print(f"wrote {len(paths)} frames: {paths[0]} .. {paths[-1]}")
        return 0

    img = render(scene, H, W, args.backend)   # compile + first frame
    save_png(img, args.out)
    if args.time:
        from .utils.profiling import RenderMeter, profile_trace
        meter = RenderMeter(H, W)
        with profile_trace(args.profile_dir):
            for _ in range(max(args.time_frames, 1)):
                with meter.frame():
                    img = render(scene, H, W, args.backend)
        meter.log(args.backend)
    print(f"wrote {args.out} ({W}x{H}, backend={args.backend})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
