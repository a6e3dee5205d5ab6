"""The simulation / interaction loop (reference: Simulation::start,
``src/simulation.rs``; SURVEY.md §3.2).

The reference's per-frame loop is: poll events -> camera.update -> render ->
blit to an SDL2 window.  The TPU-native equivalent renders frames on device
and **gathers them asynchronously to the host** (double-buffered: frame N+1
is dispatched before frame N's device_get completes), replacing the SDL2
texture upload.  Display sinks are pluggable; the headless default writes
PNGs.  Input comes from a key-event callback (an interactive terminal or GUI
can feed the same Simulation object; this container is headless).

Controls mirror euclider: WASD+QE translation, mouse-look yaw/pitch, and
the 4D extra rotations (w_yaw / w_pitch) for 4D scenes.
"""
from __future__ import annotations

import time
from typing import Callable, List, Optional

import numpy as np

from ..models import camera as camctl
from ..scene.compile import compile_camera, compile_scene

KEY_STEP = 0.25
LOOK_STEP = 0.05


class Simulation:
    """Per-frame loop driving camera + renderer + async host gather."""

    def __init__(self, scene, H: int = 360, W: int = 640,
                 backend: str = "lax",
                 on_frame: Optional[Callable[[np.ndarray, int], None]] = None):
        self.scene = scene
        self.static, self.tables = compile_scene(scene)
        self.cam = compile_camera(scene.camera)
        self.H, self.W = H, W
        self.backend = backend
        self.on_frame = on_frame
        self.frame_times: List[float] = []
        self.time = 0.0          # scene time handed to the renderer
        self.time_step = 0.0     # per-frame increment (animated materials)
        self._render = self._make_render()
        self._pending = None  # device array in flight (double buffer)

    def _make_render(self):
        if self.backend == "pallas":
            from ..ops.pallas_kernel import render_image_pallas

            return lambda cam, t: render_image_pallas(
                self.static, self.tables, cam, self.H, self.W, time=t)
        from ..ops.trace import render_image_jit

        return lambda cam, t: render_image_jit(
            self.static, self.tables, cam, self.H, self.W, False, t)

    # -- input handling (the camera.update of the reference) ----------------
    def handle_keys(self, keys: str) -> None:
        """Apply a batch of key presses: 'w a s d q e' move, 'jl' yaw,
        'ik' pitch, 'uo' roll, 'nm' w-yaw, ',.' w-pitch."""
        dx = dy = dz = 0.0
        yaw = pitch = roll = w_yaw = w_pitch = 0.0
        for k in keys:
            if k == "w":
                dz += KEY_STEP
            elif k == "s":
                dz -= KEY_STEP
            elif k == "a":
                dx -= KEY_STEP
            elif k == "d":
                dx += KEY_STEP
            elif k == "q":
                dy -= KEY_STEP
            elif k == "e":
                dy += KEY_STEP
            elif k == "j":
                yaw -= LOOK_STEP
            elif k == "l":
                yaw += LOOK_STEP
            elif k == "i":
                pitch += LOOK_STEP
            elif k == "k":
                pitch -= LOOK_STEP
            elif k == "u":
                roll -= LOOK_STEP
            elif k == "o":
                roll += LOOK_STEP
            elif k == "n":
                w_yaw -= LOOK_STEP
            elif k == "m":
                w_yaw += LOOK_STEP
            elif k == ",":
                w_pitch -= LOOK_STEP
            elif k == ".":
                w_pitch += LOOK_STEP
        if dx or dy or dz:
            self.cam = camctl.translate(self.cam, dx, dy, dz)
        if yaw or pitch or roll or w_yaw or w_pitch:
            self.cam = camctl.rotate(self.cam, yaw, pitch, roll,
                                     w_yaw, w_pitch)

    def mouse_look(self, du: float, dv: float) -> None:
        self.cam = camctl.rotate(self.cam, yaw=du * LOOK_STEP,
                                 pitch=-dv * LOOK_STEP)

    # -- frame loop ---------------------------------------------------------
    def step(self, frame_idx: int = 0) -> np.ndarray:
        """Render one frame; async double-buffered host gather."""
        t0 = time.time()
        dev = self._render(self.cam, self.time)  # dispatch (non-blocking)
        self.time += self.time_step
        prev = self._pending
        self._pending = dev
        if prev is not None:
            img = np.asarray(prev)          # gather previous frame
        else:
            img = np.asarray(dev)
        self.frame_times.append(time.time() - t0)
        if self.on_frame is not None:
            self.on_frame(img, frame_idx)
        return img

    def flush(self) -> np.ndarray:
        """Gather the last in-flight frame."""
        if self._pending is None:
            raise RuntimeError("no frame in flight")
        img = np.asarray(self._pending)
        self._pending = None
        return img

    def run(self, n_frames: int,
            script: Optional[Callable[["Simulation", int], None]] = None):
        """Run the loop n_frames times; `script` plays the role of the event
        poll (it may call handle_keys / mouse_look)."""
        for i in range(n_frames):
            if script is not None:
                script(self, i)
            self.step(i)
        return self.flush()

    @property
    def fps(self) -> float:
        if not self.frame_times:
            return 0.0
        return 1.0 / (sum(self.frame_times) / len(self.frame_times))


def render_orbit(scene, H, W, n_frames: int, out_pattern: str,
                 backend: str = "lax", radius: Optional[float] = None):
    """Offline orbit animation -> PNG sequence (out.png -> out_0000.png...)."""
    from ..cli import save_png

    base = out_pattern[:-4] if out_pattern.endswith(".png") else out_pattern
    ents = scene.entities
    center = (0.0, 0.0, -4.0)
    for e in ents:
        from ..scene import ir
        if isinstance(e.shape, ir.Sphere):
            center = e.shape.center[:3]
            break

    paths = []
    sim = Simulation(scene, H, W, backend)
    for i in range(n_frames):
        sim.cam = camctl.orbit(sim.cam, center, 2 * np.pi / n_frames * (i > 0))
        img = sim.step(i)
        p = f"{base}_{i:04d}.png"
        save_png(img, p)
        paths.append(p)
    return paths
