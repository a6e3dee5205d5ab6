"""Camera controls + simulation loop tests (SURVEY §3.2 per-frame loop)."""
import numpy as np

import euclider_tpu as et
from euclider_tpu.models import camera as camctl
from euclider_tpu.viewer.simulation import Simulation


def test_translate_moves_in_frame():
    cam = et.compile_camera(et.ir.Camera(position=(0, 0, 0),
                                         forward=(0, 0, -1)))
    cam2 = camctl.translate(cam, dz=2.0)
    assert np.allclose(cam2.position, [0, 0, -2, 0], atol=1e-6)
    cam3 = camctl.translate(cam, dx=1.0, dy=0.5)
    assert np.allclose(cam3.position, [1, 0.5, 0, 0], atol=1e-6)


def test_rotate_yaw_preserves_orthonormality():
    cam = et.compile_camera(et.ir.Camera())
    cam2 = camctl.rotate(cam, yaw=0.3, pitch=-0.2, roll=0.1)
    f, u, r = (np.asarray(cam2.forward), np.asarray(cam2.up),
               np.asarray(cam2.right))
    for a, b in [(f, u), (f, r), (u, r)]:
        assert abs(np.dot(a, b)) < 1e-5
    for v in (f, u, r):
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-5)


def test_rotate_4d_tilts_into_w():
    cam = et.compile_camera(et.ir.Camera(position=(0, 0, 0, 0)))
    cam2 = camctl.rotate(cam, w_yaw=0.4)
    assert abs(np.asarray(cam2.forward)[3]) > 0.1


def test_look_at_aims():
    cam = camctl.look_at((0, 0, 0), (0, 0, -5))
    assert np.allclose(np.asarray(cam.forward), [0, 0, -1, 0], atol=1e-6)


def test_simulation_loop_runs_and_camera_motion_changes_frame():
    sc = et.get_scene("config1_sphere_room")
    frames = []
    sim = Simulation(sc, H=16, W=32,
                     on_frame=lambda img, i: frames.append(img.copy()))
    def script(s, i):
        if i == 1:
            s.handle_keys("wwl")
    sim.run(3, script)
    assert len(frames) == 3
    assert np.abs(frames[0] - frames[2]).max() > 1e-3  # moved -> changed
    assert sim.fps > 0


def test_checkpoint_roundtrip(tmp_path):
    from euclider_tpu.utils import checkpointing as ck
    sc = et.get_scene("grad_probe")
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    params = {"tables": tables, "cam": cam}
    path = str(tmp_path / "ckpt")
    ck.save(path, params)
    back = ck.restore(path, like=params)
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
