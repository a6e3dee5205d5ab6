"""Scene JSON round-trip + CLI entry tests (SURVEY §2.1 CLI/scene loading)."""
import os

import numpy as np
import jax
import pytest

import euclider_tpu as et
from euclider_tpu.scene import jsonio
from euclider_tpu.scene.library import BUILDERS


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_json_roundtrip_compiles_identically(name, tmp_path):
    sc = BUILDERS[name]()
    p = str(tmp_path / f"{name}.json")
    jsonio.save_scene(sc, p)
    sc2 = jsonio.load_scene(p)
    s1, t1 = et.compile_scene(sc)
    s2, t2 = et.compile_scene(sc2)
    assert s1 == s2
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_shipped_scene_files_load():
    root = os.path.join(os.path.dirname(__file__), "..", "scenes")
    files = [f for f in os.listdir(root) if f.endswith(".json")]
    assert len(files) >= 6
    for f in files:
        sc = jsonio.load_scene(os.path.join(root, f))
        static, tables = et.compile_scene(sc)
        assert len(static.entities) >= 0


def test_texture_file_reference(tmp_path):
    """Scenes can reference image files for textures ({"file": path} —
    reference MappedTexture image loading, SURVEY §2.1 Surfaces)."""
    import json

    from PIL import Image

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    Image.fromarray(px).save(tmp_path / "tex.png")

    sc = et.get_scene("config3_csg_textured")
    d = jsonio.scene_to_dict(sc)
    d["textures"] = [{"file": "tex.png"}]    # relative to the scene file
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(d))

    sc2 = jsonio.load_scene(str(p))
    tex = np.asarray(sc2.textures[0], np.float32)
    assert tex.shape == (8, 10, 3)
    assert np.allclose(tex, px.astype(np.float32) / 255.0, atol=1e-6)
    static, tables = et.compile_scene(sc2)   # and it compiles + renders
    cam = et.compile_camera(sc2.camera)
    img = np.asarray(et.render_image_jit(static, tables, cam, 8, 16))
    assert np.isfinite(img).all()


def test_cli_renders_png(tmp_path):
    from euclider_tpu.cli import main
    out = str(tmp_path / "x.png")
    rc = main(["--scene", "config1_sphere_room", "--size", "32x24",
               "--out", out, "--backend", "numpy"])
    assert rc == 0 and os.path.exists(out)
    from PIL import Image
    assert Image.open(out).size == (32, 24)
