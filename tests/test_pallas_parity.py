"""Pallas megakernel parity vs the lax backend (SURVEY.md §4.5).

The kernel shares ops.trace.trace_batch verbatim with the lax backend, but
runs under Mosaic lowering rules (tile grids, SMEM camera path, VMEM table
blocks).  interpret=True executes the same kernel program on CPU, so any
divergence is a kernel-plumbing bug, not a numerics question.

Also locks the value-exactness of static branch pruning: the
non-differentiable path elides transmission/reflection branches whose IR
weights are exactly zero, so it must agree with the unpruned differentiable
path to float32 roundoff.
"""
import numpy as np
import pytest

import euclider_tpu as et
from euclider_tpu.ops.pallas_kernel import render_image_pallas

from conftest import assert_images_close

H, W = 16, 128   # one (8, 128) tile pair — keeps interpret mode fast


@pytest.mark.parametrize("name", [
    "config1_sphere_room",
    "config2_mirror_glass",
    "config3_csg_textured",    # exercises the gather-free matmul texture path
    "config4_hypersphere",
    "config5_warp_portal",     # march + portal branch (ops/trace.py portals)
])
def test_pallas_interpret_matches_lax(compiled_scenes, name):
    _, static, tables, cam = compiled_scenes[name]
    lax_img = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    pal_img = np.asarray(render_image_pallas(
        static, tables, cam, H, W, (8, 128), "while", True))
    assert_images_close(lax_img, pal_img, atol=1e-5,
                        msg=f"pallas-vs-lax {name}")


@pytest.mark.parametrize("name", [
    "config1_sphere_room",     # fully pruned: depth-1, opaque, some refl
    "config2_mirror_glass",    # transmit + reflect both live
    "config5_warp_portal",     # march + portal; alpha-0 surfaces
])
def test_pruned_forward_matches_differentiable(compiled_scenes, name):
    """Static branch pruning must be value-exact: the elided branches carry
    weight exactly 0, so pruned (differentiable=False) and unpruned
    (differentiable=True) renders agree to roundoff."""
    _, static, tables, cam = compiled_scenes[name]
    a = np.asarray(et.render_image_jit(static, tables, cam, H, W, False))
    b = np.asarray(et.render_image_jit(static, tables, cam, H, W, True))
    assert_images_close(a, b, atol=1e-5, msg=f"prune-exactness {name}")
