"""euclider_tpu — a TPU-native differentiable non-Euclidean ray tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Limeth/euclider reference (interactive CPU ray tracer, generic over 3D/4D,
non-Euclidean spaces via materials) re-designed TPU-first:

  * scenes compile to static topology + differentiable parameter tables
    (scene.ir / scene.compile),
  * the recursive per-pixel trace becomes a masked DFS-stack loop
    (ops.trace), with warped-space propagation as a bounded march
    (ops.march),
  * frames render via a pure-lax backend or a tiled Pallas megakernel
    (ops.pallas_kernel), sharded over device meshes (parallel),
  * everything is jax.grad-able for inverse rendering (train.inverse),
  * scalar NumPy and C++ oracles pin the exact semantics (oracle/).

See docs/SEMANTICS.md for the precise trace contract and SURVEY.md for the
reference layer map this framework mirrors.
"""

from .scene import ir
from .scene.compile import (CameraParams, SceneStatic, SceneTables,
                            cast_camera, cast_tables, compile_camera,
                            compile_scene)
from .scene.library import ACCEPTANCE, get_scene
from .ops.trace import render_image, render_image_jit, render_rays

__version__ = "0.1.0"
