from . import ir
from .compile import (CameraParams, SceneStatic, SceneTables, compile_camera,
                      compile_scene)
from .library import ACCEPTANCE, BUILDERS, get_scene
