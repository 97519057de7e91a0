from . import bsdf_ops, medium, phase_ops, scene_state, tracer  # noqa: F401
from .scene_state import (  # noqa: F401
    IlluminationArrays,
    MediumArrays,
    SceneArrays,
    SceneConfig,
    SensorArrays,
    SurfaceArrays,
)
from .tracer import render  # noqa: F401
