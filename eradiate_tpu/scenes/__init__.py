from . import (  # noqa: F401
    atmosphere,
    bsdfs,
    geometry,
    illumination,
    integrators,
    measure,
    phase,
    spectra,
    surface,
)
from .core import Factory, SceneElement  # noqa: F401
