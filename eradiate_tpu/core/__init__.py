from . import frame, modes, quad, rng, units, warp  # noqa: F401
from .modes import mode, set_mode  # noqa: F401
from .units import ureg  # noqa: F401
