from . import absorption, radprofile, rayleigh, thermoprops, zgrid  # noqa: F401
from .radprofile import ArrayRadProfile, AtmosphereRadProfile, RadProfile  # noqa: F401
from .zgrid import ZGrid  # noqa: F401
