"""Illumination scene elements.

Mirror of ``src/eradiate/scenes/illumination/`` (factory at
``_core.py:29-36``: constant, directional, spot, astro_object).
"""

from __future__ import annotations

import attrs
import numpy as np

from ...core.frame import AzimuthConvention, angles_to_direction
from ...core.units import to_quantity
from ..core import Factory, SceneElement
from ..spectra import SolarIrradianceSpectrum, Spectrum, converter as spectrum_converter

__all__ = [
    "Illumination",
    "DirectionalIllumination",
    "AstroObjectIllumination",
    "ConstantIllumination",
    "illumination_factory",
]

illumination_factory = Factory("illumination")


def _irradiance_converter(value):
    if isinstance(value, Spectrum):
        return value
    if isinstance(value, dict):
        from ..spectra import spectrum_factory

        d = dict(value)
        d.setdefault("quantity", "irradiance")
        return spectrum_factory.convert(d)
    return spectrum_converter("irradiance")(value)


@attrs.define(eq=False, slots=False)
class Illumination(SceneElement):
    """Base illumination element."""


@attrs.define(eq=False, slots=False)
class AbstractDirectionalIllumination(Illumination):
    """Common zenith/azimuth parametrization
    (``scenes/illumination/_core.py:73``). Angles in degrees at the config
    surface."""

    zenith: float = 0.0
    azimuth: float = 0.0
    azimuth_convention: str = "east_right"
    irradiance: Spectrum = attrs.field(
        factory=SolarIrradianceSpectrum, converter=_irradiance_converter
    )

    def __attrs_post_init__(self):
        self.zenith = float(np.asarray(to_quantity(self.zenith, "deg").m_as("deg")))
        self.azimuth = float(np.asarray(to_quantity(self.azimuth, "deg").m_as("deg")))

    @property
    def direction(self) -> np.ndarray:
        """Propagation direction of the light (unit, pointing down)."""
        return angles_to_direction(
            [np.deg2rad(self.zenith), np.deg2rad(self.azimuth)],
            azimuth_convention=AzimuthConvention.convert(
                self.azimuth_convention.upper()
                if isinstance(self.azimuth_convention, str)
                else self.azimuth_convention
            ),
            flip=True,
        )[0]

    @property
    def cos_sza(self) -> float:
        return float(np.cos(np.deg2rad(self.zenith)))

    def eval_irradiance(self, w_nm) -> np.ndarray:
        return self.irradiance.eval(w_nm)


@illumination_factory.register("directional")
@attrs.define(eq=False, slots=False)
class DirectionalIllumination(AbstractDirectionalIllumination):
    """Ideal directional (delta) emitter
    (``scenes/illumination/_directional.py:19``)."""

    @property
    def cos_cutoff(self) -> float:
        return 1.0


@illumination_factory.register("astro_object")
@attrs.define(eq=False, slots=False)
class AstroObjectIllumination(AbstractDirectionalIllumination):
    """Directional emitter with finite angular diameter (sun disk);
    reference ``astroobject`` plugin
    (``scenes/illumination/_astro_object.py:17-79``)."""

    angular_diameter: float = 0.5334  # deg

    def __attrs_post_init__(self):
        super().__attrs_post_init__()
        self.angular_diameter = float(
            np.asarray(to_quantity(self.angular_diameter, "deg").m_as("deg"))
        )

    @property
    def cos_cutoff(self) -> float:
        return float(np.cos(np.deg2rad(self.angular_diameter / 2.0)))


@illumination_factory.register("constant")
@attrs.define(eq=False, slots=False)
class ConstantIllumination(Illumination):
    """Uniform sky radiance (``scenes/illumination/_constant.py:35``)."""

    radiance: Spectrum = attrs.field(
        default=1.0, converter=spectrum_converter("radiance")
    )
