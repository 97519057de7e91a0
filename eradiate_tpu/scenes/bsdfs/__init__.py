"""BSDF scene elements.

Mirror of ``src/eradiate/scenes/bsdfs/`` (factory list at
``_core.py:10-27``): declarative BSDF descriptions whose spectral parameters
compile to per-spectral-index arrays consumed by
:mod:`eradiate_tpu.ops.bsdf_ops`.
"""

from __future__ import annotations

import attrs
import numpy as np

from ..core import Factory, SceneElement
from ..spectra import Spectrum, converter as spectrum_converter

__all__ = [
    "BSDF",
    "LambertianBSDF",
    "BlackBSDF",
    "RPVBSDF",
    "CheckerboardBSDF",
    "HapkeBSDF",
    "RTLSBSDF",
    "BiLambertianBSDF",
    "OceanLegacyBSDF",
    "bsdf_factory",
]

bsdf_factory = Factory("bsdf")


def _spec(default, quantity="dimensionless"):
    return attrs.field(
        default=default, converter=spectrum_converter(quantity)
    )


@attrs.define(eq=False, slots=False)
class BSDF(SceneElement):
    """Base BSDF element."""

    #: engine dispatch key (must be supported by ops.bsdf_ops)
    kind: str = attrs.field(default=None, init=False)

    def eval_params(self, w_nm) -> dict:
        """Spectral parameter arrays for the engine: name -> [S]."""
        raise NotImplementedError


@bsdf_factory.register("lambertian")
@attrs.define(eq=False, slots=False)
class LambertianBSDF(BSDF):
    """Lambertian BSDF (reference ``diffuse`` plugin,
    ``scenes/bsdfs/_lambertian.py:44``)."""

    reflectance: Spectrum = _spec(0.5, "reflectance")
    kind: str = attrs.field(default="lambertian", init=False)

    def eval_params(self, w_nm) -> dict:
        return {"reflectance": self.reflectance.eval(w_nm)}


@bsdf_factory.register("black")
@attrs.define(eq=False, slots=False)
class BlackBSDF(BSDF):
    """Perfect absorber (``scenes/bsdfs/_black.py``)."""

    kind: str = attrs.field(default="black", init=False)

    def eval_params(self, w_nm) -> dict:
        return {}


@bsdf_factory.register("rpv")
@attrs.define(eq=False, slots=False)
class RPVBSDF(BSDF):
    """Rahman-Pinty-Verstraete BRDF (``scenes/bsdfs/_rpv.py:15-110``).

    Defaults are the reference's grassland values (Rahman 1993 Table 1).
    """

    rho_0: Spectrum = _spec(0.183)
    k: Spectrum = _spec(0.780)
    g: Spectrum = _spec(-0.1)
    rho_c: Spectrum | None = attrs.field(
        default=None,
        converter=attrs.converters.optional(spectrum_converter("dimensionless")),
    )
    kind: str = attrs.field(default="rpv", init=False)

    def eval_params(self, w_nm) -> dict:
        rho_0 = self.rho_0.eval(w_nm)
        return {
            "rho_0": rho_0,
            "k": self.k.eval(w_nm),
            "g": self.g.eval(w_nm),
            "rho_c": self.rho_c.eval(w_nm) if self.rho_c is not None else rho_0,
        }


@bsdf_factory.register("checkerboard")
@attrs.define(eq=False, slots=False)
class CheckerboardBSDF(BSDF):
    """Checkerboard two-reflectance lambertian
    (``scenes/bsdfs/_checkerboard.py:71``)."""

    reflectance_a: Spectrum = _spec(0.2, "reflectance")
    reflectance_b: Spectrum = _spec(0.8, "reflectance")
    scale_pattern: float = 2.0
    kind: str = attrs.field(default="checkerboard", init=False)

    def eval_params(self, w_nm) -> dict:
        w = np.atleast_1d(np.asarray(w_nm))
        return {
            "reflectance_a": self.reflectance_a.eval(w_nm),
            "reflectance_b": self.reflectance_b.eval(w_nm),
            "scale_pattern": np.full(w.shape, self.scale_pattern),
            "extent": np.full(w.shape, 1.0),
        }


@bsdf_factory.register("hapke")
@attrs.define(eq=False, slots=False)
class HapkeBSDF(BSDF):
    """Hapke soil photometric model (``scenes/bsdfs/_hapke.py:141``);
    parameters w, b, c, theta, B_0, h."""

    w: Spectrum = _spec(0.5)
    b: Spectrum = _spec(0.2)
    c: Spectrum = _spec(0.5)
    theta: Spectrum = _spec(np.deg2rad(30.0), "angle")
    B_0: Spectrum = _spec(0.0)
    h: Spectrum = _spec(0.0)
    kind: str = attrs.field(default="hapke", init=False)

    def eval_params(self, w_nm) -> dict:
        return {
            "w": self.w.eval(w_nm),
            "b": self.b.eval(w_nm),
            "c": self.c.eval(w_nm),
            "theta": self.theta.eval(w_nm),
            "B_0": self.B_0.eval(w_nm),
            "h": self.h.eval(w_nm),
        }


@bsdf_factory.register("rtls")
@attrs.define(eq=False, slots=False)
class RTLSBSDF(BSDF):
    """Ross-Thick Li-Sparse kernel BRDF (``scenes/bsdfs/_rtls.py``);
    parameters f_iso, f_vol, f_geo."""

    f_iso: Spectrum = _spec(0.209)
    f_vol: Spectrum = _spec(0.081)
    f_geo: Spectrum = _spec(0.004)
    kind: str = attrs.field(default="rtls", init=False)

    def eval_params(self, w_nm) -> dict:
        return {
            "f_iso": self.f_iso.eval(w_nm),
            "f_vol": self.f_vol.eval(w_nm),
            "f_geo": self.f_geo.eval(w_nm),
        }


@bsdf_factory.register("bilambertian")
@attrs.define(eq=False, slots=False)
class BiLambertianBSDF(BSDF):
    """Two-sided lambertian (leaf optics): reflectance + transmittance
    (reference ``bilambertian`` plugin, doc order ``rst_plugins.py:29-31``)."""

    reflectance: Spectrum = _spec(0.5, "reflectance")
    transmittance: Spectrum = _spec(0.0, "transmittance")
    kind: str = attrs.field(default="bilambertian", init=False)

    def eval_params(self, w_nm) -> dict:
        return {
            "reflectance": self.reflectance.eval(w_nm),
            "transmittance": self.transmittance.eval(w_nm),
        }


@bsdf_factory.register("mqdiffuse")
@attrs.define(eq=False, slots=False)
class MQDiffuseBSDF(BSDF):
    """Measured quasi-diffuse BRDF from gridded (theta_o, phi_d, theta_i)
    data (``scenes/bsdfs/_mqdiffuse.py:127``)."""

    data: np.ndarray = attrs.field(default=None)  # [Nto, Npd, Nti]
    kind: str = attrs.field(default="mqdiffuse", init=False)

    def __attrs_post_init__(self):
        self.data = np.asarray(self.data, dtype=np.float64)
        if self.data.ndim != 3:
            raise ValueError("mqdiffuse data must have shape (Nto, Npd, Nti)")

    def eval_params(self, w_nm) -> dict:
        w = np.atleast_1d(np.asarray(w_nm))
        return {
            "data": np.broadcast_to(
                self.data[None, ...], (w.size,) + self.data.shape
            ).copy()
        }


@bsdf_factory.register("maignan")
@attrs.define(eq=False, slots=False)
class MaignanBSDF(RPVBSDF):
    """Maignan (2009) polarized BRDF correction over an RPV base
    (``scenes/bsdfs/_maignan.py:105``); the scalar part equals RPV."""

    kind: str = attrs.field(default="maignan", init=False)


@bsdf_factory.register("ocean_legacy")
@attrs.define(eq=False, slots=False)
class OceanLegacyBSDF(BSDF):
    """6SV-style ocean BRDF (``scenes/bsdfs/_ocean_legacy.py:100``):
    wind-driven glint + whitecaps + underlight."""

    wind_speed: float = 0.01  # m/s
    wind_azimuth: float = 0.0  # deg
    chlorinity: float = 19.0  # g/kg
    pigmentation: float = 0.3  # mg/m^3
    shininess: float = 50.0
    kind: str = attrs.field(default="ocean_legacy", init=False)

    def eval_params(self, w_nm) -> dict:
        w = np.atleast_1d(np.asarray(w_nm))
        return {
            "wind_speed": np.full(w.shape, self.wind_speed),
            "wind_azimuth": np.full(w.shape, np.deg2rad(self.wind_azimuth)),
            "chlorinity": np.full(w.shape, self.chlorinity),
            "pigmentation": np.full(w.shape, self.pigmentation),
            "wavelength": w.astype(np.float64),
        }


@bsdf_factory.register("ocean_grasp")
@attrs.define(eq=False, slots=False)
class OceanGraspBSDF(OceanLegacyBSDF):
    """GRASP-convention ocean BRDF (``scenes/bsdfs/_ocean_grasp.py``)."""

    kind: str = attrs.field(default="ocean_grasp", init=False)


@bsdf_factory.register("ocean_mishchenko")
@attrs.define(eq=False, slots=False)
class OceanMishchenkoBSDF(OceanLegacyBSDF):
    """Mishchenko polarized ocean surface
    (``scenes/bsdfs/_ocean_mishchenko.py``); scalar reflectance shares the
    Cox-Munk glint core, the polarized Fresnel Mueller term is engine-side."""

    kind: str = attrs.field(default="ocean_mishchenko", init=False)
