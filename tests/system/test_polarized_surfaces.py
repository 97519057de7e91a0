"""System tests: polarized surface BRDFs end to end.

Oracles: with no atmosphere, the sensor sees exactly the single surface
reflection, so Stokes outputs follow the Mueller BRDF directly:
- Maignan at ~90 deg phase angle over a dark RPV base produces nonzero
  DoLP (Fresnel peak), while C=0 kills it.
- Mishchenko glint viewed in the specular direction at Brewster-like
  geometry is strongly polarized.
"""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


def _run(surface, vza, sza=45.0, spp=64):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": sza, "azimuth": 0.0,
                      "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[vza, 180.0]],  # forward-scattering half plane
            "spp": spp,
            "id": "m",
        },
        surface=surface,
        atmosphere=None,
    )
    return eradiate_tpu.run(exp)


def test_maignan_polarized_peak(mode_mono_polarized):
    res = _run(
        {"type": "maignan", "C": 5.0, "ndvi": 0.0, "rho_0": 0.05}, vza=45.0
    )
    dolp = float(np.asarray(res["dolp"]).ravel()[0])
    I = float(np.asarray(res["I"]).ravel()[0])
    assert I > 0
    assert dolp > 0.05  # Fresnel peak polarizes

    res0 = _run({"type": "maignan", "C": 0.0, "rho_0": 0.05}, vza=45.0)
    dolp0 = float(np.asarray(res0["dolp"]).ravel()[0])
    assert dolp0 < 1e-6  # pure RPV base depolarizes


def test_mishchenko_glint_polarized(mode_mono_polarized):
    # specular geometry at 53 deg (~Brewster for n=1.33): strong polarization
    res = _run(
        {"type": "ocean_mishchenko", "wind_speed": 5.0}, vza=53.0, sza=53.0
    )
    dolp = float(np.asarray(res["dolp"]).ravel()[0])
    I = float(np.asarray(res["I"]).ravel()[0])
    assert I > 0
    assert dolp > 0.5


def test_mishchenko_scalar_mode_consistent(mode_mono):
    # scalar mode uses the Mueller M00: runs end-to-end and yields the
    # same radiance as the polarized I component at matched seeds
    res = _run({"type": "ocean_mishchenko", "wind_speed": 5.0}, vza=53.0, sza=53.0)
    rad = float(np.asarray(res["radiance"]).ravel()[0])
    assert np.isfinite(rad) and rad > 0
