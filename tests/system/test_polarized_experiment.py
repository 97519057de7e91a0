"""System test: polarized mode end to end (Stokes + DoLP outputs)."""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


def test_polarized_rayleigh_experiment(mode_mono_polarized):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 60.0, "azimuth": 0.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": np.linspace(-75, 75, 7),
            "azimuth": 0.0,
            "spp": 2048,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.05},
        atmosphere={"type": "molecular"},
    )
    result = eradiate_tpu.run(exp)
    for name in ("I", "Q", "U", "V", "dolp", "brf", "radiance"):
        assert name in result, name
    I = result["I"].values
    dolp = result["dolp"].values
    assert np.all(I > 0)
    assert np.all((dolp >= 0) & (dolp <= 1.0 + 1e-6))
    # polarization must be significant somewhere in the principal plane for
    # a Rayleigh atmosphere over a dark surface
    assert dolp.max() > 0.2
    # radiance equals Stokes I
    np.testing.assert_allclose(result["radiance"].values, I, rtol=1e-6)


def test_unpolarized_mode_has_no_stokes(mode_mono):
    exp = AtmosphereExperiment(
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": [0.0],
            "azimuth": 0.0,
            "spp": 8,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    assert "I" not in result
    assert "dolp" not in result
