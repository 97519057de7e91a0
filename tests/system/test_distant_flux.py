"""System tests: hemispherical-distant and distant-flux measures.

Oracle: for a lambertian surface with no atmosphere, the distant-flux
albedo equals the reflectance, and the hdistant radiance map is uniform.
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


def test_distant_flux_albedo_lambertian(mode_mono):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0},
        measures={
            "type": "distant_flux",
            "film_resolution": (16, 16),
            "spp": 8,
            "id": "flux",
        },
        surface={"type": "lambertian", "reflectance": 0.35},
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    assert "albedo" in result and "radiosity" in result
    np.testing.assert_allclose(result["albedo"].values, 0.35, rtol=5e-3)


def test_hdistant_uniform_radiance(mode_mono):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 0.0},
        measures={
            "type": "hdistant",
            "film_resolution": (8, 8),
            "spp": 4,
            "id": "hemi",
        },
        surface={"type": "lambertian", "reflectance": 0.6},
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    rad = result["radiance"].values
    assert rad.shape == (1, 64)
    # lambertian: radiance independent of viewing direction
    np.testing.assert_allclose(rad, rad[0, 0], rtol=1e-4)


def test_mradiancemeter_runs(mode_mono):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0},
        measures={
            "type": "mradiancemeter",
            "origins": [[0.0, 0.0, 120.0]],
            "directions": [[0.0, 0.0, -1.0]],
            "spp": 8,
            "id": "rm",
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    np.testing.assert_allclose(result["brf"].values, 0.5, atol=1e-4)
