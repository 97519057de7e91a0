"""System test: measured Lambertian BRF equals the surface reflectance.

Mirror of the reference oracle
(``tests/02_system/test_onedim_lambertian_brf.py:11-82``): no atmosphere,
Lambertian surface, hplane multi-distant measure, spp=1; BRF must equal the
reflectance input for all illumination/viewing angles.
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


@pytest.mark.parametrize("illumination_zenith", [0.0, 30.0, 60.0])
def test_onedim_lambertian_brf(mode_mono_double, illumination_zenith):
    n_vza = 51
    for reflectance in [1.0, 0.7, 0.5, 0.3, 0.0]:
        exp = AtmosphereExperiment(
            illumination={
                "type": "directional",
                "zenith": illumination_zenith,
                "azimuth": 0.0,
            },
            measures={
                "type": "mdistant",
                "id": "toa_pplane",
                "construct": "hplane",
                "zeniths": np.linspace(-89, 89, n_vza),
                "azimuth": 0.0,
                "spp": 1,
            },
            surface={"type": "lambertian", "reflectance": reflectance},
            atmosphere=None,
        )
        result = eradiate_tpu.run(exp)
        assert result is exp.results["toa_pplane"]
        np.testing.assert_allclose(
            result["brf"].values, reflectance, atol=1e-5
        )
        # angular metadata present
        assert "vza" in result["brf"].coords
        np.testing.assert_allclose(
            result["brf"].coords["vza"], np.linspace(-89, 89, n_vza)
        )
