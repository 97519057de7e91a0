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


def test_mdistant_insitu_ray_offset(mode_mono):
    """In-atmosphere sensor (ray_offset): an mdistant sensor placed just
    above the surface under a thick absorbing atmosphere sees the surface
    almost unattenuated, unlike the TOA sensor (mirror of
    ``tests/02_system/test_mdistant_insitu.py``)."""
    from eradiate_tpu.physics.radprofile import ArrayRadProfile
    from eradiate_tpu.scenes.atmosphere import atmosphere_factory
    import numpy as np

    atm = {
        "type": "homogeneous",
        "top": 10.0,
        "sigma_s": 0.0,
        "sigma_a": 0.2,  # tau = 2: strong extinction
        "phase": {"type": "rayleigh"},
    }
    base = dict(
        illumination={"type": "directional", "zenith": 0.0},
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere=dict(atm),
    )
    import eradiate_tpu
    from eradiate_tpu.experiments import AtmosphereExperiment

    def run(ray_offset):
        m = {
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": [0.0],
            "azimuth": 0.0,
            "spp": 2048,
            "id": "m",
        }
        if ray_offset is not None:
            m["ray_offset"] = ray_offset
        exp = AtmosphereExperiment(measures=m, **{k: (dict(v) if isinstance(v, dict) else v) for k, v in base.items()})
        return float(eradiate_tpu.run(exp)["radiance"].values[0, 0])

    L_toa = run(None)
    L_insitu = run(0.05)  # 50 m above the surface
    # in-situ sensor skips the view-path extinction of tau=2 (factor e^2);
    # sun attenuation still applies to both
    assert L_insitu > 3.0 * L_toa
