"""System tests: DEM (terrain) surfaces."""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import DEMExperiment
from eradiate_tpu.scenes.surface import DEMSurface


def test_flat_dem_reduces_to_lambertian(mode_mono):
    """A zero-elevation DEM behaves like the flat lambertian surface."""
    surface = DEMSurface(
        elevation=np.zeros((17, 17)),
        x0=-5.0,
        y0=-5.0,
        dx=0.625,
        dy=0.625,
        bsdf={"type": "lambertian", "reflectance": 0.4},
    )
    exp = DEMExperiment(
        illumination={"type": "directional", "zenith": 30.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": [-30.0, 0.0, 30.0],
            "azimuth": 0.0,
            "spp": 16,
            "id": "m",
        },
        surface=surface,
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    np.testing.assert_allclose(result["brf"].values, 0.4, atol=1e-3)


def test_hill_shadowing(mode_mono):
    """A tall hill at low sun casts shadows: mean BRF drops below the flat
    value on the shaded side."""
    surface = DEMSurface.gaussian_hill(
        height_km=1.0, sigma_km=1.0, extent_km=10.0, n=65,
        bsdf={"type": "lambertian", "reflectance": 0.5},
    )
    exp = DEMExperiment(
        illumination={"type": "directional", "zenith": 70.0, "azimuth": 0.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": [0.0],
            "azimuth": 0.0,
            "spp": 256,
            "id": "m",
            # target on the anti-solar flank of the hill (sun from +x):
            # the local normal tilts away from the sun
            "target": {"type": "point", "xyz": [-1.0, 0.0, 0.6]},
        },
        surface=surface,
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    brf = float(result["brf"].values[0, 0])
    assert 0.0 <= brf < 0.45  # darker than the flat-surface value 0.5
