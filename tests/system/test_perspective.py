"""System tests: perspective camera measure.

Oracle: for a lambertian surface with no atmosphere, the surface-leaving
radiance is rho * E * cos(sza) / pi independently of the viewing ray, so
every camera pixel that hits the ground sees the same value (reference
``perspective`` plugin semantics, ``scenes/measure/_perspective.py:19``).
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment, CanopyExperiment
from eradiate_tpu.scenes.measure import PerspectiveCameraMeasure


def test_perspective_lambertian_uniform(mode_mono):
    rho, sza = 0.4, 30.0
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": sza, "irradiance": 1.0},
        measures={
            "type": "perspective",
            "origin": [0.0, 0.0, 1.0],
            "target": [0.0, 0.0, 0.0],
            "up": [0.0, 1.0, 0.0],
            "fov": 40.0,
            "film_resolution": (8, 6),
            "spp": 8,
            "id": "cam",
        },
        surface={"type": "lambertian", "reflectance": rho},
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    rad = result["radiance"].values
    assert rad.shape == (1, 48)
    expected = rho * np.cos(np.deg2rad(sza)) / np.pi
    np.testing.assert_allclose(rad, expected, rtol=1e-5)
    # film pixel coordinates attached
    assert "film_x" in result["radiance"].coords
    assert "film_y" in result["radiance"].coords
    assert np.asarray(result["radiance"].coords["film_x"]).max() == 7
    assert np.asarray(result["radiance"].coords["film_y"]).max() == 5


def test_perspective_directions_geometry():
    """Camera basis: central ray looks along target - origin; fov along the
    film width axis."""
    m = PerspectiveCameraMeasure(
        origin=[0.0, 0.0, 2.0],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov=60.0,
        film_resolution=(64, 32),
    )
    d = m.sensor_directions()  # toward the sensor
    assert d.shape == (64 * 32, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)
    # all rays point downward into the scene -> sensor directions point up
    assert (d[:, 2] > 0).all()
    # corner half-angle: atan(hypot(tan(fov/2), tan(fov/2) * h/w)) at pixel
    # centers — analytically 32.34 deg for fov=60, film 64x32
    mu = d[:, 2]
    max_angle = np.rad2deg(np.arccos(mu.min()))
    np.testing.assert_allclose(max_angle, 32.34, atol=0.1)


def test_perspective_validators():
    with pytest.raises(ValueError):
        PerspectiveCameraMeasure(origin=[0, 0, 1], target=[0, 0, 1])
    with pytest.raises(ValueError):
        PerspectiveCameraMeasure(
            origin=[0, 0, 1], target=[0, 0, 0], up=[0, 0, 1]
        )


def test_perspective_in_canopy_scene(mode_mono):
    """Camera inside a canopy scene: runs end-to-end and returns finite
    radiance (camera rays honor ray_offset = 0 via the canopy tracer)."""
    exp = CanopyExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "perspective",
            "origin": [0.0, 0.0, 0.05],
            "target": [0.0, 0.0, 0.0],
            "up": [0.0, 1.0, 0.0],
            "fov": 70.0,
            "film_resolution": (8, 8),
            "spp": 16,
            "id": "cam",
        },
        surface={"type": "lambertian", "reflectance": 0.3},
        canopy={
            "type": "leaf_cloud",
            "construct": "cuboid",
            "n_leaves": 200,
            "leaf_radius": 0.05,
            "l_horizontal": 10.0,
            "l_vertical": 2.0,
            "leaf_reflectance": 0.45,
            "leaf_transmittance": 0.02,
        },
    )
    result = eradiate_tpu.run(exp)
    rad = result["radiance"].values
    assert np.isfinite(rad).all()
    assert (rad >= 0).all()
    assert rad.max() > 0.0
