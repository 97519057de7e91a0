"""System tests: spot (point-source) illumination.

Oracles (reference ``spot`` plugin semantics,
``scenes/illumination/_spot.py``):
- Lambertian ground seen by a camera: L = rho/pi * I cos(theta) / r^2 at
  points inside the beam cone, 0 outside.
- Moving the spot twice as far (same axis) divides the in-beam radiance
  by ~4 (inverse-square), modulo the cosine factor.
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import CanopyExperiment
from eradiate_tpu.scenes.illumination import SpotIllumination


def _run(origin_z_km, beam_width=30.0, rho=0.6):
    exp = CanopyExperiment(
        illumination={
            "type": "spot",
            "origin": [0.0, 0.0, origin_z_km],
            "target": [0.0, 0.0, 0.0],
            "beam_width": beam_width,
            "intensity": 1.0,
        },
        measures={
            "type": "perspective",
            "origin": [0.0, 0.0, 0.05],
            "target": [0.0, 0.0, 0.0],
            "up": [0.0, 1.0, 0.0],
            "fov": 60.0,
            "film_resolution": (9, 9),
            "spp": 8,
            "id": "cam",
        },
        surface={"type": "lambertian", "reflectance": rho},
        canopy={
            "type": "leaf_cloud",
            "construct": "cuboid",
            "n_leaves": 1,
            "leaf_radius": 1e-7,
            "l_horizontal": 1.0,
            "l_vertical": 0.5,
        },
    )
    return eradiate_tpu.run(exp)


def test_spot_inverse_square_and_center_value(mode_mono):
    rho = 0.6
    h = 0.1  # km
    res1 = _run(h)
    rad1 = np.asarray(res1["radiance"]).reshape(9, 9)
    center1 = rad1[4, 4]
    # center pixel looks at the nadir point directly under the spot:
    # E = I/r^2 (cos = 1), L = rho E / pi; intensity in W/sr/nm, r in km
    expected = rho * 1e-6 / (h * h) / np.pi
    np.testing.assert_allclose(center1, expected, rtol=0.02)

    res2 = _run(2 * h)
    center2 = np.asarray(res2["radiance"]).reshape(9, 9)[4, 4]
    np.testing.assert_allclose(center1 / center2, 4.0, rtol=0.05)


def test_spot_beam_cutoff(mode_mono):
    # narrow beam from low height: the camera's wide fov sees dark ground
    # outside the illuminated disk
    res = _run(0.02, beam_width=10.0)
    rad = np.asarray(res["radiance"]).reshape(9, 9)
    assert rad[4, 4] > 0
    # corners view the ground far outside the beam footprint
    assert rad[0, 0] == pytest.approx(0.0, abs=1e-12)
    assert rad[8, 8] == pytest.approx(0.0, abs=1e-12)


def test_from_size_at_target():
    spot = SpotIllumination.from_size_at_target(
        target=[0.0, 0.0, 0.0],
        direction=[0.0, 0.0, -1.0],
        spot_radius=0.1,
        beam_width=30.0,
    )
    # origin placed so tan(beam) * dist = radius
    dist = np.linalg.norm(spot.origin - spot.target)
    np.testing.assert_allclose(np.tan(np.deg2rad(30.0)) * dist, 0.1, rtol=1e-9)
    np.testing.assert_allclose(spot.direction, [0.0, 0.0, -1.0], atol=1e-12)


def test_spot_rejected_by_distant_tracer(mode_mono):
    from eradiate_tpu.experiments import AtmosphereExperiment

    exp = AtmosphereExperiment(
        illumination={"type": "spot", "origin": [0, 0, 1.0], "target": [0, 0, 0]},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0]],
            "spp": 4,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere=None,
    )
    with pytest.raises(NotImplementedError, match="canopy"):
        eradiate_tpu.run(exp)
