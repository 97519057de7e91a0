"""System tests: mpdistant measure + rectangle target sampling.

Oracles (no atmosphere, lambertian-valued surfaces):
- mpdistant pixel BRF == local reflectance of the targeted subcell
  (reference ``mpdistant`` plugin, ``scenes/measure/_distant.py:500-639``);
- mdistant with a rectangle target averages the BRF over the rectangle
  (reference rectangle target sampling, ``_distant.py:139-228``).
"""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment, CanopyExperiment
from eradiate_tpu.scenes.measure import (
    MultiPixelDistantMeasure,
    TargetRectangle,
)

HALF_SURFACE = {
    "type": "selectbsdf",
    "bsdfs": [
        {"type": "lambertian", "reflectance": 0.1},
        {"type": "lambertian", "reflectance": 0.9},
    ],
    # left half -> child 0, right half -> child 1, over 20 km extent
    "index_map": [[0, 1]],
    "extent": 20.0,
}


def test_mpdistant_pixel_targets_geometry(mode_mono):
    m = MultiPixelDistantMeasure(
        film_resolution=(2, 2),
        target={
            "type": "rectangle",
            "xmin": -2.0,
            "xmax": 2.0,
            "ymin": -1.0,
            "ymax": 1.0,
            "z": 0.5,
        },
    )
    centers, extent = m.pixel_targets()
    assert centers.shape == (4, 3)
    np.testing.assert_allclose(extent, [2.0, 1.0])
    # x-major ravel order
    np.testing.assert_allclose(
        centers,
        [
            [-1.0, -0.5, 0.5],
            [-1.0, 0.5, 0.5],
            [1.0, -0.5, 0.5],
            [1.0, 0.5, 0.5],
        ],
    )
    assert m.sensor_directions().shape == (4, 3)
    assert m.film_shape == (2, 2)


def test_mpdistant_images_surface(mode_mono):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "mpdistant",
            "film_resolution": (2, 1),
            "target": {
                "type": "rectangle",
                "xmin": -10.0,
                "xmax": 10.0,
                "ymin": -1.0,
                "ymax": 1.0,
            },
            "spp": 64,
            "id": "img",
        },
        surface=HALF_SURFACE,
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    brf = np.asarray(result["brf"]).ravel()
    # pixel 0 images the left half (rho=0.1), pixel 1 the right (rho=0.9)
    np.testing.assert_allclose(brf, [0.1, 0.9], rtol=1e-4)


def test_mdistant_rectangle_target_averages(mode_mono):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0]],
            "target": {
                "type": "rectangle",
                "xmin": -10.0,
                "xmax": 10.0,
                "ymin": -1.0,
                "ymax": 1.0,
            },
            "spp": 4096,
            "id": "m",
        },
        surface=HALF_SURFACE,
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    brf = float(np.asarray(result["brf"]).ravel()[0])
    # uniform origin jitter over the rectangle -> area-average reflectance;
    # per-sample sigma = 0.4, spp=4096 -> sigma_est ~ 0.006
    np.testing.assert_allclose(brf, 0.5, atol=0.04)


def test_canopy_default_rectangle_target(mode_mono):
    exp = CanopyExperiment(
        canopy={
            "type": "leaf_cloud",
            "construct": "cuboid",
            "n_leaves": 64,
            "leaf_radius": 0.1,
            "l_horizontal": 10.0,
            "l_vertical": 1.0,
        },
        measures={"type": "mdistant", "construct": "from_angles",
                  "angles": [[0.0, 0.0]], "spp": 8},
    )
    m = exp.measures[0]
    assert isinstance(m.target, TargetRectangle)
    # canopy footprint (meters -> km) at canopy top; the converter derives
    # the size from actual leaf positions, so allow a leaf-scale margin
    np.testing.assert_allclose(
        [m.target.xmin, m.target.xmax, m.target.z],
        [-0.005, 0.005, 0.001],
        atol=2e-4,
    )
