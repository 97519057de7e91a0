"""System tests: textured/composite surfaces end-to-end.

Oracle: with no atmosphere and a lambertian(-valued) surface, the BRF seen
by a distant sensor equals the local reflectance at the targeted surface
point (reference CentralPatchSurface semantics,
``scenes/surface/_central_patch.py:37``).
"""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


def _run_brf(surface, target_xyz):
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0]],
            "target": {"type": "point", "xyz": target_xyz},
            "spp": 32,
            "id": "m",
        },
        surface=surface,
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    return float(np.asarray(result["brf"]).ravel()[0])


def test_central_patch_brf(mode_mono):
    surface = {
        "type": "central_patch",
        "bsdf": {"type": "lambertian", "reflectance": 0.2},
        "patch_bsdf": {"type": "lambertian", "reflectance": 0.8},
        "patch_edges": 1.0,
    }
    np.testing.assert_allclose(
        _run_brf(surface, [0.0, 0.0, 0.0]), 0.8, rtol=1e-4
    )
    np.testing.assert_allclose(
        _run_brf(surface, [5.0, 0.0, 0.0]), 0.2, rtol=1e-4
    )


def test_selectbsdf_surface_brf(mode_mono):
    surface = {
        "type": "selectbsdf",
        "bsdfs": [
            {"type": "lambertian", "reflectance": 0.1},
            {"type": "lambertian", "reflectance": 0.9},
        ],
        # left half -> child 0, right half -> child 1, over 20 km extent
        "index_map": [[0, 1]],
        "extent": 20.0,
    }
    np.testing.assert_allclose(
        _run_brf(surface, [-5.0, 0.0, 0.0]), 0.1, rtol=1e-4
    )
    np.testing.assert_allclose(
        _run_brf(surface, [5.0, 0.0, 0.0]), 0.9, rtol=1e-4
    )


def test_bitmap_surface_brf(mode_mono):
    data = np.concatenate(
        [np.full((8, 4), 0.25), np.full((8, 4), 0.75)], axis=1
    )
    surface = {"type": "bitmap", "data": data, "extent": 20.0}
    np.testing.assert_allclose(
        _run_brf(surface, [-5.0, 0.0, 0.0]), 0.25, rtol=1e-3
    )
    np.testing.assert_allclose(
        _run_brf(surface, [5.0, 0.0, 0.0]), 0.75, rtol=1e-3
    )


def test_opacity_mask_surface_brf(mode_mono):
    surface = {
        "type": "opacity_mask",
        "nested_bsdf": {"type": "lambertian", "reflectance": 0.6},
        "opacity": np.full((4, 4), 0.5),
        "extent": 50.0,
    }
    np.testing.assert_allclose(
        _run_brf(surface, [0.0, 0.0, 0.0]), 0.3, rtol=1e-3
    )
