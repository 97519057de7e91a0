"""Perspective-camera reconstruction filters (hdrfilm/rfilter parity;
reference ``scenes/measure/_core.py:156-168``).

The tent/gaussian filters render an oversampled stratified sub-pixel
grid and assemble the film by kernel-weighted downsampling; these tests
pin the filter algebra (constant invariance, normalization, smoothing)
and the end-to-end pipeline wiring.
"""

import numpy as np
import pytest

from eradiate_tpu.scenes.measure import measure_factory


def make_cam(rfilter="tent", res=(8, 6), os_=2):
    return measure_factory.convert({
        "type": "perspective",
        "film_resolution": res,
        "origin": [0.0, 0.0, 1.0],
        "target": [0.0, 1.0, 0.5],
        "fov": 40.0,
        "rfilter": rfilter,
        "rfilter_oversample": os_,
        "id": "cam",
    })


class TestFilterAlgebra:
    @pytest.mark.parametrize("rf", ["tent", "gaussian"])
    @pytest.mark.parametrize("os_", [2, 4])
    def test_constant_field_invariant(self, rf, os_):
        cam = make_cam(rf, os_=os_)
        nx, ny = cam.film_resolution
        field = np.full((3, nx * os_ * ny * os_), 0.7)
        out = cam.assemble_film(field)
        assert out.shape == (3, nx * ny)
        np.testing.assert_allclose(out, 0.7, rtol=1e-12)

    def test_box_passthrough(self):
        cam = make_cam("box")
        field = np.arange(48.0)[None, :]
        out = cam.assemble_film(field)
        np.testing.assert_array_equal(out, field)

    def test_direction_counts(self):
        cam = make_cam("tent", res=(8, 6), os_=2)
        assert cam.sensor_directions().shape == (16 * 12, 3)
        assert cam.viewing_angles.shape == (48, 2)
        box = make_cam("box", res=(8, 6))
        assert box.sensor_directions().shape == (48, 3)

    def test_tent_smooths_delta(self):
        """A single bright sub-sample spreads into neighboring output
        pixels under tent, stays confined under box semantics."""
        cam = make_cam("tent", res=(8, 8), os_=2)
        nx = ny = 8
        os_ = 2
        img = np.zeros((nx * os_, ny * os_))
        img[8, 8] = 1.0  # inside output pixel (4, 4)
        out = cam.assemble_film(img.reshape(1, -1)).reshape(nx, ny)
        assert out[4, 4] > 0
        # energy leaks into at least one neighbor
        neigh = out[3:6, 3:6].sum() - out[4, 4]
        assert neigh > 0

    def test_variance_weights_squared(self):
        """Variance fields must be combined with squared weights: for a
        constant variance v the output variance is v * sum(w^2)/sum(w)^2
        < v (filtering reduces noise)."""
        cam = make_cam("gaussian", res=(6, 6), os_=2)
        var = np.full((1, 144), 2.0)
        rad = np.full((1, 144), 1.0)
        r_out, v_out = cam.assemble_film(rad, var)
        np.testing.assert_allclose(r_out, 1.0, rtol=1e-12)
        assert np.all(v_out < 2.0)
        assert np.all(v_out > 0.0)


class TestEndToEnd:
    @pytest.mark.parametrize("rf", ["tent", "gaussian"])
    def test_pipeline_runs_and_matches_box_on_smooth_scene(self, rf, mode_mono):
        """On a smooth (atmosphere-free Lambertian) scene the filtered
        image equals the box image within MC noise + discretization."""
        import eradiate_tpu
        from eradiate_tpu.experiments import AtmosphereExperiment

        def run(rfilter):
            exp = AtmosphereExperiment(
                illumination={"type": "directional", "zenith": 30.0},
                measures={
                    "type": "perspective",
                    "film_resolution": (6, 4),
                    "origin": [0.0, 0.0, 2.0],
                    "target": [0.0, 1.0, 0.0],
                    "fov": 35.0,
                    "spp": 64,
                    "rfilter": rfilter,
                    "id": "cam",
                },
                surface={"type": "lambertian", "reflectance": 0.4},
                atmosphere=None,
            )
            return eradiate_tpu.run(exp)

        r_box = run("box")
        r_f = run(rf)
        a = r_box["radiance"].values
        b = r_f["radiance"].values
        assert b.shape == a.shape
        np.testing.assert_allclose(b, a, rtol=0.05)
        # variance must not increase under filtering
        assert float(r_f["var"].values.mean()) <= float(
            r_box["var"].values.mean()
        ) * 1.05
