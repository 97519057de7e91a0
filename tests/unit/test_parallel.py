"""Multi-device sharding tests (8 virtual CPU devices, see conftest)."""

import jax
import numpy as np
import pytest

from eradiate_tpu.ops import SceneConfig
from eradiate_tpu.parallel import make_render_mesh, render_sharded
from eradiate_tpu.ops.tracer import render

from test_tracer import make_scene, make_sensor  # noqa: E402 (tests dir on sys.path via rootdir conftest)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


class TestShardedRender:
    def test_sample_sharded_matches_lambertian_oracle(self, eight_devices):
        scene = make_scene(sigma_t=0.0, reflectance=0.6, sza_deg=30.0)
        sensor = make_sensor(np.linspace(-60, 60, 5))
        cfg = SceneConfig()
        mesh = make_render_mesh(1, 8)
        result = render_sharded(scene, sensor, cfg, spp=8, seed=0, mesh=mesh)
        brf = np.asarray(result["radiance"]) * np.pi / np.cos(np.deg2rad(30.0))
        np.testing.assert_allclose(brf, 0.6, atol=1e-5)

    def test_spectral_sharded(self, eight_devices):
        S = 8
        scene = make_scene(sigma_t=0.001, reflectance=0.5, S=S)
        sensor = make_sensor(np.array([0.0, 30.0]))
        cfg = SceneConfig()
        mesh = make_render_mesh(4, 2)
        result = render_sharded(scene, sensor, cfg, spp=32, seed=0, mesh=mesh)
        assert np.asarray(result["radiance"]).shape == (S, 2)
        assert np.all(np.asarray(result["radiance"]) > 0)

    def test_statistical_agreement_with_single_device(self, eight_devices):
        scene = make_scene(sigma_t=0.002, reflectance=0.5)
        sensor = make_sensor(np.array([15.0]))
        cfg = SceneConfig()
        mesh = make_render_mesh(1, 8)
        r_sharded = render_sharded(scene, sensor, cfg, spp=64, seed=5, mesh=mesh)
        r_single = render(scene, sensor, cfg, spp=64, seed=5)
        a = float(r_sharded["radiance"][0, 0])
        b = float(r_single["radiance"][0, 0])
        sigma = np.sqrt(float(r_single["m2"][0, 0]) / 64)
        assert abs(a - b) < 6 * sigma + 1e-6

    def test_mesh_validation(self, eight_devices):
        with pytest.raises(ValueError):
            make_render_mesh(3, 3)
