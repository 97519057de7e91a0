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


class TestSphericalSharded:
    def _spherical_scene(self, S=4):
        import jax.numpy as jnp

        from eradiate_tpu.ops.scene_state import (
            IlluminationArrays,
            SensorArrays,
            SurfaceArrays,
        )
        from eradiate_tpu.ops.tracer_spherical import SphericalMediumArrays

        R = 6378.1
        L = 16
        radii = jnp.asarray(R + np.linspace(0.0, 100.0, L + 1))
        sigma = jnp.broadcast_to(
            jnp.asarray(0.002 * np.exp(-np.linspace(0, 100, L) / 8.5)), (S, L)
        )
        med = SphericalMediumArrays(
            radii=radii,
            sigma_t=sigma,
            sigma_majorant=jnp.max(sigma, axis=1),
            albedo=jnp.full((S, L), 0.95),
            phase_weights=jnp.ones((S, 1, L)),
            phase_params=({"depol": jnp.zeros((S, L))},),
        )
        surf = SurfaceArrays(params={"reflectance": jnp.full(S, 0.4)})
        sza = np.deg2rad(30.0)
        illum = IlluminationArrays(
            direction=jnp.asarray([-np.sin(sza), 0.0, -np.cos(sza)]),
            irradiance=jnp.ones(S),
            cos_cutoff=1.0,
            sky_radiance=jnp.zeros(S),
        )
        dirs = np.stack(
            [
                np.sin(np.deg2rad([0.0, 30.0])),
                np.zeros(2),
                np.cos(np.deg2rad([0.0, 30.0])),
            ],
            axis=-1,
        )
        sensor = SensorArrays(
            directions=jnp.asarray(dirs),
            target=jnp.asarray([0.0, 0.0, R]),
            ray_offset=jnp.nan,
        )
        from eradiate_tpu.ops import SceneConfig

        cfg = SceneConfig(geometry="spherical_shell")
        return med, surf, illum, sensor, cfg

    def test_matches_single_device(self, eight_devices):
        from eradiate_tpu.ops.tracer_spherical import render_spherical
        from eradiate_tpu.parallel import render_spherical_sharded

        med, surf, illum, sensor, cfg = self._spherical_scene(S=4)
        mesh = make_render_mesh(2, 4)
        r_sh = render_spherical_sharded(
            med, surf, illum, sensor, cfg, spp=32, seed=3, mesh=mesh
        )
        assert np.asarray(r_sh["radiance"]).shape == (4, 2)
        assert np.all(np.isfinite(np.asarray(r_sh["radiance"])))
        assert np.all(np.asarray(r_sh["radiance"]) > 0)
        # statistical agreement with the single-device renderer
        r_1 = render_spherical(med, surf, illum, sensor, cfg, spp=32, seed=3)
        a = np.asarray(r_sh["radiance"])
        b = np.asarray(r_1["radiance"])
        sigma = np.sqrt(np.asarray(r_1["m2"]) / 32) + 1e-6
        assert np.all(np.abs(a - b) < 8 * sigma)


class TestResolveMesh:
    def test_auto_env_off(self, monkeypatch):
        from eradiate_tpu.experiments._core import resolve_mesh

        monkeypatch.setenv("ERADIATE_TPU_MESH", "none")
        assert resolve_mesh("auto") is None

    def test_auto_builds_mesh(self, monkeypatch, eight_devices):
        from eradiate_tpu.experiments._core import resolve_mesh

        monkeypatch.setenv("ERADIATE_TPU_MESH", "auto")
        mesh = resolve_mesh("auto")
        assert mesh is not None
        assert mesh.shape["sample"] == 8

    def test_none_and_passthrough(self, eight_devices):
        from eradiate_tpu.experiments._core import resolve_mesh

        assert resolve_mesh(None) is None
        mesh = make_render_mesh(1, 8)
        assert resolve_mesh(mesh) is mesh

    def test_bad_string_raises(self):
        from eradiate_tpu.experiments._core import resolve_mesh

        with pytest.raises(ValueError):
            resolve_mesh("bogus")
