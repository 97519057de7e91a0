"""Unit/oracle tests for the path-tracing engine.

Oracles (mirror of the reference's system-test strategy, SURVEY §4):
- Lambertian surface, no atmosphere: BRF == reflectance, exactly, at spp=1
  (``tests/02_system/test_onedim_lambertian_brf.py`` oracle).
- Purely absorbing atmosphere: direct transmission term only.
- Rayleigh single-scattering: closed-form analytic comparison at low optical
  depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.core.frame import angles_to_direction
from eradiate_tpu.ops import (
    IlluminationArrays,
    MediumArrays,
    SceneArrays,
    SceneConfig,
    SensorArrays,
    SurfaceArrays,
)
from eradiate_tpu.ops.medium import cumulative_tau
from eradiate_tpu.ops.tracer import render


def make_scene(
    sigma_t=0.0,
    albedo=1.0,
    reflectance=0.5,
    sza_deg=30.0,
    n_layers=10,
    top=100.0,
    S=1,
    depol=0.0,
):
    z_levels = jnp.linspace(0.0, top, n_layers + 1)
    sig = jnp.full((S, n_layers), sigma_t)
    tau_levels = cumulative_tau(sig, z_levels)
    med = MediumArrays(
        z_levels=z_levels,
        tau_levels=tau_levels,
        albedo=jnp.full((S, n_layers), albedo),
        phase_weights=jnp.ones((S, 1, n_layers)),
        phase_params=({"depol": jnp.full((S, n_layers), depol)},),
    )
    surf = SurfaceArrays(params={"reflectance": jnp.full(S, reflectance)})
    sza = np.deg2rad(sza_deg)
    d_sun = -angles_to_direction([sza, 0.0])[0]  # propagation: downward
    illum = IlluminationArrays(
        direction=jnp.asarray(d_sun),
        irradiance=jnp.ones(S),
        cos_cutoff=1.0,
        sky_radiance=jnp.zeros(S),
    )
    return SceneArrays(medium=med, surface=surf, illumination=illum)


def make_sensor(vzas_deg, vaa_deg=0.0):
    angles = np.stack(
        [np.deg2rad(vzas_deg), np.full(len(vzas_deg), np.deg2rad(vaa_deg))], axis=-1
    )
    dirs = angles_to_direction(angles)
    return SensorArrays(
        directions=jnp.asarray(dirs), target=jnp.zeros(3), ray_offset=jnp.nan
    )


def brf(result, sza_deg):
    E = 1.0
    return np.asarray(result["radiance"]) * np.pi / (E * np.cos(np.deg2rad(sza_deg)))


class TestLambertianNoAtmosphere:
    @pytest.mark.parametrize("reflectance", [0.0, 0.3, 0.5, 1.0])
    @pytest.mark.parametrize("sza", [0.0, 30.0, 60.0])
    def test_brf_equals_reflectance(self, reflectance, sza):
        scene = make_scene(sigma_t=0.0, reflectance=reflectance, sza_deg=sza)
        sensor = make_sensor(np.linspace(-75, 75, 11))
        cfg = SceneConfig(surface_kind="lambertian", phase_kinds=("rayleigh",))
        result = render(scene, sensor, cfg, spp=1, seed=0)
        np.testing.assert_allclose(brf(result, sza), reflectance, atol=1e-5)

    def test_m2_zero_variance(self):
        # Deterministic scene: every sample identical -> m2 == radiance^2
        scene = make_scene(sigma_t=0.0, reflectance=0.4)
        sensor = make_sensor(np.array([0.0, 45.0]))
        cfg = SceneConfig()
        result = render(scene, sensor, cfg, spp=8, seed=0)
        np.testing.assert_allclose(
            np.asarray(result["m2"]),
            np.asarray(result["radiance"]) ** 2,
            rtol=1e-5,
        )


class TestAbsorbingAtmosphere:
    def test_direct_transmission(self):
        # Pure absorber (albedo 0): L = rho/pi cos(sza) E T(sun) T(view)
        tau = 0.3
        sza = 30.0
        scene = make_scene(sigma_t=tau / 100.0, albedo=0.0, reflectance=0.8, sza_deg=sza)
        vza = np.array([0.0, 30.0, 60.0])
        sensor = make_sensor(vza)
        cfg = SceneConfig()
        # The view-path transmittance is estimated by Bernoulli reach-the-
        # surface events -> statistical agreement only.
        result = render(scene, sensor, cfg, spp=8192, seed=0)
        mu_s = np.cos(np.deg2rad(sza))
        mu_v = np.cos(np.deg2rad(vza))
        expected = 0.8 / np.pi * mu_s * np.exp(-tau / mu_s) * np.exp(-tau / mu_v)
        np.testing.assert_allclose(
            np.asarray(result["radiance"][0]), expected, rtol=0.03
        )


class TestRayleighSingleScattering:
    def test_thin_atmosphere_ss_analytic(self):
        """At small tau with a black surface, radiance ~ single scattering:
        L_ss = E * p(cos T) * mu_s/(mu_s+mu_v) * (1 - exp(-tau (1/mu_s+1/mu_v)))
        """
        tau = 0.01
        sza = 30.0
        scene = make_scene(
            sigma_t=tau / 100.0, albedo=1.0, reflectance=0.0, sza_deg=sza
        )
        vza = np.array([0.0, 45.0])
        sensor = make_sensor(vza, vaa_deg=90.0)
        cfg = SceneConfig(surface_kind="black")
        # black surface: use reflectance-less params
        scene = SceneArrays(
            medium=scene.medium,
            surface=SurfaceArrays(params={}),
            illumination=scene.illumination,
        )
        spp = 65536
        result = render(scene, sensor, cfg, spp=spp, seed=0)

        mu_s = np.cos(np.deg2rad(sza))
        mu_v = np.cos(np.deg2rad(vza))
        # scattering angle between sun propagation and direction to sensor
        d_sun = -angles_to_direction([np.deg2rad(sza), 0.0])[0]
        w_v = angles_to_direction(
            np.stack([np.deg2rad(vza), np.full(2, np.pi / 2)], axis=-1)
        )
        cos_T = np.asarray([np.dot(d_sun, wv) for wv in w_v])
        p = 3.0 / (16.0 * np.pi) * (1.0 + cos_T**2)
        L_ss = (
            p * mu_s / (mu_s + mu_v) * (1.0 - np.exp(-tau * (1 / mu_s + 1 / mu_v)))
        )
        L = np.asarray(result["radiance"][0])
        # z-test within 4 sigma of the MC estimate (+1% multiple-scattering
        # allowance at this optical depth)
        sigma = np.sqrt(
            np.maximum(np.asarray(result["m2"][0]) - L**2, 0.0) / spp
        )
        assert np.all(np.abs(L - L_ss) < 4.0 * sigma + 0.01 * L_ss), (L, L_ss, sigma)

    def test_energy_conservation_white_sky(self):
        """Conservative scattering + white lambertian surface: BRF ~ 1 for
        thin atmospheres, > 0.9 everywhere."""
        scene = make_scene(sigma_t=0.001, albedo=1.0, reflectance=1.0)
        sensor = make_sensor(np.array([0.0, 30.0]))
        cfg = SceneConfig()
        result = render(scene, sensor, cfg, spp=512, seed=0)
        b = brf(result, 30.0)
        assert np.all(b > 0.9) and np.all(b < 1.1)


class TestSpectralBatch:
    def test_vmap_over_spectral(self):
        S = 4
        scene = make_scene(sigma_t=0.001, reflectance=0.5, S=S)
        # vary reflectance across spectral axis
        scene = SceneArrays(
            medium=scene.medium,
            surface=SurfaceArrays(
                params={"reflectance": jnp.array([0.1, 0.3, 0.5, 0.7])}
            ),
            illumination=scene.illumination,
        )
        sensor = make_sensor(np.array([0.0]))
        cfg = SceneConfig()
        result = render(scene, sensor, cfg, spp=128, seed=0)
        b = brf(result, 30.0)[:, 0]
        assert b.shape == (S,)
        # monotonically increasing with reflectance
        assert np.all(np.diff(b) > 0)

    def test_chunked_equals_unchunked(self):
        scene = make_scene(sigma_t=0.002, reflectance=0.5)
        sensor = make_sensor(np.array([15.0]))
        cfg = SceneConfig()
        r1 = render(scene, sensor, cfg, spp=64, seed=3)
        r2 = render(scene, sensor, cfg, spp=64, seed=3, spp_chunk=16)
        # different chunking -> different sample keys; agreement only in
        # distribution. Check both are close to each other statistically.
        assert abs(
            float(r1["radiance"][0, 0]) - float(r2["radiance"][0, 0])
        ) < 4 * np.sqrt(
            float(r1["m2"][0, 0]) / 64
        ) + 1e-6


class TestReproducibility:
    def test_same_seed_same_result(self):
        scene = make_scene(sigma_t=0.002, reflectance=0.5)
        sensor = make_sensor(np.array([0.0, 30.0]))
        cfg = SceneConfig()
        r1 = render(scene, sensor, cfg, spp=32, seed=7)
        r2 = render(scene, sensor, cfg, spp=32, seed=7)
        np.testing.assert_array_equal(
            np.asarray(r1["radiance"]), np.asarray(r2["radiance"])
        )

    def test_different_seed_differs(self):
        scene = make_scene(sigma_t=0.01, reflectance=0.5)
        sensor = make_sensor(np.array([30.0]))
        cfg = SceneConfig()
        r1 = render(scene, sensor, cfg, spp=32, seed=1)
        r2 = render(scene, sensor, cfg, spp=32, seed=2)
        assert float(r1["radiance"][0, 0]) != float(r2["radiance"][0, 0])


class TestPathRegeneration:
    """The regenerative wavefront loop must reproduce the one-shot tracer:
    identical per-(pixel, sample) RNG keys mean identical sample sets, so
    means/moments agree to float-summation order."""

    def _row_inputs(self, spp=512, n_pix=6):
        scene = make_scene(sigma_t=2e-3, albedo=0.9, reflectance=0.4, S=1)
        sensor = make_sensor(np.linspace(-60, 60, n_pix))
        mr = MediumArrays(
            z_levels=scene.medium.z_levels,
            tau_levels=scene.medium.tau_levels[0],
            albedo=scene.medium.albedo[0],
            phase_weights=scene.medium.phase_weights[0],
            phase_params=jax.tree_util.tree_map(
                lambda x: x[0], scene.medium.phase_params
            ),
        )
        sr = SurfaceArrays(
            params={"reflectance": scene.surface.params["reflectance"][0]}
        )
        ir = IlluminationArrays(
            direction=scene.illumination.direction,
            irradiance=scene.illumination.irradiance[0],
            cos_cutoff=1.0,
            sky_radiance=scene.illumination.sky_radiance[0],
        )
        return mr, sr, ir, sensor, spp, n_pix

    def test_matches_one_shot(self, monkeypatch):
        from eradiate_tpu.ops import tracer as T

        mr, sr, ir, sensor, spp, n_pix = self._row_inputs()
        cfg = SceneConfig(max_depth=16)
        key = jax.random.key(11)
        rad_a, m2_a = T._render_row(
            cfg, n_pix, spp, mr, sr, ir, sensor.directions, key
        )
        # force real regeneration: many samples per lane
        monkeypatch.setattr(T, "REGEN_LANES_TARGET", 64)
        lp, quota = T._lane_plan(n_pix, spp)
        assert quota > 1
        rad_b, m2_b = T._render_row_regen(
            cfg, n_pix, spp, mr, sr, ir, sensor.directions, key
        )
        np.testing.assert_allclose(rad_a, rad_b, rtol=5e-5)
        np.testing.assert_allclose(m2_a, m2_b, rtol=5e-5)

    def test_lane_plan_invariance(self, monkeypatch):
        """Estimates are invariant to the lane/quota decomposition."""
        from eradiate_tpu.ops import tracer as T

        mr, sr, ir, sensor, spp, n_pix = self._row_inputs(spp=256)
        cfg = SceneConfig(max_depth=16)
        key = jax.random.key(3)
        results = []
        for lanes in (20, 128, 10**9):  # uneven + even + one-lane-per-sample
            monkeypatch.setattr(T, "REGEN_LANES_TARGET", lanes)
            results.append(
                np.asarray(
                    T._render_row_regen(
                        cfg, n_pix, spp, mr, sr, ir, sensor.directions, key
                    )[0]
                )
            )
        assert len(results) >= 2
        for r in results[1:]:
            np.testing.assert_allclose(results[0], r, rtol=5e-5)

    def test_rectangle_target_jitter(self, monkeypatch):
        """Regen path handles per-sample rectangle-target jitter."""
        from eradiate_tpu.ops import tracer as T

        monkeypatch.setattr(T, "REGEN_LANES_TARGET", 64)
        scene = make_scene(sigma_t=1e-3, reflectance=0.5)
        sensor = SensorArrays(
            directions=make_sensor(np.linspace(-50, 50, 4)).directions,
            target=jnp.zeros(3),
            ray_offset=jnp.nan,
            target_extent=jnp.asarray([10.0, 10.0]),
        )
        out = render(scene, sensor, SceneConfig(max_depth=8), spp=128, seed=2)
        rad = np.asarray(out["radiance"])
        assert np.all(np.isfinite(rad)) and np.all(rad > 0)
