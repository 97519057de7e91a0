"""System tests: spherical-shell geometry.

Mirror of the reference's ``tests/03_regression/spherical`` intent with
self-contained oracles:
- slant-tau table against brute-force numerical integration;
- no atmosphere: BRF == reflectance (sphere surface, nadir target);
- thin atmosphere: spherical results converge to plane-parallel at low SZA;
- high SZA (75 deg+) with Hapke surface runs and produces finite output
  (BASELINE config 4 shape).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.ops.spherical import (
    lookup_sun_tau,
    ray_sphere_intersect,
    sun_tau_table,
)


class TestSlantTau:
    def test_vertical_matches_sum(self):
        radii = jnp.asarray(6378.0 + np.linspace(0, 100, 51))
        sigma = jnp.asarray(np.full((1, 50), 0.01))
        mu_grid = jnp.asarray(np.linspace(-1, 1, 65))
        table = sun_tau_table(sigma, radii, mu_grid)
        # straight up from the ground: tau = 0.01 * 100
        tau_up = float(lookup_sun_tau(table[0], radii, mu_grid, radii[0], 1.0))
        np.testing.assert_allclose(tau_up, 1.0, rtol=1e-5)
        # from the top: zero
        tau_top = float(lookup_sun_tau(table[0], radii, mu_grid, radii[-1], 1.0))
        np.testing.assert_allclose(tau_top, 0.0, atol=1e-6)

    def test_slant_against_numerical(self):
        rng = np.random.default_rng(0)
        R = 6378.0
        z = np.linspace(0, 100, 101)
        radii_np = R + z
        sigma_np = 0.012 * np.exp(-z[:-1] / 8.0)[None, :]
        mu_grid = np.sign(np.linspace(-1, 1, 193)) * np.linspace(-1, 1, 193) ** 2
        table = sun_tau_table(
            jnp.asarray(sigma_np), jnp.asarray(radii_np), jnp.asarray(mu_grid)
        )

        def numerical_tau(r0, mu):
            # march the ray numerically
            p = np.array([0.0, np.sqrt(1 - mu**2) * 0, r0])
            d = np.array([np.sqrt(max(1 - mu**2, 0)), 0.0, mu])
            # rotate so local up is +z at start: p = (0,0,r0), local mu wrt z
            ds = 0.05
            tau = 0.0
            for _ in range(200000):
                p = p + d * ds
                r = np.linalg.norm(p)
                if r >= radii_np[-1]:
                    return tau
                if r <= radii_np[0]:
                    return 1e10
                k = np.searchsorted(radii_np, r) - 1
                tau += sigma_np[0, min(max(k, 0), 99)] * ds
            return tau

        for r0, mu in [(R + 0.0, 0.8), (R + 20.0, 0.3), (R + 5.0, -0.05), (R + 50.0, 0.05)]:
            t_num = numerical_tau(r0, mu)
            t_tab = float(
                lookup_sun_tau(table[0], jnp.asarray(radii_np), jnp.asarray(mu_grid), r0, mu)
            )
            if t_num > 1e9:
                assert t_tab > 1e9 or t_tab > 100.0
            else:
                np.testing.assert_allclose(t_tab, t_num, rtol=0.02, atol=0.002)

    def test_ground_blockage(self):
        radii = jnp.asarray(6378.0 + np.linspace(0, 100, 51))
        sigma = jnp.asarray(np.full((1, 50), 0.01))
        mu_grid = jnp.asarray(np.linspace(-1, 1, 129))
        table = sun_tau_table(sigma, radii, mu_grid)
        # steeply downward from low altitude: blocked by the planet
        tau = float(lookup_sun_tau(table[0], radii, mu_grid, radii[0] + 1.0, -0.9))
        assert tau > 1e6


class TestRaySphere:
    def test_basic(self):
        p = jnp.asarray([[0.0, 0.0, 10.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        tn, tf, hit = ray_sphere_intersect(p, d, 5.0)
        assert bool(hit[0])
        np.testing.assert_allclose(float(tn[0]), 5.0)
        np.testing.assert_allclose(float(tf[0]), 15.0)


class TestSphericalExperiment:
    def test_no_atmosphere_lambertian(self, mode_mono):
        exp = AtmosphereExperiment(
            geometry={"type": "spherical_shell"},
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-45.0, 0.0, 45.0],
                "azimuth": 0.0,
                "spp": 8,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.4},
            atmosphere=None,
        )
        result = eradiate_tpu.run(exp)
        np.testing.assert_allclose(result["brf"].values, 0.4, atol=1e-4)

    def test_converges_to_plane_parallel(self, mode_mono):
        """Rayleigh atmosphere, moderate SZA: spherical ~= plane-parallel."""
        kwargs = dict(
            illumination={"type": "directional", "zenith": 20.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [0.0, 30.0],
                "azimuth": 0.0,
                "spp": 4096,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.3},
            atmosphere={"type": "molecular"},
        )
        r_pp = eradiate_tpu.run(AtmosphereExperiment(**kwargs))
        r_sp = eradiate_tpu.run(
            AtmosphereExperiment(geometry={"type": "spherical_shell"}, **kwargs)
        )
        bp = r_pp["brf"].values[0]
        bs = r_sp["brf"].values[0]
        sig = np.pi * np.sqrt(
            r_pp["var"].values[0] + r_sp["var"].values[0]
        ) / float(r_pp["irradiance"].values[0])
        assert np.all(np.abs(bp - bs) < 5 * sig + 0.01 * bp), (bp, bs, sig)

    def test_high_sza_hapke(self, mode_mono):
        """BASELINE config 4: spherical shell, SZA 80, Hapke surface."""
        exp = AtmosphereExperiment(
            geometry={"type": "spherical_shell"},
            illumination={"type": "directional", "zenith": 80.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-60.0, 0.0, 60.0],
                "azimuth": 0.0,
                "spp": 512,
                "id": "m",
            },
            surface={"type": "hapke"},
            atmosphere={"type": "molecular"},
        )
        result = eradiate_tpu.run(exp)
        vals = result["brf"].values
        assert np.all(np.isfinite(vals))
        assert np.all(vals > 0.0)
        # at SZA 80 the plane-parallel limb would differ; just check the
        # magnitude is physical
        assert np.all(vals < 2.0)
