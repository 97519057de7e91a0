"""Cross-implementation correctness gates (VERDICT r1, Missing #2 / item #3).

Self-pinned regressions catch drift, not wrongness; these gates catch
*bias* by requiring independent implementations / closed forms to agree:

- spherical-shell tracer at planet radius 1e6 km == plane-parallel tracer
  (same scene, 3-sigma MC agreement) — two completely different traversal
  code paths (per-shell quadratic flights vs closed-form tau inversion);
- polarized Stokes-I == scalar radiance on ATMOSPHERE scenes (existed only
  for canopy in round 1) — Mueller chain vs scalar throughput;
- one-shot tracer == regenerative tracer, bit-tight: keys depend only on
  (pixel, global sample id), so both must produce the SAME estimate, not
  just statistically compatible ones (claimed in ops/tracer.py, asserted
  here for the first time);
- Rayleigh single-scattering DoLP closed form (1-cos^2)/(1+cos^2) at low
  optical depth over a black surface;
- two-layer transmittance-only column: TOA radiance == rho/pi E cos(SZA)
  exp(-tau_total (1/cos_sun + 1/cos_view)) with absorption-only layers.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.ops import SceneConfig
from eradiate_tpu.ops.tracer import render

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "unit"))
from test_tracer import make_scene, make_sensor  # noqa: E402


class TestSphericalMatchesPlaneParallelAtHugeRadius:
    """R -> infinity limit: the spherical tracer must converge to the
    plane-parallel one.

    Precision regimes (diagnosed in round 3): b² now comes from |p x d|²,
    which removed the round-2 |p|² - (p·d)² cancellation; the REMAINING
    limit at f32 is Cartesian position quantization itself — f32 spacing
    at |p| = 1e6 km is 0.0625 km, comparable to the 0.1 km shells, so no
    compensated arithmetic can recover the shell index.  Hence the f32
    gate runs at 1e5 km (position quantum 62 m vs 100 m shells, and 16x
    Earth is deep in the asymptotic regime), and the 1e6 km gate runs in
    the mono_double product mode, which validates pure transport in the
    limit with positions that resolve the shells (f64 quantum ~0.1 mm)."""

    @pytest.fixture(params=[(1.0e5, "mono_single"), (1.0e6, "mono_double")],
                    ids=["r1e5_f32", "r1e6_f64"])
    def radius_mode(self, request):
        import jax

        radius, mode = request.param
        old = jax.config.jax_enable_x64
        if mode == "mono_double":
            jax.config.update("jax_enable_x64", True)
        eradiate_tpu.set_mode(mode)
        yield radius
        jax.config.update("jax_enable_x64", old)
        eradiate_tpu.set_mode("mono_single")

    def test_r_large(self, radius_mode):
        planet_radius = radius_mode
        kwargs = dict(
            illumination={"type": "directional", "zenith": 40.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-45.0, 0.0, 45.0],
                "azimuth": 0.0,
                "spp": 8192,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.3},
            atmosphere={"type": "molecular"},
        )
        r_pp = eradiate_tpu.run(AtmosphereExperiment(**kwargs))
        r_sp = eradiate_tpu.run(
            AtmosphereExperiment(
                geometry={"type": "spherical_shell", "planet_radius": planet_radius},
                **kwargs,
            )
        )
        bp = r_pp["brf"].values[0]
        bs = r_sp["brf"].values[0]
        sig_brf = (
            np.pi
            * np.sqrt(r_pp["var"].values[0] + r_sp["var"].values[0])
            / float(r_pp["irradiance"].values[0])
        )
        # 3-sigma + a 0.2% floor for the residual geometric difference
        assert np.all(np.abs(bp - bs) < 3 * sig_brf + 2e-3 * bp), (
            bp, bs, sig_brf,
        )


class TestPolarizedIMatchesScalarOnAtmosphere:
    @pytest.mark.parametrize("sza", [0.0, 45.0])
    def test_rayleigh_atmosphere_thin(self, sza):
        """Stokes-I of the polarized plane-parallel tracer equals the
        scalar tracer's radiance on a *moderate-depth* Rayleigh atmosphere.

        Thin regime only: at large optical depth scalar and vector
        radiative transfer genuinely differ (the classic scalar-
        approximation error, up to several % at tau ~ 1-2 in Rayleigh
        atmospheres — Mishchenko et al. 1994); this engine reproduces that
        separation (measured: vector I ~4-8% above scalar at tau = 2,
        SZA 45). At tau = 0.2 the physical difference is ~0.1%, below the
        MC gate."""
        from eradiate_tpu.ops.tracer_polarized import render_polarized

        scene = make_scene(
            sigma_t=2e-3, albedo=0.95, reflectance=0.3, sza_deg=sza
        )
        sensor = make_sensor(np.array([-30.0, 0.0, 30.0]))
        spp = 16384
        r_s = render(scene, sensor, SceneConfig(), spp=spp, seed=3)
        r_p = render_polarized(
            scene, sensor, SceneConfig(polarized=True), spp=spp, seed=4
        )
        a = np.asarray(r_s["radiance"])
        b = np.asarray(r_p["radiance"])
        sig = np.sqrt(
            (np.asarray(r_s["m2"]) + np.asarray(r_p["m2"])) / spp
        )
        assert np.all(np.abs(a - b) < 4 * sig + 2e-3 * a), (a, b, sig)

    def test_isotropic_phase_equal_at_any_depth(self):
        """With a depolarizing (isotropic) phase function vector transport
        degenerates to scalar EXACTLY, so I must match even at tau = 2 —
        this pins the thin-test's tau ceiling on Rayleigh as the physical
        scalar-vs-vector separation rather than an engine bug."""
        from eradiate_tpu.ops.tracer_polarized import render_polarized

        scene = make_scene(
            sigma_t=0.02, albedo=0.95, reflectance=0.3, sza_deg=45.0
        )
        sensor = make_sensor(np.array([-30.0, 0.0, 30.0]))
        spp = 16384
        cfg_s = SceneConfig(phase_kinds=("isotropic",))
        cfg_p = SceneConfig(phase_kinds=("isotropic",), polarized=True)
        r_s = render(scene, sensor, cfg_s, spp=spp, seed=3)
        r_p = render_polarized(scene, sensor, cfg_p, spp=spp, seed=4)
        a = np.asarray(r_s["radiance"])
        b = np.asarray(r_p["radiance"])
        sig = np.sqrt(
            (np.asarray(r_s["m2"]) + np.asarray(r_p["m2"])) / spp
        )
        assert np.all(np.abs(a - b) < 4 * sig + 1e-6), (a, b, sig)


class TestOneShotEqualsRegenerative:
    def test_exact_estimate_equality(self):
        """The regenerative tracer's keys depend only on (pixel, global
        sample id) — identical to the one-shot tracer's. Same seed ->
        same sample set -> same estimate up to float summation order."""
        from eradiate_tpu.ops.scene_state import IlluminationArrays
        from eradiate_tpu.ops.tracer import (
            _render_row,
            _render_row_regen,
        )

        scene = make_scene(sigma_t=0.01, albedo=0.9, reflectance=0.4, S=1)
        sensor = make_sensor(np.array([-20.0, 0.0, 40.0]))
        cfg = SceneConfig()
        n_pix = 3
        spp = 64
        key = jax.random.fold_in(jax.random.key(9), 0)

        def row(medium):
            return (
                medium.tau_levels[0],
                medium.albedo[0],
                medium.phase_weights[0],
                jax.tree_util.tree_map(lambda a: a[0], medium.phase_params),
            )

        from eradiate_tpu.ops.scene_state import MediumArrays, SurfaceArrays

        tau, alb, pw, pp = row(scene.medium)
        mr = MediumArrays(
            z_levels=scene.medium.z_levels, tau_levels=tau, albedo=alb,
            phase_weights=pw, phase_params=pp,
        )
        sr = SurfaceArrays(
            params={k: v[0] for k, v in scene.surface.params.items()}
        )
        ill = scene.illumination
        ir = IlluminationArrays(
            direction=ill.direction,
            irradiance=ill.irradiance[0],
            cos_cutoff=ill.cos_cutoff,
            sky_radiance=ill.sky_radiance[0],
            position=None,
        )
        dirs = jnp.asarray(sensor.directions)

        one_shot = _render_row(
            cfg, n_pix, spp, mr, sr, ir, dirs, key
        )
        regen = _render_row_regen(
            cfg, n_pix, spp, mr, sr, ir, dirs, key
        )
        np.testing.assert_allclose(
            np.asarray(one_shot[0]), np.asarray(regen[0]), rtol=2e-5,
            atol=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(one_shot[1]), np.asarray(regen[1]), rtol=2e-5,
            atol=1e-8,
        )


class TestRayleighDolpClosedForm:
    def test_single_scattering_limit(self):
        """Thin Rayleigh layer over a black surface: DoLP of
        singly-scattered light equals (1 - cos^2 Theta)/(1 + cos^2 Theta)
        with Theta the scattering angle (depolarization 0)."""
        from eradiate_tpu.ops.tracer_polarized import render_polarized

        sza = 60.0
        # tau = 0.1: enough collisions for the DoLP ratio to converge
        # (DoLP is tau-independent at max_depth=1, which cuts the path at
        # the first volume event so only single scattering contributes)
        scene = make_scene(
            sigma_t=1e-3, albedo=1.0, reflectance=0.0, sza_deg=sza
        )
        vzas = np.array([-60.0, -30.0, 0.0, 30.0, 60.0])
        sensor = make_sensor(vzas)
        cfg = SceneConfig(surface_kind="black", polarized=True, max_depth=1)
        r = render_polarized(scene, sensor, cfg, spp=65536, seed=1)
        st = np.asarray(r["stokes"])[0]  # [N, 4]
        I = st[:, 0]
        dolp = np.sqrt(st[:, 1] ** 2 + st[:, 2] ** 2) / np.maximum(I, 1e-30)

        # scattering angle between sun propagation d_sun and view
        # propagation -w_v (principal plane)
        d_sun = np.array([
            -np.sin(np.deg2rad(sza)), 0.0, -np.cos(np.deg2rad(sza))
        ])
        dirs = np.asarray(sensor.directions)
        cos_theta = np.sum(d_sun * (-dirs), axis=-1)
        expected = (1 - cos_theta**2) / (1 + cos_theta**2)
        np.testing.assert_allclose(dolp, expected, atol=0.03)


class TestTwoLayerTransmittanceColumn:
    def test_absorbing_layers_closed_form(self):
        """Absorption-only two-layer column (albedo 0): the only non-zero
        path is sun -> surface -> sensor with deterministic transmittance
        exp(-tau (1/mu_s + 1/mu_v)); BRF = rho * T."""
        import jax.numpy as jnp

        from eradiate_tpu.ops.medium import cumulative_tau
        from eradiate_tpu.ops.scene_state import (
            IlluminationArrays,
            MediumArrays,
            SceneArrays,
            SurfaceArrays,
        )

        sza, rho = 30.0, 0.6
        z = jnp.asarray([0.0, 30.0, 100.0])
        sig = jnp.asarray([[2e-3, 5e-4]])  # two layers, different sigma
        med = MediumArrays(
            z_levels=z,
            tau_levels=cumulative_tau(sig, z),
            albedo=jnp.zeros((1, 2)),
            phase_weights=jnp.ones((1, 1, 2)),
            phase_params=({"depol": jnp.zeros((1, 2))},),
        )
        surf = SurfaceArrays(params={"reflectance": jnp.full(1, rho)})
        szar = np.deg2rad(sza)
        illum = IlluminationArrays(
            direction=jnp.asarray([-np.sin(szar), 0.0, -np.cos(szar)]),
            irradiance=jnp.ones(1),
            cos_cutoff=1.0,
            sky_radiance=jnp.zeros(1),
        )
        scene = SceneArrays(medium=med, surface=surf, illumination=illum)
        vzas = np.array([0.0, 45.0])
        sensor = make_sensor(vzas)
        spp = 65536
        r = render(scene, sensor, SceneConfig(), spp=spp, seed=0)
        tau_tot = 2e-3 * 30.0 + 5e-4 * 70.0
        mu_s = np.cos(szar)
        mu_v = np.cos(np.deg2rad(vzas))
        expected = (
            rho / np.pi * mu_s * np.exp(-tau_tot * (1 / mu_s + 1 / mu_v))
        )
        # collision sampling along the camera leg is analog (stochastic):
        # gate at 4 sigma of the measured per-sample variance
        got = np.asarray(r["radiance"])[0]
        sig = np.sqrt(np.asarray(r["m2"])[0] / spp)
        assert np.all(np.abs(got - expected) < 4 * sig + 1e-6), (
            got, expected, sig,
        )


class TestF32NoiseFloor:
    def test_quantified_vs_analytic_at_high_spp(self):
        """Quantify the f32-path accumulation floor at spp ~1e5 against
        the ANALYTIC value (0.5 exactly — sharper than any x64 run could
        be, since the deterministic Lambertian scene makes every sample
        identical, so any deviation is pure accumulation error): <1e-5
        relative, the regime where the reference warns about single
        precision (scenes/measure/_core.py:177-184)."""
        scene = make_scene(sigma_t=0.0, reflectance=0.5, sza_deg=30.0)
        sensor = make_sensor(np.array([0.0, 30.0]))
        r32 = render(scene, sensor, SceneConfig(), spp=131072, seed=0)
        brf32 = np.asarray(r32["radiance"]) * np.pi / np.cos(np.deg2rad(30.0))
        err = np.max(np.abs(brf32 - 0.5))
        assert err < 1e-5, f"f32 accumulation floor {err:.2e} exceeds 1e-5"
