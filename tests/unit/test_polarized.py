"""Polarized transport tests.

Oracles:
- Mueller building blocks (rotator algebra, Rayleigh matrix properties);
- Rayleigh single scattering at a 90 deg scattering angle is ~fully
  polarized perpendicular to the scattering plane (DoLP ~ 1, Q < 0 in the
  meridian basis);
- Lambertian-only scenes depolarize completely and reproduce the scalar
  BRF; scalar-vs-polarized I agreement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.core.frame import angles_to_direction
from eradiate_tpu.ops import mueller
from eradiate_tpu.ops.scene_state import SceneConfig
from eradiate_tpu.ops.tracer import render
from eradiate_tpu.ops.tracer_polarized import render_polarized

from test_tracer import make_scene, make_sensor


class TestMueller:
    def test_rotator_composition(self):
        a, b = 0.3, 0.5
        R = mueller.rotator(jnp.asarray(a)) @ mueller.rotator(jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(R), np.asarray(mueller.rotator(jnp.asarray(a + b))), atol=1e-6
        )

    def test_rayleigh_m00_is_scalar_phase(self):
        from eradiate_tpu.ops.phase_ops import rayleigh_eval

        for depol in (0.0, 0.03, 0.1):
            for c in (-0.7, 0.0, 0.9):
                m = mueller.rayleigh_mueller(jnp.asarray(c), jnp.asarray(depol))
                np.testing.assert_allclose(
                    float(m[0, 0]),
                    float(rayleigh_eval(jnp.asarray(depol), jnp.asarray(c))),
                    rtol=1e-5,
                )

    def test_rayleigh_90deg_fully_polarized(self):
        m = mueller.rayleigh_mueller(jnp.asarray(0.0), jnp.asarray(0.0))
        # unpolarized in -> Q/I = m10/m00 = -1 at 90 deg
        np.testing.assert_allclose(float(m[1, 0] / m[0, 0]), -1.0, rtol=1e-6)

    def test_basis_rotation_roundtrip(self):
        d = jnp.asarray([0.0, 0.0, 1.0])
        b1 = jnp.asarray([1.0, 0.0, 0.0])
        b2 = jnp.asarray([0.0, 1.0, 0.0])
        ang = mueller.rotate_basis_angle(d, b1, b2)
        np.testing.assert_allclose(abs(float(ang)), np.pi / 2, rtol=1e-6)
        S = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        S2 = mueller.stokes_rotate_to_basis(S, d, b1, b2)
        # rotating the basis by 90 deg flips Q
        np.testing.assert_allclose(np.asarray(S2), [1.0, -1.0, 0.0, 0.0], atol=1e-6)

    def test_default_basis_perpendicular(self):
        for theta, phi in [(0.3, 1.0), (1.2, 4.0), (0.0, 0.0)]:
            d = angles_to_direction([theta, phi])[0]
            b = mueller.default_basis(jnp.asarray(d))
            assert abs(float(jnp.dot(b, jnp.asarray(d)))) < 1e-6
            np.testing.assert_allclose(float(jnp.linalg.norm(b)), 1.0, rtol=1e-6)


class TestPolarizedTracer:
    def test_lambertian_depolarized_brf(self):
        scene = make_scene(sigma_t=0.0, reflectance=0.5, sza_deg=30.0)
        sensor = make_sensor(np.linspace(-60, 60, 5))
        cfg = SceneConfig(polarized=True)
        result = render_polarized(scene, sensor, cfg, spp=1, seed=0)
        stokes = np.asarray(result["stokes"][0])
        brf = stokes[:, 0] * np.pi / np.cos(np.deg2rad(30.0))
        np.testing.assert_allclose(brf, 0.5, atol=1e-5)
        np.testing.assert_allclose(stokes[:, 1:], 0.0, atol=1e-7)

    def test_rayleigh_90deg_dolp(self):
        """Thin Rayleigh layer, black surface, scattering angle 90 deg:
        DoLP ~ 1 and polarization perpendicular to the scattering plane
        (Q < 0 in the meridian basis)."""
        scene = make_scene(
            sigma_t=1e-4, albedo=1.0, reflectance=0.0, sza_deg=60.0, depol=0.0
        )
        from eradiate_tpu.ops.scene_state import SceneArrays, SurfaceArrays

        scene = SceneArrays(
            medium=scene.medium,
            surface=SurfaceArrays(params={}),
            illumination=scene.illumination,
        )
        # sun azimuth 0 (propagation toward -x, down); view at vza=30,
        # vaa=180 -> scattering angle 90 deg in the principal plane
        sensor = make_sensor(np.array([30.0]), vaa_deg=180.0)
        cfg = SceneConfig(surface_kind="black", polarized=True, max_depth=2)
        result = render_polarized(scene, sensor, cfg, spp=4096, seed=0)
        I, Q, U, V = np.asarray(result["stokes"])[0, 0]
        dolp = np.sqrt(Q**2 + U**2) / I
        assert dolp > 0.95, (I, Q, U, V)
        assert Q < 0
        assert abs(U) < 0.05 * abs(Q)
        assert abs(V) < 1e-6 * I + 1e-12

    def test_scalar_consistency_single_scattering(self):
        """I of the polarized tracer matches the scalar tracer for
        single-scattering-dominated scenes (identical sample streams)."""
        scene = make_scene(sigma_t=5e-5, albedo=1.0, reflectance=0.3, sza_deg=40.0)
        sensor = make_sensor(np.array([0.0, 45.0]))
        cfg_s = SceneConfig()
        cfg_p = SceneConfig(polarized=True)
        r_s = render(scene, sensor, cfg_s, spp=512, seed=3)
        r_p = render_polarized(scene, sensor, cfg_p, spp=512, seed=3)
        np.testing.assert_allclose(
            np.asarray(r_p["radiance"]), np.asarray(r_s["radiance"]), rtol=1e-4
        )

    def test_depol_reduces_dolp(self):
        results = {}
        for depol in (0.0, 0.1):
            scene = make_scene(
                sigma_t=1e-4, albedo=1.0, reflectance=0.0, sza_deg=60.0, depol=depol
            )
            from eradiate_tpu.ops.scene_state import SceneArrays, SurfaceArrays

            scene = SceneArrays(
                medium=scene.medium,
                surface=SurfaceArrays(params={}),
                illumination=scene.illumination,
            )
            sensor = make_sensor(np.array([30.0]), vaa_deg=180.0)
            cfg = SceneConfig(surface_kind="black", polarized=True, max_depth=2)
            r = render_polarized(scene, sensor, cfg, spp=2048, seed=0)
            I, Q, U, V = np.asarray(r["stokes"])[0, 0]
            results[depol] = np.sqrt(Q**2 + U**2) / I
        assert results[0.1] < results[0.0]
