"""Unit tests: polarized surface BRDFs (Maignan, Mishchenko ocean).

Physics oracles:
- Fresnel: normal incidence R = ((n-1)/(n+1))^2 with zero polarization;
  Brewster incidence Rp = 0 (dielectric) so the polarized fraction is 1.
- Mishchenko glint: specular lobe peaks in the specular direction; Smith
  shadowing only dims the result.
- Maignan: scalar part reduces to RPV when C = 0; the specular peak adds
  positive polarized signal near 90 deg phase angle.
"""

import jax.numpy as jnp
import numpy as np

from eradiate_tpu.ops.bsdf_polarized import (
    fresnel_mueller_elements,
    maignan_mueller,
    ocean_mishchenko_mueller,
    surface_mueller,
)
from eradiate_tpu.ops.bsdf_ops import bsdf_eval
from eradiate_tpu.scenes.bsdfs import MaignanBSDF, OceanMishchenkoBSDF


def _row(params):
    return {k: jnp.asarray(v)[0] for k, v in params.items()}


def _dir(zenith_deg, azimuth_deg=0.0):
    t = np.deg2rad(zenith_deg)
    p = np.deg2rad(azimuth_deg)
    return jnp.asarray([[np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)]])


def test_fresnel_normal_incidence():
    n = 1.5
    a, b, c, d = fresnel_mueller_elements(
        jnp.asarray(1.0), jnp.asarray(n), jnp.asarray(0.0)
    )
    R0 = ((n - 1.0) / (n + 1.0)) ** 2
    np.testing.assert_allclose(float(a), R0, rtol=1e-5)
    np.testing.assert_allclose(float(b), 0.0, atol=1e-7)


def test_fresnel_brewster_fully_polarized():
    n = 1.5
    brewster = np.arctan(n)
    a, b, c, d = fresnel_mueller_elements(
        jnp.asarray(np.cos(brewster)), jnp.asarray(n), jnp.asarray(0.0)
    )
    # Rp = 0 -> a = Rs/2 = -b (Q fully polarized perpendicular to plane)
    np.testing.assert_allclose(float(a), -float(b), rtol=1e-4)
    assert float(a) > 0


def test_fresnel_energy_bounds():
    for cos_i in (0.05, 0.3, 0.7, 1.0):
        a, b, c, d = fresnel_mueller_elements(
            jnp.asarray(cos_i), jnp.asarray(1.33), jnp.asarray(0.05)
        )
        assert 0.0 <= float(a) <= 1.0
        assert abs(float(b)) <= float(a) + 1e-7


def test_mishchenko_specular_peak():
    params = _row(OceanMishchenkoBSDF(wind_speed=5.0).eval_params(np.array([550.0])))
    wi = _dir(30.0, 0.0)
    wo_spec = _dir(30.0, 180.0)
    wo_off = _dir(60.0, 180.0)
    M_spec = ocean_mishchenko_mueller(params, wi, wo_spec)
    M_off = ocean_mishchenko_mueller(params, wi, wo_off)
    assert float(M_spec[0, 0, 0]) > float(M_off[0, 0, 0])
    assert float(M_spec[0, 0, 0]) > 0


def test_mishchenko_shadowing_dims():
    on = _row(
        OceanMishchenkoBSDF(wind_speed=10.0, shadowing=True).eval_params(
            np.array([550.0])
        )
    )
    off = _row(
        OceanMishchenkoBSDF(wind_speed=10.0, shadowing=False).eval_params(
            np.array([550.0])
        )
    )
    wi = _dir(70.0, 0.0)
    wo = _dir(70.0, 180.0)
    assert float(ocean_mishchenko_mueller(on, wi, wo)[0, 0, 0]) < float(
        ocean_mishchenko_mueller(off, wi, wo)[0, 0, 0]
    )


def test_maignan_reduces_to_rpv_when_c_zero():
    m = MaignanBSDF(C=0.0)
    params = _row(m.eval_params(np.array([550.0])))
    wi = _dir(30.0)
    wo = _dir(45.0, 120.0)
    f_maignan = bsdf_eval("maignan", params, wi, wo)
    f_rpv = bsdf_eval("rpv", params, wi, wo)
    np.testing.assert_allclose(np.asarray(f_maignan), np.asarray(f_rpv), rtol=1e-6)


def test_maignan_peak_polarizes():
    m = MaignanBSDF(C=5.0, ndvi=0.0)
    params = _row(m.eval_params(np.array([550.0])))
    # ~90 deg phase angle: strong Fresnel polarization
    wi = _dir(45.0, 0.0)
    wo = _dir(45.0, 90.0)
    M = maignan_mueller(params, wi, wo)
    I = float(M[0, 0, 0])
    Q = float(M[0, 1, 0])
    assert I > 0
    # polarized contribution present and bounded
    assert 0 < abs(Q) < I


def test_surface_mueller_scalar_kind_is_depolarizer():
    params = {"reflectance": jnp.asarray(0.5)}
    wi = _dir(30.0)
    wo = _dir(0.0)
    M = surface_mueller("lambertian", params, wi, wo)
    f = bsdf_eval("lambertian", params, wi, wo)
    np.testing.assert_allclose(float(M[0, 0, 0]), float(f[0]), rtol=1e-6)
    assert np.allclose(np.asarray(M[0])[1:, :], 0.0)
    assert np.allclose(np.asarray(M[0])[:, 1:], 0.0)
