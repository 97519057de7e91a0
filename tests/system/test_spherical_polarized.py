"""System tests: polarized transport in spherical-shell geometry.

Oracles:
- Consistency with the plane-parallel polarized tracer at nadir/moderate
  SZA where earth curvature is negligible: Stokes I and DoLP agree within
  combined MC error.
- A Rayleigh shell over a dark surface polarizes strongly near 90 deg
  scattering angle (same physics as the plane-parallel case).
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


def _run(geometry, spp=2048, vza=45.0, sza=60.0, vaa=180.0):
    eradiate_tpu.root_seed_state.reset(42)
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": sza, "azimuth": 0.0,
                      "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[vza, vaa]],
            "spp": spp,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.05},
        atmosphere={"type": "homogeneous", "sigma_s": 0.02, "top": 20.0},
        geometry=geometry,
    )
    return eradiate_tpu.run(exp)


def test_spherical_polarized_runs_and_polarizes(mode_mono_polarized):
    res = _run({"type": "spherical_shell", "toa_altitude": 20.0})
    I = float(np.asarray(res["I"]).ravel()[0])
    dolp = float(np.asarray(res["dolp"]).ravel()[0])
    assert np.isfinite(I) and I > 0
    assert 0.0 <= dolp <= 1.0
    # single-scattering-dominated Rayleigh at ~75 deg scattering angle over
    # a dark surface: clearly polarized
    assert dolp > 0.2


def test_spherical_matches_plane_parallel_polarized(mode_mono_polarized):
    res_pp = _run({"type": "plane_parallel", "toa_altitude": 20.0})
    res_ss = _run({"type": "spherical_shell", "toa_altitude": 20.0})

    I_pp = float(np.asarray(res_pp["I"]).ravel()[0])
    I_ss = float(np.asarray(res_ss["I"]).ravel()[0])
    var_pp = float(np.asarray(res_pp["var"]).ravel()[0])
    var_ss = float(np.asarray(res_ss["var"]).ravel()[0])
    sigma = np.sqrt(var_pp + var_ss)
    # curvature + majorant-sampling differences stay within a few percent
    assert abs(I_pp - I_ss) < max(5 * sigma, 0.05 * I_pp)

    q_pp = float(np.asarray(res_pp["Q"]).ravel()[0])
    q_ss = float(np.asarray(res_ss["Q"]).ravel()[0])
    # Q must agree in sign and rough magnitude (same meridian convention)
    assert np.sign(q_pp) == np.sign(q_ss)
    assert abs(q_pp - q_ss) < max(0.15 * abs(q_pp), 5 * sigma)


def test_spherical_polarized_v_zero(mode_mono_polarized):
    # Rayleigh + lambertian never generates circular polarization
    res = _run({"type": "spherical_shell", "toa_altitude": 20.0}, spp=512)
    V = float(np.asarray(res["V"]).ravel()[0])
    I = float(np.asarray(res["I"]).ravel()[0])
    assert abs(V) < 1e-6 * max(I, 1e-12)


def test_scalar_consistency(mode_mono_polarized):
    """The polarized spherical tracer's I component must match the scalar
    spherical tracer: both consume the same RNG slot layout, so a shared
    seed traces identical sample paths (pins the batched-uniform layout)."""
    import eradiate_tpu
    from eradiate_tpu.experiments import AtmosphereExperiment

    kwargs = dict(
        geometry={"type": "spherical_shell"},
        illumination={"type": "directional", "zenith": 40.0},
        measures={
            "type": "mdistant", "construct": "hplane",
            "zeniths": [0.0, 30.0], "azimuth": 0.0, "spp": 512, "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.4},
        atmosphere={"type": "molecular"},
    )
    eradiate_tpu.set_mode("mono_single")
    eradiate_tpu.root_seed_state.reset(11)
    r_s = eradiate_tpu.run(AtmosphereExperiment(**kwargs))
    eradiate_tpu.set_mode("mono_polarized_single")
    eradiate_tpu.root_seed_state.reset(11)
    r_p = eradiate_tpu.run(AtmosphereExperiment(**kwargs))
    # tolerance note: both tracers consume the same uniforms, but the
    # scalar one samples phase params through the bf16 hi/lo prefetch while
    # the polarized one fetches exactly — ~1e-5 parameter differences
    # occasionally flip a branch (collide/RR) and decouple a small fraction
    # of paths, so agreement is sub-MC-noise but not bit-level
    np.testing.assert_allclose(
        r_s["radiance"].values, r_p["radiance"].values, rtol=0.02
    )
