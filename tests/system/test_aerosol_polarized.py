"""Polarized aerosol transport: tabulated Mueller phase end to end.

Round 5: the Mie-computed continental dataset ships P12/P33/P34 rows
(``data/store/aerosol``), the particle layer compiles them to the
``tabphase_polarized``-equivalent kind in polarized modes, and the
polarized tracers consume the full block-diagonal matrix. Oracle: at
low optical depth over a black surface, TOA polarization is single-
scattering dominated, so the measured degree of linear polarization in
the principal plane must match the dataset's own -P12/P11 at the
scattering angle — a closed-loop physics pin independent of the
transport code's Mueller plumbing.
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.scenes.atmosphere.aerosols import load_particle_dataset


@pytest.fixture
def mode_polarized():
    eradiate_tpu.set_mode("mono_polarized_single")
    yield
    eradiate_tpu.set_mode("mono")


def _layer_exp(spp, vzas):
    return AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 0.0,
                      "azimuth": 0.0, "irradiance": 1.0},
        measures={"type": "mdistant", "construct": "hplane",
                  "zeniths": vzas, "azimuth": 0.0, "spp": spp, "id": "m"},
        surface={"type": "lambertian", "reflectance": 0.0},
        atmosphere={"type": "particle_layer", "tau_ref": 0.05,
                    "bottom": 0.0, "top": 1.0,
                    "dataset": "govaerts_2021-continental"},
    )


def test_polarized_mode_compiles_mueller_kind(mode_polarized):
    exp = _layer_exp(16, [30.0])
    exp.init()
    m = exp.measures[0]
    scene, _, config = exp.compile_scene(m, exp.spectral_context(m))
    assert "tab_polarized" in config.phase_kinds
    params = scene.medium.phase_params[
        config.phase_kinds.index("tab_polarized")
    ]
    for key in ("values", "cdf", "m12", "m22", "m33", "m34", "m44"):
        assert key in params
    # sphere identities survive compilation (normalization preserved
    # ratios): m22 == m11, m44 == m33
    np.testing.assert_allclose(
        np.asarray(params["m22"]), np.asarray(params["values"]), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(params["m44"]), np.asarray(params["m33"]), rtol=1e-12
    )


def test_scalar_mode_keeps_scalar_kind(mode_polarized):
    eradiate_tpu.set_mode("mono")
    exp = _layer_exp(16, [30.0])
    exp.init()
    m = exp.measures[0]
    _, _, config = exp.compile_scene(m, exp.spectral_context(m))
    assert "tab" in config.phase_kinds
    assert "tab_polarized" not in config.phase_kinds


def test_single_scatter_dolp_matches_dataset(mode_polarized):
    """tau 0.05, black ground, overhead sun: DoLP(vza) in the principal
    plane ~= |P12|/P11 at scattering angle 180 - vza, within the
    multiple-scattering contamination (~tau) and MC noise."""
    vzas = [30.0, 50.0, 70.0]
    exp = _layer_exp(131072, vzas)
    res = eradiate_tpu.run(exp)
    dolp = np.asarray(res["dolp"].values)

    ds = load_particle_dataset("govaerts_2021-continental")
    p11 = np.empty(len(vzas))
    p12 = np.empty(len(vzas))
    for k, vza in enumerate(vzas):
        # overhead sun travels -z; outgoing direction toward the sensor
        # at vza has cos(scatter) = -cos(vza)
        cs = -np.cos(np.radians(vza))
        w550 = np.argmin(np.abs(ds.w - 550.0))
        p11[k] = np.interp(cs, ds.mu, ds.phase[w550])
        p12[k] = np.interp(cs, ds.mu, ds.phase_12[w550])
    expected = np.abs(p12) / p11
    measured = dolp.ravel()
    assert measured.size == len(vzas)
    # multiple scattering (~tau = 5%) dilutes DoLP; MC noise on Q/I adds
    np.testing.assert_allclose(measured, expected, rtol=0.25, atol=0.01)
    # and the polarization must be REAL (non-trivial signal at 90-ish
    # scattering angles for Mie continental: a few percent at least)
    assert measured.max() > 0.02
