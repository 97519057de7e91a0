"""Unit tests: libRadtran aerosol import (mirror of ``data/io.py:40-270``)."""

import numpy as np
import pytest

from eradiate_tpu import xr
from eradiate_tpu.data.io import load_aerosol_libradtran


def _libradtran_dataset(n_lam=3, n_hum=2, n_phamat=4, n_theta=19):
    """Synthesize a humidity-indexed libRadtran-format aerosol file."""
    wavelen = np.array([0.4, 0.55, 0.8])[:n_lam]  # micrometers
    hum = np.array([50.0, 80.0])[:n_hum]
    theta_1d = np.linspace(0.0, 180.0, n_theta)
    theta = np.broadcast_to(
        theta_1d, (n_lam, n_hum, n_phamat, n_theta)
    ).copy()
    mu = np.cos(np.deg2rad(theta_1d))
    # phamat 0 = P11 (Rayleigh-like), 1 = P12, 2 = P33, 3 = P34
    p11 = 0.75 * (1.0 + mu**2)
    comps = np.stack([p11, -0.5 * p11, 0.9 * p11, 0.1 * p11], axis=0)
    phase = np.broadcast_to(
        comps[None, None, :, :], (n_lam, n_hum, n_phamat, n_theta)
    ).copy()
    phase = phase * (1.0 + 0.1 * hum[None, :, None, None] / 100.0)
    ext = np.outer((wavelen / 0.55) ** -1.3, 1.0 + hum / 100.0)
    ssa = np.full((n_lam, n_hum), 0.95)
    return xr.Dataset(
        data_vars={
            "phase": (["nlam", "nhum", "nphamat", "nthetamax"], phase),
            "theta": (
                ["nlam", "nhum", "nphamat", "nthetamax"],
                theta,
                {"units": "degrees"},
            ),
            "ext": (["nlam", "nhum"], ext, {"units": "1/km"}),
            "ssa": (["nlam", "nhum"], ssa, {"units": ""}),
            "wavelen": (["nlam"], wavelen, {"units": "micrometer"}),
            "hum": (["nhum"], hum, {"units": "per cent"}),
        }
    )


def test_convert_shapes_and_units():
    ds = load_aerosol_libradtran(_libradtran_dataset(), hum=50.0)
    assert set(ds.data_vars) == {"sigma_t", "albedo", "phase"}
    assert ds["phase"].dims == ("w", "mu", "i", "j")
    assert ds["phase"].shape == (3, 19, 4, 4)
    np.testing.assert_allclose(ds["w"].values, [400.0, 550.0, 800.0])
    assert ds["sigma_t"].attrs["units"] == "1/km"
    # mu ascending, unique
    mu = ds["mu"].values
    assert np.all(np.diff(mu) > 0)


def test_spherical_mueller_symmetries():
    ds = load_aerosol_libradtran(_libradtran_dataset(), hum=50.0)
    p = ds["phase"].values
    np.testing.assert_allclose(p[..., 0, 0], p[..., 1, 1])
    np.testing.assert_allclose(p[..., 0, 1], p[..., 1, 0])
    np.testing.assert_allclose(p[..., 2, 2], p[..., 3, 3])
    # off-diagonal blocks not mapped stay zero
    np.testing.assert_allclose(p[..., 0, 2], 0.0)
    # P11 matches the Rayleigh-like input at mu grid points
    mu = ds["mu"].values
    np.testing.assert_allclose(
        p[0, :, 0, 0], 0.75 * (1 + mu**2) * 1.05, rtol=1e-6
    )


def test_hum_selection_and_missing_kwarg():
    data = _libradtran_dataset()
    with pytest.raises(TypeError, match="missing keyword argument 'hum'"):
        load_aerosol_libradtran(data)
    ds50 = load_aerosol_libradtran(data, hum=50.0)
    ds80 = load_aerosol_libradtran(data, hum=80.0)
    assert float(ds80["sigma_t"].values[0]) > float(ds50["sigma_t"].values[0])
    # nearest-neighbour with tolerance
    with pytest.raises(KeyError):
        load_aerosol_libradtran(data, hum=65.0, tolerance={"hum": 5.0})


def test_wbounds_filtering():
    ds = load_aerosol_libradtran(
        _libradtran_dataset(), hum=50.0, wbounds=(500.0, None)
    )
    np.testing.assert_allclose(ds["w"].values, [550.0, 800.0])


def test_roundtrip_into_particle_layer(mode_mono):
    import eradiate_tpu
    from eradiate_tpu.experiments import AtmosphereExperiment

    converted = load_aerosol_libradtran(_libradtran_dataset(), hum=50.0)
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0]],
            "spp": 16,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.3},
        atmosphere={
            "type": "heterogeneous",
            "molecular_atmosphere": None,
            "particle_layers": [
                {
                    "type": "particle_layer",
                    "bottom": 0.0,
                    "top": 2.0,
                    "tau_ref": 0.2,
                    "dataset": converted,
                }
            ],
        },
    )
    result = eradiate_tpu.run(exp)
    brf = float(np.asarray(result["brf"]).ravel()[0])
    assert np.isfinite(brf) and brf > 0.0
