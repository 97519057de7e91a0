"""NetCDF-4 (h5py) dataset import tests using files written with h5py."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from eradiate_tpu.data import netcdf


def write_nc(path, variables, attrs=None):
    with h5py.File(path, "w") as f:
        for name, (data, var_attrs) in variables.items():
            d = f.create_dataset(name, data=data)
            for k, v in (var_attrs or {}).items():
                d.attrs[k] = v
        for k, v in (attrs or {}).items():
            f.attrs[k] = v


def test_read_netcdf(tmp_path):
    path = tmp_path / "x.nc"
    write_nc(
        path,
        {"a": (np.arange(3.0), {"units": "m"})},
        attrs={"title": "test"},
    )
    ds = netcdf.read_netcdf(path)
    assert ds["attrs"]["title"] == "test"
    np.testing.assert_array_equal(ds["variables"]["a"][0], [0, 1, 2])


def test_load_srf(tmp_path):
    path = tmp_path / "srf.nc"
    w_um = np.linspace(0.5, 0.6, 11)
    v = np.exp(-0.5 * ((w_um - 0.55) / 0.02) ** 2)
    write_nc(path, {"w": (w_um, {"units": "micron"}), "srf": (v, {})})
    srf = netcdf.load_srf_netcdf(path)
    assert srf.w[0] == pytest.approx(500.0)
    assert srf.eval(550.0) == pytest.approx(1.0, rel=1e-3)


def test_load_solar(tmp_path):
    path = tmp_path / "sun.nc"
    w = np.linspace(300, 2500, 23)
    ssi = np.full(23, 1.5)
    write_nc(path, {"w": (w, {"units": "nm"}), "ssi": (ssi, {"units": "W/m^2/nm"})})
    w_nm, vals = netcdf.load_solar_netcdf(path)
    np.testing.assert_allclose(vals, 1.5)


def test_load_aerosol(tmp_path):
    path = tmp_path / "aer.nc"
    w = np.linspace(400, 800, 5)
    mu = np.linspace(-1, 1, 21)
    phase = np.broadcast_to(
        (1 / (4 * np.pi)) * np.ones(21)[None, :, None, None], (5, 21, 1, 1)
    ).copy()
    write_nc(
        path,
        {
            "w": (w, {"units": "nm"}),
            "sigma_t": (np.ones(5), {}),
            "albedo": (np.full(5, 0.9), {}),
            "mu": (mu, {}),
            "phase": (phase, {}),
        },
    )
    ds = netcdf.load_aerosol_netcdf(path)
    assert ds.phase.shape == (5, 21)
    np.testing.assert_allclose(ds.eval_albedo([550.0]), 0.9)


def test_load_thermoprops(tmp_path):
    path = tmp_path / "tp.nc"
    z = np.linspace(0, 100000.0, 51)  # meters
    p = 101325.0 * np.exp(-z / 8000.0)
    t = np.full(51, 250.0)
    write_nc(
        path,
        {
            "z": (z, {"units": "m"}),
            "p": (p, {"units": "Pa"}),
            "t": (t, {"units": "K"}),
            "x_H2O": (np.full(51, 1e-3), {}),
        },
    )
    prof = netcdf.load_thermoprops_netcdf(path)
    assert prof.z[-1] == pytest.approx(100.0)
    assert "H2O" in prof.x
    assert prof.n[0] > prof.n[-1]
