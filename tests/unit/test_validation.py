"""Unit tests: dataset schema validation
(reference ``data/_validation.py`` + ``data/schemas/*.yml``).

xarray is not available in this environment; validation is exercised with
the package's lightweight labeled arrays (structural checks) and a minimal
duck-typed variable (dims/values/attrs) for unit-compatibility coverage.
"""

import numpy as np
import pytest

from eradiate_tpu import xr
from eradiate_tpu.data.validation import (
    DatasetSchemaError,
    validate_dataset,
)


class _Var:
    def __init__(self, values, dims, attrs=None):
        self.values = np.asarray(values)
        self.dims = tuple(dims)
        self.attrs = dict(attrs or {})


class _DuckDataset:
    """Duck-typed dataset: coords/data_vars of _Var (like xarray)."""

    def __init__(self, coords=None, data_vars=None, attrs=None):
        self.coords = dict(coords or {})
        self.data_vars = dict(data_vars or {})
        self.attrs = dict(attrs or {})

    def __contains__(self, key):
        return key in self.data_vars

    def __getitem__(self, key):
        return self.data_vars[key]

    def keys(self):
        return self.data_vars.keys()


def _srf_duck(units_w="nm", srf_kind=float, extra=False):
    w = np.linspace(500, 600, 11)
    ds = _DuckDataset(
        coords={"w": _Var(w, ("w",), {"units": units_w})},
        data_vars={
            "srf": _Var(
                np.ones(11, dtype=srf_kind), ("w",), {"units": "dimensionless"}
            )
        },
    )
    if extra:
        ds.data_vars["bogus"] = _Var(np.ones(11), ("w",))
    return ds


def test_valid_srf_passes():
    assert validate_dataset(_srf_duck(), "srf_v1") == []


def test_srf_wrong_units_fails():
    with pytest.raises(DatasetSchemaError, match="incompatible"):
        validate_dataset(_srf_duck(units_w="kg"), "srf_v1")


def test_srf_wrong_dtype_fails():
    errors = validate_dataset(
        _srf_duck(srf_kind=np.int32), "srf_v1", raise_on_error=False
    )
    assert any("dtype" in e for e in errors)


def test_srf_unknown_var_fails():
    errors = validate_dataset(
        _srf_duck(extra=True), "srf_v1", raise_on_error=False
    )
    assert any("unknown data variables" in e for e in errors)


def test_missing_variable_reported():
    ds = _DuckDataset()
    errors = validate_dataset(ds, "srf_v1", raise_on_error=False)
    assert any("missing" in e and "srf" in e for e in errors)
    assert any("missing" in e and "'w'" in e for e in errors)


def test_particle_schema():
    nw, nmu = 3, 5
    w = np.array([400.0, 550.0, 700.0])
    mu = np.linspace(-1, 1, nmu)
    ds = _DuckDataset(
        coords={
            "w": _Var(w, ("w",), {"units": "nm"}),
            "mu": _Var(mu, ("mu",), {"units": "dimensionless"}),
            "i": _Var(np.array([0]), ("i",)),
            "j": _Var(np.array([0]), ("j",)),
        },
        data_vars={
            "sigma_t": _Var(np.ones(nw), ("w",), {"units": "1/m"}),
            "albedo": _Var(
                np.full(nw, 0.9), ("w",), {"units": "dimensionless"}
            ),
            "phase": _Var(
                np.ones((nw, nmu, 1, 1)),
                ("w", "mu", "i", "j"),
                {"units": "dimensionless"},
            ),
        },
    )
    assert validate_dataset(ds, "particle_dataset_v1") == []


def test_particle_wrong_dims():
    ds = _DuckDataset(
        coords={"w": _Var(np.ones(3), ("w",), {"units": "nm"})},
        data_vars={
            "sigma_t": _Var(np.ones((3, 1)), ("w", "x"), {"units": "1/m"}),
        },
    )
    errors = validate_dataset(ds, "particle_dataset_v1", raise_on_error=False)
    assert any("dims" in e and "sigma_t" in e for e in errors)


def test_lightweight_dataset_structural():
    """The package's own labeled arrays validate structurally (units on
    bare coords are skipped)."""
    w = np.linspace(500, 600, 11)
    ds = xr.Dataset()
    ds["srf"] = xr.DataArray(
        np.ones(11), dims=("w",), coords={"w": w},
        attrs={"units": "dimensionless"},
    )
    assert validate_dataset(ds, "srf_v1") == []


def test_unknown_schema_name():
    with pytest.raises(ValueError, match="unknown schema"):
        validate_dataset(_DuckDataset(), "nope_v9")
