"""AFGL 1986 gas-table fidelity gates (VERDICT r2 task #2).

Checks the tabulated mole-fraction profiles
(:mod:`eradiate_tpu.physics.afgl1986_data`) against the published
per-variant column amounts and well-known physical invariants, and that
the absorption interpolator actually consumes the per-species axes.
Mirrors the role of joseki's dataset tests behind the reference's
``src/eradiate/scenes/atmosphere/_molecular.py:80-84``.
"""

import numpy as np
import pytest

from eradiate_tpu.physics import afgl1986_data as d
from eradiate_tpu.physics.thermoprops import (
    _DU,
    K_BOLTZMANN,
    _column_pwv_cm,
    afgl_1986,
)

VARIANTS = sorted(d.AFGL_TEMPERATURE)
SPECIES = ["H2O", "CO2", "O3", "N2O", "CO", "CH4", "O2", "N2"]


@pytest.mark.parametrize("ident", VARIANTS)
def test_columns_match_published(ident):
    """PWV and O3 columns of the delivered profile equal the published
    AFGL per-variant values (the tables are column-calibrated)."""
    prof = afgl_1986(ident)
    n_m3 = prof.n / 1e9
    pwv = _column_pwv_cm(prof.z, n_m3, prof.x["H2O"])
    du = np.trapezoid(prof.x["O3"] * n_m3, prof.z * 1e3) / _DU
    gas = d.AFGL_GAS[ident]
    assert pwv == pytest.approx(gas["pwv_cm"], rel=1e-6)
    assert du == pytest.approx(gas["o3_du"], rel=1e-6)


@pytest.mark.parametrize("ident", VARIANTS)
def test_column_calibration_is_near_unity(ident):
    """The raw transcribed tables already reproduce the published columns
    to within a few percent — the calibration factor must stay near 1
    (a large factor would mean the transcription itself is off)."""
    t = d.AFGL_TEMPERATURE[ident]
    from eradiate_tpu.physics.thermoprops import _hydrostatic_pressure

    p = _hydrostatic_pressure(d.AFGL_Z_KM, t, d.AFGL_SURFACE[ident][0])
    n = p / (K_BOLTZMANN * t)
    pwv_raw = _column_pwv_cm(d.AFGL_Z_KM, n, d.AFGL_H2O_PPMV[ident] * 1e-6)
    du_raw = (
        np.trapezoid(d.AFGL_O3_PPMV[ident] * 1e-6 * n, d.AFGL_Z_KM * 1e3)
        / _DU
    )
    gas = d.AFGL_GAS[ident]
    assert 0.8 < pwv_raw / gas["pwv_cm"] < 1.25
    assert 0.8 < du_raw / gas["o3_du"] < 1.25


@pytest.mark.parametrize("ident", VARIANTS)
def test_all_major_species_present(ident):
    prof = afgl_1986(ident)
    for sp in SPECIES:
        assert sp in prof.x, sp
        assert prof.x[sp].shape == prof.z.shape
        assert np.all(prof.x[sp] >= 0)
    # mole fractions must stay physical
    total = sum(prof.x[sp] for sp in SPECIES)
    assert np.all(total < 1.05)


def test_variant_ordering_pwv():
    """Published climatology ordering: tropical wettest, subarctic winter
    driest; same ordering must hold for the tabulated profiles."""

    def pwv(ident):
        prof = afgl_1986(ident)
        return _column_pwv_cm(prof.z, prof.n / 1e9, prof.x["H2O"])

    assert (
        pwv("tropical")
        > pwv("midlatitude_summer")
        > pwv("subarctic_summer")
        > pwv("us_standard")
        > pwv("midlatitude_winter")
        > pwv("subarctic_winter")
    )


def test_o3_peak_altitude_ordering():
    """The ozone *number-density* peak sits lower at high latitudes
    (published shapes: ~26 km tropical, ~18-22 km subarctic winter)."""

    def peak_km(ident):
        prof = afgl_1986(ident)
        return prof.z[np.argmax(prof.x["O3"] * prof.n)]

    assert peak_km("tropical") >= peak_km("midlatitude_summer")
    assert peak_km("midlatitude_summer") >= peak_km("subarctic_winter")
    assert 22.0 <= peak_km("tropical") <= 30.0
    assert 15.0 <= peak_km("subarctic_winter") <= 24.0


def test_surface_values_match_published():
    """Surface mole fractions of the tables agree with the AFGL_SURFACE
    anchors used since round 1 (published surface values)."""
    for ident in VARIANTS:
        p0, x_h2o_s, x_o3_s = d.AFGL_SURFACE[ident]
        assert d.AFGL_H2O_PPMV[ident][0] * 1e-6 == pytest.approx(
            x_h2o_s, rel=0.02
        )
        assert d.AFGL_O3_PPMV[ident][0] * 1e-6 == pytest.approx(
            x_o3_s, rel=0.08
        )


def test_ch4_n2o_stratospheric_decay():
    """CH4 and N2O are well-mixed in the troposphere and photolyzed
    above: tropospheric value constant within 2%, < half left by 45 km."""
    for sp, surf in (("CH4", 1.7), ("N2O", 0.32)):
        tab = d.AFGL_MINOR_PPMV[sp]
        trop = tab[d.AFGL_Z_KM <= 8]
        assert np.all(np.abs(trop / surf - 1) < 0.02)
        assert tab[d.AFGL_Z_KM == 45.0][0] < 0.5 * surf


def test_co_mesospheric_source():
    """CO has a tropospheric source, a stratospheric minimum, and a steep
    mesospheric increase (CO2 photolysis) — the published AFGL shape."""
    tab = d.AFGL_MINOR_PPMV["CO"]
    z = d.AFGL_Z_KM
    i_min = np.argmin(tab)
    assert 20.0 <= z[i_min] <= 40.0
    assert tab[z == 120.0][0] > 100 * tab[i_min]


def test_absorption_interpolator_consumes_species_axes():
    """A synthetic mono DB with an x_CH4 axis yields sigma_a that scales
    with the delivered CH4 profile — i.e. the AFGL mixing ratios actually
    drive the absorption x_* interpolation (VERDICT r2: 'the absorption
    interpolator's per-species x_* axes can never be driven with correct
    mixing ratios' — now they are)."""
    from eradiate_tpu.physics.absorption import MonoAbsorptionDatabase

    x_ax = np.array([0.0, 2.0e-6])
    p_ax = np.array([1.0, 101325.0])
    t_ax = np.array([150.0, 320.0])
    w_ax = np.array([500.0, 600.0])
    # sigma_a = 1e3 * x_CH4 (per-unit-mole-fraction table), km^-1
    sigma = np.broadcast_to(
        x_ax[None, None, None, :] * 1e3, (2, 2, 2, 2)
    ).copy()
    db = MonoAbsorptionDatabase(
        {
            "w": w_ax,
            "p": p_ax,
            "t": t_ax,
            "x_CH4": x_ax,
            "sigma_a": sigma,
        }
    )
    prof = afgl_1986("us_standard")
    got = db.eval_sigma_a(550.0, prof)[0]
    want = 1e3 * prof.x["CH4"]
    np.testing.assert_allclose(got, want, rtol=1e-6)


class TestUVTraceSpecies:
    """NO/NO2/SO2/HNO3 extension tier (approximated shapes; the module
    docstring marks them as NOT transcribed — these tests pin the
    structural facts the approximation is built on and the column
    magnitudes against typical measured values)."""

    def test_present_in_profiles(self):
        from eradiate_tpu.physics.thermoprops import afgl_1986

        prof = afgl_1986("us_standard")
        for sp in ("NO", "NO2", "SO2", "HNO3"):
            assert sp in prof.x
            assert prof.x[sp].shape == prof.z.shape
            assert np.all(prof.x[sp] > 0)

    def test_no2_stratospheric_layer(self):
        from eradiate_tpu.physics.afgl1986_data import (
            AFGL_UV_TRACE_PPMV,
            AFGL_Z_KM,
        )

        x = AFGL_UV_TRACE_PPMV["NO2"]
        z_peak = AFGL_Z_KM[np.argmax(x)]
        assert 25.0 <= z_peak <= 38.0
        # boundary-layer secondary maximum exceeds the free troposphere
        assert x[0] > x[8]

    def test_hno3_layer_below_no2(self):
        from eradiate_tpu.physics.afgl1986_data import (
            AFGL_UV_TRACE_PPMV,
            AFGL_Z_KM,
        )

        z_hno3 = AFGL_Z_KM[np.argmax(AFGL_UV_TRACE_PPMV["HNO3"])]
        z_no2 = AFGL_Z_KM[np.argmax(AFGL_UV_TRACE_PPMV["NO2"])]
        assert z_hno3 < z_no2
        assert 18.0 <= z_hno3 <= 27.0

    def test_columns_in_measured_ranges(self):
        """Vertical columns [molec cm^-2] against typical mid-latitude
        background magnitudes: NO2 1-10e15, HNO3 0.5-4e16, SO2 <2e15."""
        from eradiate_tpu.physics.thermoprops import afgl_1986

        prof = afgl_1986("us_standard")
        n_cm3 = prof.n / 1e9 / 1e6  # km^-3 -> m^-3 -> cm^-3

        def col(sp):
            return np.trapezoid(prof.x[sp] * n_cm3, prof.z * 1e5)

        assert 1e15 < col("NO2") < 1e16
        assert 5e15 < col("HNO3") < 4e16
        assert col("SO2") < 2e15

    def test_so2_decays_with_altitude(self):
        from eradiate_tpu.physics.afgl1986_data import AFGL_UV_TRACE_PPMV

        x = AFGL_UV_TRACE_PPMV["SO2"]
        assert x[0] == x.max()
        assert x[30] < 1e-5  # negligible in the upper stratosphere


class TestSingleTraceSpecies:
    """The 16 single-profile species completing joseki's 28-molecule
    afgl_1986 set (approximated-shape tier; AFGL-TR-86-0110 tabulates
    these once for all six variants, which the table mirrors). Pins the
    species roster, structural shape facts and column magnitudes."""

    JOSEKI_28 = {
        "H2O", "CO2", "O3", "N2O", "CO", "CH4", "O2",  # per-variant 7
        "NO", "SO2", "NO2", "NH3", "HNO3", "OH", "HF", "HCl", "HBr",
        "HI", "ClO", "OCS", "H2CO", "HOCl", "N2", "HCN", "CH3Cl",
        "H2O2", "C2H2", "C2H6", "PH3",
    }

    def test_roster_completes_joseki_set(self):
        from eradiate_tpu.physics.thermoprops import afgl_1986

        for variant in ("us_standard", "tropical", "subarctic_winter"):
            prof = afgl_1986(variant)
            missing = self.JOSEKI_28 - set(prof.x)
            assert not missing, f"{variant}: missing species {missing}"
            for sp in self.JOSEKI_28:
                assert prof.x[sp].shape == prof.z.shape
                assert np.all(prof.x[sp] > 0)
                assert np.all(prof.x[sp] < 1.0)

    def test_stratospheric_source_gases_increase_aloft(self):
        """HF and HCl originate from stratospheric halocarbon photolysis:
        mixing ratio at 40 km must exceed the tropospheric value."""
        from eradiate_tpu.physics.afgl1986_data import (
            AFGL_SINGLE_TRACE_PPMV,
            AFGL_Z_KM,
        )

        i_trop = np.searchsorted(AFGL_Z_KM, 5.0)
        i_strat = np.searchsorted(AFGL_Z_KM, 40.0)
        for sp in ("HF", "HCl"):
            x = AFGL_SINGLE_TRACE_PPMV[sp]
            assert x[i_strat] > 3 * x[i_trop], sp

    def test_photolysed_reservoirs_decay_aloft(self):
        """OCS / CH3Cl / C2H6 are destroyed in the stratosphere: the
        40 km value must sit far below the surface value."""
        from eradiate_tpu.physics.afgl1986_data import (
            AFGL_SINGLE_TRACE_PPMV,
            AFGL_Z_KM,
        )

        i_strat = np.searchsorted(AFGL_Z_KM, 40.0)
        for sp in ("OCS", "CH3Cl", "C2H6", "NH3", "C2H2", "H2CO"):
            x = AFGL_SINGLE_TRACE_PPMV[sp]
            assert x[i_strat] < 0.1 * x[0], sp

    def test_clo_hocl_layers(self):
        """ClO peaks in the upper stratosphere (~35-45 km), HOCl just
        below it; both are negligible at the surface."""
        from eradiate_tpu.physics.afgl1986_data import (
            AFGL_SINGLE_TRACE_PPMV,
            AFGL_Z_KM,
        )

        z_clo = AFGL_Z_KM[np.argmax(AFGL_SINGLE_TRACE_PPMV["ClO"])]
        z_hocl = AFGL_Z_KM[np.argmax(AFGL_SINGLE_TRACE_PPMV["HOCl"])]
        assert 33.0 <= z_clo <= 47.0
        assert z_hocl < z_clo
        assert AFGL_SINGLE_TRACE_PPMV["ClO"][0] < 1e-6

    def test_column_magnitudes(self):
        """Vertical columns [molec cm^-2] against typical background
        magnitudes: OCS ~1e16 (0.5 ppb well-mixed troposphere), HCN
        ~0.5e16, stratospheric HCl ~(1-3)e15 above 20 km."""
        from eradiate_tpu.physics.thermoprops import afgl_1986

        prof = afgl_1986("us_standard")
        n_cm3 = prof.n / 1e9 / 1e6

        def col(sp, z_lo=0.0):
            m = prof.z >= z_lo
            return np.trapezoid((prof.x[sp] * n_cm3)[m], prof.z[m] * 1e5)

        assert 3e15 < col("OCS") < 3e16
        assert 1e15 < col("HCN") < 2e16
        assert 5e14 < col("HCl", z_lo=20.0) < 1e16
