"""Unit tests: physics layer (rayleigh, thermoprops, zgrid, radprofile,
absorption)."""

import numpy as np
import pytest

from eradiate_tpu.physics import absorption, radprofile, rayleigh, thermoprops, zgrid


class TestRayleigh:
    def test_sigma_s_550(self):
        # Literature value for air at 550 nm, standard conditions:
        # sigma_s ~ 1.15e-2 km^-1 (e.g. Bucholtz 1995: ~1.162e-2)
        val = rayleigh.compute_sigma_s_air(550.0)
        assert 1.0e-2 < val < 1.3e-2

    def test_published_cross_sections_and_depths(self):
        """Pin the Rayleigh path to externally published numbers (not
        self-derived): per-molecule scattering cross-sections and the
        sea-level Rayleigh optical depth as published by Bodhaine et al.
        1999 (J. Atmos. Ocean. Tech. 16, Table 3 / eq. 30) and Bucholtz
        1995 (Appl. Opt. 34). The anchor values below are the commonly
        quoted table entries transcribed at reduced precision (offline
        environment), so tolerances are set at 2% — far tighter than any
        plausible implementation bug (wrong King factor ~ +5%, missing
        dispersion ~ +10% at 300 nm, wrong density convention ~ x1e3).

        Column for tau: N = P0 / (m_air g) * Na with P0 = 1013.25 hPa
        (Bodhaine's sea-level convention)."""
        n_cm3 = rayleigh.STANDARD_AIR_NUMBER_DENSITY_KM3 / 1e15
        n_col = 1013.25e2 / (9.80665 * 28.9595e-3) * 6.02214076e23 / 1e4

        def sigma_cm2(w_nm):
            return (rayleigh.compute_sigma_s_air(w_nm) / 1e5) / n_cm3

        # sigma [cm^2/molecule]: 550 nm ~ 4.51e-27 (Bucholtz 4.514e-27),
        # 400 nm ~ 1.67e-26, 300 nm ~ 5.65e-26
        assert sigma_cm2(550.0) == pytest.approx(4.51e-27, rel=0.02)
        assert sigma_cm2(400.0) == pytest.approx(1.67e-26, rel=0.02)
        assert sigma_cm2(300.0) == pytest.approx(5.65e-26, rel=0.02)
        # sea-level tau: ~0.0973 at 550 nm, ~0.1435 at 500 nm, ~0.360
        # at 400 nm (Bodhaine eq. 30 family; quoted across the aerosol
        # literature)
        assert sigma_cm2(550.0) * n_col == pytest.approx(0.0973, rel=0.02)
        assert sigma_cm2(500.0) * n_col == pytest.approx(0.1435, rel=0.02)
        assert sigma_cm2(400.0) * n_col == pytest.approx(0.360, rel=0.02)
        # King factor of dry air at 550 nm: ~1.048 (Bodhaine Table 1)
        assert float(rayleigh.king_factor(550.0)) == pytest.approx(
            1.048, abs=0.003
        )

    def test_wavelength_scaling(self):
        # ~ lambda^-4 scaling (modulo dispersion)
        a = rayleigh.compute_sigma_s_air(400.0)
        b = rayleigh.compute_sigma_s_air(800.0)
        assert 14.0 < a / b < 19.0

    def test_density_scaling(self):
        n0 = rayleigh.STANDARD_AIR_NUMBER_DENSITY_KM3
        a = rayleigh.compute_sigma_s_air(550.0, n0)
        b = rayleigh.compute_sigma_s_air(550.0, n0 / 2)
        assert a / b == pytest.approx(2.0, rel=1e-3)

    def test_king_factor_range(self):
        F = rayleigh.king_factor(np.array([250.0, 550.0, 1000.0]))
        assert np.all(F > 1.0) and np.all(F < 1.1)
        # decreasing with wavelength
        assert F[0] > F[1] > F[2]

    def test_depolarization(self):
        rho = rayleigh.depolarization_bates(550.0)
        # Literature: ~0.028-0.031 at 550 nm
        assert 0.02 < rho < 0.04
        F = rayleigh.depol_to_king(rho)
        np.testing.assert_allclose(F, rayleigh.king_factor(550.0), rtol=1e-10)

    def test_refractive_index(self):
        eta = rayleigh.air_refractive_index(550.0)
        assert 1.00025 < eta < 1.00030

    def test_broadcast(self):
        w = np.array([400.0, 550.0, 700.0])
        n = np.full(5, rayleigh.STANDARD_AIR_NUMBER_DENSITY_KM3)
        out = rayleigh.compute_sigma_s_air(w[:, None], n[None, :])
        assert out.shape == (3, 5)


class TestThermoprops:
    def test_ussa_surface(self):
        p = thermoprops.ussa1976(np.array([0.0]))
        assert p.p[0] == pytest.approx(101325.0)
        assert p.t[0] == pytest.approx(288.15)

    def test_ussa_tropopause(self):
        p = thermoprops.ussa1976(np.array([11.0, 15.0]))
        # T at 11 km geometric ~ 216.77 K (vs 216.65 at 11 km')
        assert p.t[0] == pytest.approx(216.65, abs=0.5)
        assert p.t[1] == pytest.approx(216.65, abs=0.5)
        # p at 11 km ~ 22700 Pa
        assert p.p[0] == pytest.approx(22632.0, rel=0.01)

    def test_ussa_monotone_pressure(self):
        p = thermoprops.ussa1976(np.linspace(0, 120, 241))
        assert np.all(np.diff(p.p) < 0)

    def test_number_density(self):
        p = thermoprops.ussa1976(np.array([0.0]))
        # n = p/(kT) = 101325/(1.380649e-23*288.15) = 2.547e25 m^-3 = 2.547e34 km^-3
        assert p.n[0] == pytest.approx(2.547e34, rel=1e-3)

    def test_afgl_variants(self):
        from eradiate_tpu.physics.afgl1986_data import AFGL_GAS, AFGL_SURFACE
        from eradiate_tpu.physics.thermoprops import _DU, _column_pwv_cm

        for v in (
            "us_standard", "tropical", "midlatitude_summer",
            "midlatitude_winter", "subarctic_summer", "subarctic_winter",
        ):
            prof = thermoprops.afgl_1986(v)
            assert prof.z.size == 50  # native AFGL grid
            assert "H2O" in prof.x and "CO2" in prof.x
            assert np.all(np.diff(prof.p) < 0)
            # calibrated columns reproduce the published amounts
            pwv = _column_pwv_cm(prof.z, prof.n / 1e9, prof.x["H2O"])
            assert pwv == pytest.approx(AFGL_GAS[v]["pwv_cm"], rel=0.02)
            o3 = np.trapezoid(prof.x["O3"] * prof.n / 1e9, prof.z * 1e3) / _DU
            assert o3 == pytest.approx(AFGL_GAS[v]["o3_du"], rel=0.01)
            assert prof.p[0] == pytest.approx(AFGL_SURFACE[v][0], rel=1e-6)
        t = thermoprops.afgl_1986("tropical")
        u = thermoprops.afgl_1986("us_standard")
        assert t.t[0] > u.t[0]
        # tropical tropopause: cold point ~195 K near 17 km
        i = np.searchsorted(t.z, 17.0)
        assert t.t[i] == pytest.approx(194.8, abs=0.5)

    def test_afgl_us_standard_matches_ussa76(self):
        """The AFGL US-standard table IS USSA76: hydrostatic reconstruction
        must agree with the analytic solver below 80 km (above, the table's
        real thermospheric warming deliberately replaces the old isothermal
        extension)."""
        a = thermoprops.afgl_1986("us_standard")
        u = thermoprops.ussa1976(a.z)
        sel = a.z <= 80.0
        assert np.max(np.abs(a.p[sel] / u.p[sel] - 1)) < 0.005
        assert np.max(np.abs(a.t[sel] - u.t[sel])) < 2.0

    def test_interp(self):
        prof = thermoprops.ussa1976()
        fine = prof.interp(np.linspace(0, 50, 501))
        assert fine.z.size == 501
        assert np.all(np.diff(fine.p) < 0)

    def test_make_profile_id(self):
        prof = thermoprops.make_profile("afgl_1986-us_standard")
        assert prof.id == "afgl_1986-us_standard"


class TestZGrid:
    def test_regular(self):
        g = zgrid.ZGrid.regular(0.0, 120.0, 0.1)
        assert g.n_layers == 1200
        assert g.bottom == 0.0 and g.top == 120.0
        np.testing.assert_allclose(g.layer_height, 0.1)

    def test_layers_midpoints(self):
        g = zgrid.ZGrid([0.0, 1.0, 3.0])
        np.testing.assert_allclose(g.layers, [0.5, 2.0])

    def test_validation(self):
        with pytest.raises(ValueError):
            zgrid.ZGrid([1.0, 0.5])


class TestRadProfile:
    def test_rayleigh_only_profile(self):
        rp = radprofile.AtmosphereRadProfile(absorption_data=None)
        g = zgrid.ZGrid.regular(0.0, 120.0, 1.0)
        w = np.array([440.0, 550.0, 660.0])
        sig_s = rp.eval_sigma_s(w, g)
        assert sig_s.shape == (3, 120)
        # decreasing with altitude (density)
        assert np.all(np.diff(sig_s, axis=1) < 0)
        albedo = rp.eval_albedo(w, g)
        np.testing.assert_allclose(albedo, 1.0)  # no absorption

    def test_optical_depth_magnitude(self):
        # Vertical Rayleigh optical depth at 550 nm ~ 0.09-0.10
        rp = radprofile.AtmosphereRadProfile()
        g = zgrid.ZGrid.regular(0.0, 120.0, 0.1)
        sig = rp.eval_sigma_t(np.array([550.0]), g)
        tau = np.sum(sig * g.layer_height, axis=1)
        assert 0.08 < tau[0] < 0.11

    def test_depolarization_modes(self):
        g = zgrid.ZGrid.regular(0.0, 10.0, 1.0)
        rp = radprofile.AtmosphereRadProfile(rayleigh_depolarization="bates")
        d = rp.eval_depolarization(np.array([550.0]), g)
        assert d.shape == (1, 10)
        rp2 = radprofile.AtmosphereRadProfile(rayleigh_depolarization=0.0)
        np.testing.assert_allclose(rp2.eval_depolarization(np.array([550.0]), g), 0.0)

    def test_array_profile(self):
        z = np.array([0.0, 1.0, 2.0])
        rp = radprofile.ArrayRadProfile(
            w_nm=[500.0, 600.0],
            sigma_t=[[1.0, 2.0], [3.0, 4.0]],
            albedo=[[0.5, 0.5], [1.0, 1.0]],
            z_levels_km=z,
        )
        g = zgrid.ZGrid(z)
        out = rp.eval_sigma_t(np.array([550.0]), g)
        np.testing.assert_allclose(out, [[2.0, 3.0]])


class TestAbsorption:
    def test_synthetic_mono(self):
        db = absorption.make_synthetic_mono_db()
        prof = thermoprops.ussa1976(np.linspace(0, 100, 51))
        sig = db.eval_sigma_a(np.array([500.0, 1500.0]), prof)
        assert sig.shape == (2, 51)
        assert np.all(sig >= 0)
        # decreasing with altitude (pressure scaling)
        assert sig[0, 0] > sig[0, -1]

    def test_synthetic_ckd(self):
        db = absorption.make_synthetic_ckd_db()
        prof = thermoprops.ussa1976(np.linspace(0, 100, 26))
        sig = db.eval_sigma_a_bin_g(
            np.array([555.0, 555.0]), np.array([0.1, 0.9]), prof
        )
        assert sig.shape == (2, 26)
        # k increases with g within a bin
        assert sig[1, 0] > sig[0, 0]

    def test_bounds_policy(self):
        db = absorption.make_synthetic_mono_db()
        db_raise = absorption.MonoAbsorptionDatabase(
            db._d, error_handling={"p": "raise", "t": "clamp", "x": "clamp"}
        )
        prof = thermoprops.ThermoProfile.from_arrays(
            np.array([0.0]), np.array([1e7]), np.array([288.0])
        )
        with pytest.raises(ValueError):
            db_raise.eval_sigma_a(np.array([500.0]), prof)

    def test_ckd_grid_export(self):
        db = absorption.make_synthetic_ckd_db()
        grid = db.spectral_grid()
        assert len(grid) == db.wcenters.size
