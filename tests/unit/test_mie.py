"""Mie solver validation (eradiate_tpu.physics.mie).

Anchors are analytic limits, not transcribed tables: the Rayleigh limit
closed form, the large-size extinction paradox, energy conservation and
the sphere polarization identities.
"""

import numpy as np
import pytest

from eradiate_tpu.physics.mie import mie_lognormal, mie_single

MU = np.linspace(-1.0, 1.0, 361)


class TestSingleSphere:
    def test_rayleigh_limit_qsca(self):
        """x << 1: Qsca -> (8/3) x^4 |(m^2-1)/(m^2+2)|^2 (van de Hulst
        6.31); Qabs -> 4 x Im(-(m^2-1)/(m^2+2))."""
        m = complex(1.5, -0.0)
        for x in (0.01, 0.03):
            Qext, Qsca, _, _ = mie_single(x, m, MU)
            lor = (m * m - 1.0) / (m * m + 2.0)
            expect = 8.0 / 3.0 * x**4 * abs(lor) ** 2
            np.testing.assert_allclose(Qsca, expect, rtol=5e-3)

    def test_rayleigh_limit_phase_shape(self):
        """Dipole scattering: S1 constant, S2 ~ mu => the intensity
        pattern follows (1 + mu^2)/2 and -P12/P11 = (1-mu^2)/(1+mu^2)."""
        _, _, S1, S2 = mie_single(0.01, complex(1.33, 0.0), MU)
        i11 = np.abs(S1) ** 2 + np.abs(S2) ** 2
        expect = 1.0 + MU**2
        np.testing.assert_allclose(
            i11 / i11[-1], expect / expect[-1], rtol=1e-3
        )
        pol = (np.abs(S1) ** 2 - np.abs(S2) ** 2) / i11
        np.testing.assert_allclose(
            pol, (1.0 - MU**2) / (1.0 + MU**2), atol=1e-3
        )

    def test_extinction_paradox(self):
        """Large absorbing sphere: Qext -> 2."""
        Qext, Qsca, _, _ = mie_single(150.0, complex(1.5, -0.1), MU[:3])
        assert abs(Qext - 2.0) < 0.1
        assert 0.0 < Qsca < Qext

    def test_energy_conservation(self):
        for x in (0.5, 3.0, 20.0):
            Qext, Qsca, _, _ = mie_single(x, complex(1.45, -0.005), MU[:3])
            assert 0.0 < Qsca <= Qext + 1e-12

    def test_nonabsorbing_qsca_equals_qext(self):
        Qext, Qsca, _, _ = mie_single(5.0, complex(1.33, 0.0), MU[:3])
        np.testing.assert_allclose(Qsca, Qext, rtol=1e-10)

    def test_optical_theorem(self):
        """Qext from the forward amplitude: Qext = 4/x^2 Re S(0)."""
        x = 4.0
        m = complex(1.5, -0.02)
        Qext, _, S1, S2 = mie_single(x, m, np.array([1.0]))
        np.testing.assert_allclose(
            Qext, 4.0 / (x * x) * S1[0].real, rtol=1e-10
        )
        np.testing.assert_allclose(S1[0].real, S2[0].real, rtol=1e-12)


class TestLognormal:
    def test_phase_normalized_and_polarization_bounds(self):
        out = mie_lognormal(
            0.55, complex(1.53, -0.006), 0.05, 2.0, MU, n_quad=48
        )
        p11 = out["P11"]
        assert np.all(p11 > 0)
        np.testing.assert_allclose(np.trapezoid(p11, MU) / 2.0, 1.0,
                                   rtol=1e-12)
        # |P12| <= P11 (physical polarization bound)
        assert np.all(np.abs(out["P12"]) <= p11 + 1e-12)
        assert np.all(np.abs(out["P33"]) <= p11 + 1e-12)
        assert np.all(np.abs(out["P34"]) <= p11 + 1e-12)

    def test_forward_peak_and_asymmetry(self):
        out = mie_lognormal(
            0.55, complex(1.53, -0.006), 0.2, 2.0, MU, n_quad=48
        )
        p11 = out["P11"]
        assert p11[-1] == p11.max()  # forward peak at mu = 1
        g = np.trapezoid(p11 * MU, MU) / np.trapezoid(p11, MU)
        assert 0.5 < g < 0.9
        assert out["sigma_sca"] < out["sigma_ext"]
