"""Unit pins on the vector doubling-adding solver internals.

The solver (:mod:`eradiate_tpu.physics.vector_doubling`) is the external
correctness anchor for the polarized tracer
(tests/system/test_doubling_anchor.py), so its own building blocks get
closed-form pins here: phase-matrix normalization, Fourier exactness,
and the illumination-from-below ("star") symmetry transform used inside
the doubling recursion.
"""

import numpy as np
import pytest
from numpy.polynomial.legendre import leggauss

from eradiate_tpu.physics.vector_doubling import (
    _MODES,
    _N_PHI,
    _phase_meridian,
    _rayleigh_3x3,
    rayleigh_stokes_toa,
)


def test_phase_normalization():
    """(0,0) element integrates to 1 over the sphere, any depol."""
    x, w = leggauss(200)
    for depol in (0.0, 0.03, 0.1):
        P00 = _rayleigh_3x3(x, depol)[..., 0, 0]
        assert 2 * np.pi * np.sum(w * P00) == pytest.approx(1.0, rel=1e-12)


def test_fourier_series_exact():
    """Rayleigh truncates at m=2: the 3-mode series reproduces the
    meridian phase matrix at arbitrary azimuth."""
    rng = np.random.default_rng(3)
    mu_i, mu_j = 0.73, 0.41
    s_i, s_j = np.sqrt(1 - mu_i**2), np.sqrt(1 - mu_j**2)
    nphi = _N_PHI
    dphi = 2 * np.pi * np.arange(nphi) / nphi
    d_in = np.array([s_j, 0.0, -mu_j])
    d_out = np.stack(
        [s_i * np.cos(dphi), s_i * np.sin(dphi), np.full(nphi, mu_i)],
        axis=-1,
    )
    P = _phase_meridian(np.broadcast_to(d_in, (nphi, 3)), d_out, 0.02)
    F = np.fft.fft(P, axis=0) / nphi
    for phi in rng.uniform(0, 2 * np.pi, 5):
        recon = F[0].real.copy()
        for m in range(1, _MODES):
            recon += 2 * (F[m] * np.exp(1j * m * phi)).real
        sv = np.array(
            [s_i * np.cos(phi), s_i * np.sin(phi), mu_i]
        )
        direct = _phase_meridian(d_in, sv, 0.02)
        np.testing.assert_allclose(recon, direct, atol=1e-14)


def test_star_transform_is_d3_conjugation_free():
    """Illumination-from-below kernels equal D3 K D3 of the from-above
    kernels per Fourier mode, with NO complex conjugation (the z-mirror
    flips U only; relative azimuth is unchanged).  This pins the exact
    transform used inside ``_build_layer``'s doubling recursion."""
    n = 5
    rng = np.random.default_rng(0)
    mu = np.sort(rng.uniform(0.1, 0.95, n))
    nphi = _N_PHI
    dphi = 2 * np.pi * np.arange(nphi) / nphi

    def four(d_in_of_mu, d_out_of_mu_phi):
        di = np.zeros((n, n, nphi, 3))
        do = np.zeros((n, n, nphi, 3))
        for j in range(n):
            di[:, j, :, :] = d_in_of_mu(mu[j])
        for i in range(n):
            for k, p in enumerate(dphi):
                do[i, :, k, :] = d_out_of_mu_phi(mu[i], p)
        P = _phase_meridian(di, do, 0.0)
        F = np.fft.fft(P, axis=2) / nphi
        return np.transpose(F[:, :, :_MODES], (2, 0, 1, 3, 4))

    def dn(m):
        return np.array([np.sqrt(1 - m * m), 0.0, -m])

    def up_out(m, p):
        s = np.sqrt(1 - m * m)
        return np.array([s * np.cos(p), s * np.sin(p), m])

    def dn_out(m, p):
        s = np.sqrt(1 - m * m)
        return np.array([s * np.cos(p), s * np.sin(p), -m])

    def up_in(m):
        return np.array([np.sqrt(1 - m * m), 0.0, m])

    KR = four(dn, up_out)  # reflection from above (down -> up)
    KRs = four(up_in, dn_out)  # reflection from below (up -> down)
    D3 = np.array([1.0, 1.0, -1.0])
    for m in range(_MODES):
        cand = D3[None, None, :, None] * KR[m] * D3[None, None, None, :]
        np.testing.assert_allclose(cand, KRs[m], atol=1e-14)
        bad = (
            D3[None, None, :, None]
            * np.conj(KR[m])
            * D3[None, None, None, :]
        )
        if m > 0:  # conjugating WOULD be wrong for the sine modes
            assert np.max(np.abs(bad - KRs[m])) > 1e-3


def test_reciprocity():
    """mu R(mu, mu0) == mu0 R(mu0, mu) for the I-I response."""
    tau, alb = 0.8, 0.0
    a = rayleigh_stokes_toa(tau, 0.3, [0.77], [1.3], albedo=alb, n_mu=48)
    b = rayleigh_stokes_toa(tau, 0.77, [0.3], [1.3], albedo=alb, n_mu=48)
    assert 0.77 * a[0, 0] == pytest.approx(0.3 * b[0, 0], rel=5e-5)


def test_depol_reduces_dolp():
    """Nonzero depolarization must lower DoLP at 90-degree-ish scattering."""
    mu0 = np.cos(np.deg2rad(50.0))

    def dolp(depol):
        S = rayleigh_stokes_toa(
            0.2, mu0, [np.cos(np.deg2rad(40.0))], [np.pi], depol=depol,
            n_mu=32,
        )
        return np.hypot(S[0, 1], S[0, 2]) / S[0, 0]

    assert dolp(0.1) < dolp(0.03) < dolp(0.0)
