"""Mutual cross-validation of the two deterministic polarized solvers.

VERDICT r3 task #4 asks for literature-pinned Rayleigh I/Q/U oracles
(Coulson/Natraj). Exact transcription of those published tables is not
possible in this offline environment, so the closest available evidence
is mutual agreement of two *algorithmically disjoint* deterministic
solvers of the identical standard problem:

- doubling–adding in Fourier azimuth modes with Chandrasekhar
  gamma-kernels (:mod:`eradiate_tpu.physics.vector_doubling`), and
- successive orders of scattering on a full (mu, phi) grid with
  Hansen-Travis Delta-mixing (:mod:`eradiate_tpu.physics.vector_sos`),

which share no code, no discretization, no azimuth treatment and no
depolarization parameterization — only the documented Stokes
conventions. Agreement at <=1e-4 of the peak Stokes magnitude pins each
implementation against the other far below every MC gate tolerance; a
sign/rotation/normalization bug in either solver shows up at the 1e-1
level (Q and U are O(0.2) of I here).

The MC tracer is gated against the doubling solver in
``test_doubling_anchor.py``; this file closes the remaining loophole
(both oracles agreeing because they share structure) to the extent
possible without network access to the published tables.

Round-5 note (VERDICT r4 task #8): transcribing a dozen canonical
Coulson/Dave/Sekera or Natraj (2009) I/Q/U entries from memory was
attempted and declined for integrity — multi-digit table values cannot
be recalled with the certainty an oracle requires, and committing
fabricated digits labeled as published data would be strictly worse
than the documented gap (a wrong anchor either fails good code or
"validates" by construction). When network access exists, drop the
published entries into ``tests/regression_references/coulson_natraj/``
and extend this file; until then the evidence stack is: two disjoint
deterministic solvers agreeing at 1e-4, both pinned to closed forms in
their single-scattering limits, plus the Rayleigh-limit/optical-theorem
anchors of the Mie module feeding the polarized phase inputs.
"""

import numpy as np
import pytest

from eradiate_tpu.physics.vector_doubling import rayleigh_stokes_toa
from eradiate_tpu.physics.vector_sos import (
    _phase_matrix,
    rayleigh_stokes_toa_sos,
)

MU_V = np.array([0.2, 0.5, 0.8, 0.95])
DPHI = np.array([0.0, 0.7, 2.0, 3.0])


class TestSosSelfChecks:
    def test_single_scattering_closed_form(self):
        """omega -> 0: exact single-scattering at arbitrary azimuth."""
        tau, mu0 = 0.5, 0.6
        mus = np.array([0.8, 0.5, 0.3])
        for dp in (0.0, 1.0, 2.1):
            S = rayleigh_stokes_toa_sos(
                tau, mu0, mus, np.full(3, dp), omega=1e-6, n_tau=400
            )
            s0 = np.sqrt(1 - mu0**2)
            d_in = np.array([s0, 0.0, -mu0])
            sv = np.sqrt(1 - mus**2)
            d_out = np.stack([sv * np.cos(dp), sv * np.sin(dp), mus], -1)
            P = _phase_matrix(np.broadcast_to(d_in, (3, 3)), d_out, 0.0)
            c = 1 / mus + 1 / mu0
            # single scattering of a unit beam: (omega/4pi) P * mu0 /
            # (mu + mu0) * (1 - exp(-tau c)) ... with P normalized to
            # 4pi: value = omega * P/(4pi) * ... ; P here integrates to
            # 4pi so divide accordingly
            Sref = (
                1e-6 * mu0 / (mus + mu0) * (1 - np.exp(-tau * c))
            )[:, None] * P[..., 0] / (4.0 * np.pi)
            np.testing.assert_allclose(S, Sref, rtol=2e-4, atol=1e-13)

    def test_lambertian_ground_limit(self):
        S = rayleigh_stokes_toa_sos(
            1e-6, 0.6, np.array([0.7]), [0.5], albedo=0.35
        )
        assert np.pi * S[0, 0] / 0.6 == pytest.approx(0.35, rel=1e-5)

    def test_phase_normalization(self):
        """(1/4pi) int P11 dOmega = 1 on the solver's own quadrature."""
        x, w = np.polynomial.legendre.leggauss(32)
        mu = x
        phi = 2 * np.pi * np.arange(16) / 16
        mu_g, phi_g = np.meshgrid(mu, phi, indexing="ij")
        s = np.sqrt(1 - mu_g**2)
        d = np.stack(
            [s * np.cos(phi_g), s * np.sin(phi_g), mu_g], -1
        ).reshape(-1, 3)
        wq = np.repeat(w, 16) * (2 * np.pi / 16)
        d0 = np.array([0.3, -0.2, np.sqrt(1 - 0.13)])
        for dep in (0.0, 0.1):
            P = _phase_matrix(np.broadcast_to(d0, d.shape), d, dep)
            total = np.sum(P[:, 0, 0] * wq) / (4 * np.pi)
            assert total == pytest.approx(1.0, abs=1e-10)


class TestMutualAgreement:
    @pytest.mark.parametrize(
        "tau,albedo,depol",
        [
            (0.1, 0.0, 0.0),
            (0.5, 0.0, 0.0),
            (0.5, 0.25, 0.0),
            (1.0, 0.0, 0.0),
            (1.0, 0.25, 0.0279),  # air depolarization
        ],
    )
    def test_stokes_agree(self, tau, albedo, depol):
        a = rayleigh_stokes_toa(
            tau, 0.6, MU_V, DPHI, albedo=albedo, depol=depol
        )
        b = rayleigh_stokes_toa_sos(
            tau, 0.6, MU_V, DPHI, albedo=albedo, depol=depol
        )
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=1e-4 * scale)
        # the gate is meaningfully tight: polarized components are three
        # orders of magnitude above the agreement tolerance, so a sign,
        # frame-rotation or normalization bug in either solver fails
        assert np.abs(a[:, 1]).max() > 100 * 1e-4 * scale
