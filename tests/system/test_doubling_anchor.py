"""External correctness anchor: polarized MC vs deterministic doubling.

VERDICT r2 task #4: the polarized wavefront tracer is gated against an
*independent deterministic method* — the vector doubling–adding solver
(:mod:`eradiate_tpu.physics.vector_doubling`, f64 numpy, no shared code
with the MC path) — on the standard plane-parallel Rayleigh problem the
Coulson/Natraj tables tabulate (tau 0.1–1, Lambertian/black ground,
on- and off-principal-plane geometries).  An engine-wide bias in the MC
Mueller chain (sign, scale, frame rotation, phase normalization) cannot
cancel here, unlike in self-referential regressions; role model:
``/root/reference/src/eradiate/test_tools/regression.py:801-916``.

Bug-sensitivity (verified by hand): flipping the sign of the Rayleigh
-s^2 polarizing term in ``ops/mueller.rayleigh_mueller`` makes both
``test_stokes_match`` cases fail immediately (the VERDICT r2 "deliberate
sign/scale bug must fail the new gate" criterion).

The solver itself is pinned by closed forms (exact single scattering at
arbitrary azimuth, Lambertian-ground limit, energy conservation at
omega=1) so the anchor cannot drift toward the MC.
"""

import os
import sys

import numpy as np
import pytest

from eradiate_tpu.ops import SceneConfig
from eradiate_tpu.physics.vector_doubling import (
    _phase_meridian,
    rayleigh_stokes_toa,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "unit"))
from test_tracer import make_scene  # noqa: E402

TAU = 0.5
SZA = 40.0
MU0 = float(np.cos(np.deg2rad(SZA)))


class TestDoublingSelfChecks:
    """Closed-form pins on the deterministic solver itself."""

    def test_single_scattering_closed_form(self):
        """At omega -> 0 the solver reduces to the exact single-scattering
        integral at every azimuth (I, Q and U)."""
        mus = np.array([0.8, 0.5, 0.3])
        for dp in (0.0, 1.0, 2.1):
            S = rayleigh_stokes_toa(
                TAU, MU0, mus, np.full(3, dp), omega=1e-6, n_mu=32
            )
            s0 = np.sqrt(1 - MU0**2)
            d_in = np.array([s0, 0.0, -MU0])
            sv = np.sqrt(1 - mus**2)
            d_out = np.stack(
                [sv * np.cos(dp), sv * np.sin(dp), mus], axis=-1
            )
            P = _phase_meridian(np.broadcast_to(d_in, (3, 3)), d_out, 0.0)
            c = 1 / mus + 1 / MU0
            Sref = (
                1e-6 * MU0 / (mus + MU0) * (1 - np.exp(-TAU * c))
            )[:, None] * P[..., 0]
            np.testing.assert_allclose(S, Sref, rtol=2e-4, atol=1e-13)

    def test_lambertian_ground_limit(self):
        """tau -> 0: BRF equals the ground albedo exactly."""
        S = rayleigh_stokes_toa(
            1e-6, MU0, np.array([0.7]), [0.5], albedo=0.35, n_mu=32
        )
        assert np.pi * S[0, 0] / MU0 == pytest.approx(0.35, rel=1e-6)

    def test_energy_conservation(self):
        """omega = 1: reflected + transmitted + direct flux = incident."""
        from numpy.polynomial.legendre import leggauss

        from eradiate_tpu.physics.vector_doubling import (
            _build_layer,
            _unflat,
        )

        x, w = leggauss(48)
        mu = np.concatenate([0.5 * (x + 1), [MU0]])
        wts = np.concatenate([0.5 * w, [0.0]])
        R, T, e, _comp, _Wq = _build_layer(1.0, mu, wts, 1.0, 0.0)
        n = mu.size
        R0 = _unflat(R[0], n)[:, -1, 0, 0].real
        T0 = _unflat(T[0], n)[:, -1, 0, 0].real
        flux = (
            2 * np.pi * np.sum(wts * mu * R0)
            + 2 * np.pi * np.sum(wts * mu * T0)
            + MU0 * e[-1]
        )
        assert flux / MU0 == pytest.approx(1.0, abs=2e-4)

    def test_azimuth_mirror_symmetry(self):
        """Unpolarized sun + Rayleigh: I, Q even in dphi; U odd."""
        S1 = rayleigh_stokes_toa(
            TAU, MU0, [0.7, 0.4], [1.1, 2.0], albedo=0.3, n_mu=32
        )
        S2 = rayleigh_stokes_toa(
            TAU, MU0, [0.7, 0.4], [-1.1, -2.0], albedo=0.3, n_mu=32
        )
        np.testing.assert_allclose(S1[:, :2], S2[:, :2], rtol=1e-12)
        np.testing.assert_allclose(S1[:, 2], -S2[:, 2], rtol=1e-12)


def _mc_stokes(reflectance, vza_deg, vaa_deg, spp=65536, seed=7, depol=0.0):
    """Engine MC Stokes for the TAU Rayleigh slab (E0 = 1)."""
    import jax.numpy as jnp

    from eradiate_tpu.ops.scene_state import SensorArrays
    from eradiate_tpu.ops.tracer_polarized import render_polarized
    from eradiate_tpu.core.frame import angles_to_direction

    scene = make_scene(
        sigma_t=TAU / 100.0,
        albedo=1.0,
        reflectance=reflectance,
        sza_deg=SZA,
        n_layers=10,
        top=100.0,
        depol=depol,
    )
    angles = np.stack(
        [np.deg2rad(vza_deg), np.deg2rad(vaa_deg)], axis=-1
    )
    dirs = angles_to_direction(angles)
    sensor = SensorArrays(
        directions=jnp.asarray(dirs),
        target=jnp.zeros(3),
        ray_offset=jnp.nan,
    )
    kind = "black" if reflectance == 0.0 else "lambertian"
    cfg = SceneConfig(surface_kind=kind, polarized=True, max_depth=24)
    r = render_polarized(scene, sensor, cfg, spp=spp, seed=seed)
    st = np.asarray(r["stokes"])[0]  # [N, 4]
    m2 = np.asarray(r["m2"])[0]
    sigma_I = np.sqrt(
        np.maximum(m2 - st[:, 0] ** 2, 0.0) / spp
    )
    return st, sigma_I


class TestPolarizedTracerVsDoubling:
    """The MC tracer must agree with the deterministic anchor on I, Q/I,
    U/I at on- and off-principal-plane geometries, over black and
    Lambertian grounds."""

    #: (vza, vaa) pairs; vaa=0 principal plane, others off-plane.
    GEOMS = [(15.0, 0.0), (45.0, 0.0), (60.0, 0.0), (30.0, 60.0),
             (45.0, 120.0), (60.0, 240.0)]

    @pytest.mark.parametrize("reflectance,depol", [
        (0.0, 0.0), (0.3, 0.0), (0.3, 0.0279),  # 0.0279 = air depol
    ])
    def test_stokes_match(self, reflectance, depol):
        vzas = np.array([g[0] for g in self.GEOMS])
        vaas = np.array([g[1] for g in self.GEOMS])
        st, sigma_I = _mc_stokes(reflectance, vzas, vaas, depol=depol)

        mus = np.cos(np.deg2rad(vzas))
        # engine sun propagates toward azimuth 180 deg; solver's dphi is
        # the view azimuth relative to the sun's horizontal propagation
        dphis = np.deg2rad(vaas) - np.pi
        S = rayleigh_stokes_toa(
            TAU, MU0, mus, dphis, albedo=reflectance, omega=1.0,
            depol=depol, n_mu=48,
        )

        # radiance I: 4 sigma of the MC plus solver truncation margin
        np.testing.assert_allclose(
            st[:, 0], S[:, 0], atol=np.max(4 * sigma_I) + 2e-4 * S[0, 0],
            rtol=0.01,
        )
        # Q/I and U/I: polarization ratios, tolerance dominated by MC
        # noise on Q,U (comparable variance to I)
        ratio_tol = np.maximum(4 * sigma_I / S[:, 0], 0.006)
        np.testing.assert_allclose(
            st[:, 1] / st[:, 0], S[:, 1] / S[:, 0], atol=float(np.max(ratio_tol))
        )
        np.testing.assert_allclose(
            st[:, 2] / st[:, 0], S[:, 2] / S[:, 0], atol=float(np.max(ratio_tol))
        )
        # V must vanish for Rayleigh + unpolarized sun
        np.testing.assert_allclose(
            st[:, 3] / st[:, 0], 0.0, atol=float(np.max(ratio_tol))
        )
