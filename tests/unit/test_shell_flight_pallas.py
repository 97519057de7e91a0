"""Spherical-shell Pallas kernels vs the XLA closed forms (interpret mode).

The production dispatch (ops/spherical.shell_flight / slant_tau_exact)
routes to these kernels on TPU/f32; here the Mosaic programs run in
interpreter mode on CPU against the XLA implementations they replace.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eradiate_tpu.ops.pallas.shell_flight import (
    shell_flight_pallas,
    slant_tau_pallas,
)
from eradiate_tpu.ops.spherical import (
    TAU_BLOCKED,
    _shell_flight_xla,
    _slant_tau_exact_xla,
)

R_EARTH = 6378.1


def make_shells(L=200, seed=0):
    rng = np.random.default_rng(seed)
    radii = np.linspace(R_EARTH, R_EARTH + 120.0, L + 1).astype(np.float32)
    sigma = (np.exp(-np.linspace(0, 120, L) / 8.5) * 0.01).astype(np.float32)
    B = 700
    r0 = rng.uniform(R_EARTH + 1e-3, R_EARTH + 119.9, B)
    theta = rng.uniform(0, np.pi / 6, B)
    phi = rng.uniform(0, 2 * np.pi, B)
    p = np.stack(
        [
            r0 * np.sin(theta) * np.cos(phi),
            r0 * np.sin(theta) * np.sin(phi),
            r0 * np.cos(theta),
        ],
        axis=1,
    ).astype(np.float32)
    return jnp.asarray(radii), jnp.asarray(sigma), jnp.asarray(p), rng


class TestShellFlightPallas:
    def test_matches_xla(self):
        radii, sigma, p, rng = make_shells()
        B = p.shape[0]
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        t_max = jnp.asarray(rng.uniform(0.1, 300.0, B).astype(np.float32))
        tau_s = jnp.asarray(rng.exponential(0.3, B).astype(np.float32))

        col_r, t_r, lay_r = _shell_flight_xla(p, d, t_max, radii, sigma, tau_s)
        x0 = jnp.sum(p * d, axis=-1)
        b2 = jnp.sum(jnp.cross(p, d) ** 2, axis=-1)
        col_p, t_p, lay_p = shell_flight_pallas(
            x0, b2, t_max, tau_s, radii * radii, sigma,
            block_b=256, interpret=True,
        )
        col_r, t_r, lay_r, col_p, t_p, lay_p = map(
            np.asarray, (col_r, t_r, lay_r, col_p, t_p, lay_p)
        )
        np.testing.assert_array_equal(col_p, col_r)
        both = col_r & col_p
        np.testing.assert_array_equal(lay_p[both], lay_r[both])
        # f32 prefix-order differences (VMEM cumsum vs MXU hi/lo matmul)
        np.testing.assert_allclose(t_p[both], t_r[both], atol=1e-2)


class TestShellFlightExitClipped:
    def test_fast_path_matches_generic_on_boundary_exits(self):
        """With t_max the true boundary-exit distance (the tracer
        contract), the exit_clipped fast path (endpoint g from the total
        column sum) must agree with the generic endpoint sweep."""
        from eradiate_tpu.ops.spherical import ray_sphere_intersect

        radii, sigma, p, rng = make_shells()
        B = p.shape[0]
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        tgn, tgf, hit_g = ray_sphere_intersect(p, d, radii[0])
        t_ground = jnp.where(hit_g & (tgn > 0), tgn, jnp.inf)
        _, ttf, _ = ray_sphere_intersect(p, d, radii[-1])
        t_max = jnp.minimum(t_ground, jnp.maximum(ttf, 1e-6))
        tau_s = jnp.asarray(rng.exponential(0.3, B).astype(np.float32))
        x0 = jnp.sum(p * d, axis=-1)
        b2 = jnp.sum(jnp.cross(p, d) ** 2, axis=-1)
        outs = [
            shell_flight_pallas(
                x0, b2, t_max, tau_s, radii * radii, sigma,
                block_b=256, interpret=True, exit_clipped=fast,
            )
            for fast in (False, True)
        ]
        (col_g, t_g, lay_g), (col_f, t_f, lay_f) = [
            tuple(map(np.asarray, o)) for o in outs
        ]
        np.testing.assert_array_equal(col_f, col_g)
        both = col_g & col_f
        np.testing.assert_array_equal(lay_f[both], lay_g[both])
        np.testing.assert_allclose(t_f[both], t_g[both], atol=1e-3)


class TestShellFlightGroundAnchor:
    def test_steep_descending_rays_toward_ground(self):
        """Rays whose tangent lies below ground (b < r_ground) anchor the
        inverted axial coordinate at X[:, 0] > 0 — the case that broke a
        telescoped g_inv without the level-0 anchor."""
        radii, sigma, p, rng = make_shells()
        B = p.shape[0]
        # near-nadir descending directions: tangent far below the surface
        d = np.stack(
            [
                rng.uniform(-0.05, 0.05, B),
                rng.uniform(-0.05, 0.05, B),
                -np.ones(B),
            ],
            axis=1,
        ).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        t_max = jnp.full(B, 200.0, dtype=jnp.float32)
        tau_s = jnp.asarray(rng.exponential(0.2, B).astype(np.float32))

        col_r, t_r, lay_r = _shell_flight_xla(p, d, t_max, radii, sigma, tau_s)
        x0 = jnp.sum(p * d, axis=-1)
        b2 = jnp.sum(jnp.cross(p, d) ** 2, axis=-1)
        col_p, t_p, lay_p = shell_flight_pallas(
            x0, b2, t_max, tau_s, radii * radii, sigma,
            block_b=256, interpret=True,
        )
        col_r, t_r, col_p, t_p = map(np.asarray, (col_r, t_r, col_p, t_p))
        np.testing.assert_array_equal(col_p, col_r)
        both = col_r & col_p
        assert both.any()
        np.testing.assert_allclose(t_p[both], t_r[both], atol=1e-2)


class TestPrefixBlocked:
    def test_matches_numpy_exclusive_cumsum(self):
        from eradiate_tpu.ops.pallas.shell_flight import _prefix_blocked
        from jax.experimental import pallas as pl

        rng = np.random.default_rng(3)
        c = rng.exponential(0.01, (16, 512)).astype(np.float32)

        def kernel(c_ref, out_ref):
            out_ref[:] = _prefix_blocked(c_ref[:])

        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(c.shape, jnp.float32),
            interpret=True,
        )(jnp.asarray(c))
        ref = np.cumsum(c.astype(np.float64), axis=1) - c
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-6)


class TestSlantTauPallas:
    def test_matches_xla_across_zenith(self):
        radii, sigma, p, _ = make_shells()
        for zen in (0.0, 60.0, 85.0, 95.0):
            w = jnp.asarray(
                [np.sin(np.deg2rad(zen)), 0.0, np.cos(np.deg2rad(zen))],
                dtype=jnp.float32,
            )
            tau_ref = np.asarray(_slant_tau_exact_xla(p, w, radii, sigma))
            x0 = jnp.einsum("bj,j->b", p, w)
            b2 = jnp.sum(
                jnp.cross(p, jnp.broadcast_to(w, p.shape)) ** 2, axis=-1
            )
            tau_pl = np.asarray(
                slant_tau_pallas(x0, b2, radii, sigma, block_b=256,
                                 interpret=True)
            )
            blk_r = tau_ref >= TAU_BLOCKED / 2
            blk_p = tau_pl >= TAU_BLOCKED / 2
            np.testing.assert_array_equal(blk_p, blk_r)
            ok = ~blk_r
            # near-tangent f32 noise floor ~3e-2 absolute for BOTH
            # formulations (verified vs f64); they agree to the same level
            np.testing.assert_allclose(
                tau_pl[ok], tau_ref[ok], atol=5e-2, rtol=2e-2
            )

    def test_compiled_on_tpu(self):
        """Compiled (interpret=False) XLA-vs-Pallas comparison so Mosaic
        lowering and hardware approx-reciprocal accuracy are covered when
        a TPU is attached; the CI conftest pins the CPU backend, so this
        runs only in manual TPU sessions (ADVICE r2 #2)."""
        import pytest

        if jax.default_backend() != "tpu":
            pytest.skip("needs TPU hardware (CI runs on the CPU backend)")
        radii, sigma, p, _ = make_shells()
        w = jnp.asarray([0.5, 0.0, np.sqrt(0.75)], dtype=jnp.float32)
        tau_ref = np.asarray(_slant_tau_exact_xla(p, w, radii, sigma))
        x0 = jnp.einsum("bj,j->b", p, w)
        b2 = jnp.sum(
            jnp.cross(p, jnp.broadcast_to(w, p.shape)) ** 2, axis=-1
        )
        tau_pl = np.asarray(
            slant_tau_pallas(x0, b2, radii, sigma, block_b=256)
        )
        np.testing.assert_allclose(tau_pl, tau_ref, atol=5e-2, rtol=2e-2)

    def test_dispatch_cpu_takes_xla(self):
        # on CPU the public entry must route to the XLA implementation
        from eradiate_tpu.ops.spherical import shell_flight, slant_tau_exact

        radii, sigma, p, rng = make_shells(L=50)
        w = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
        got = np.asarray(slant_tau_exact(p, w, radii, sigma))
        ref = np.asarray(_slant_tau_exact_xla(p, w, radii, sigma))
        np.testing.assert_array_equal(got, ref)

        B = p.shape[0]
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        t_max = jnp.full(B, 50.0, dtype=jnp.float32)
        tau_s = jnp.full(B, 0.1, dtype=jnp.float32)
        got = shell_flight(p, d, t_max, radii, sigma, tau_s)
        ref = _shell_flight_xla(p, d, t_max, radii, sigma, tau_s)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


class TestShellEventFused:
    def test_matches_two_step(self):
        """The fused flight+NEE kernel must reproduce the two-step path:
        identical collide/layer decisions and matching tau_sun at the
        event point (quadratic-form b'^2 vs crossing p' directly)."""
        from eradiate_tpu.ops.pallas.shell_flight import shell_event_pallas

        radii, sigma, p, rng = make_shells()
        B = p.shape[0]
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        w_sun = np.array([0.3, 0.1, 0.9486833], dtype=np.float32)
        w_sun /= np.linalg.norm(w_sun)
        w_sun = jnp.asarray(w_sun)
        tau_s = jnp.asarray(rng.exponential(0.3, B).astype(np.float32))

        # tracer contract: t_max is the boundary-exit distance
        from eradiate_tpu.ops.spherical import ray_sphere_intersect

        tgn, tgf, hit_g = ray_sphere_intersect(p, d, radii[0])
        t_ground = jnp.where(hit_g & (tgn > 1e-4), tgn, jnp.inf)
        _, ttf, _ = ray_sphere_intersect(p, d, radii[-1])
        t_max = jnp.minimum(t_ground, jnp.maximum(ttf, 1e-4))

        col_r, t_r, lay_r = _shell_flight_xla(p, d, t_max, radii, sigma, tau_s)
        t_step = jnp.where(col_r, t_r, t_max)
        p_new = p + d * t_step[:, None]
        tau_r = _slant_tau_exact_xla(p_new, w_sun, radii, sigma)

        x0 = jnp.sum(p * d, axis=-1)
        b2 = jnp.sum(jnp.cross(p, jnp.broadcast_to(d, p.shape)) ** 2, axis=-1)
        w_b = jnp.broadcast_to(w_sun, p.shape)
        pw = jnp.sum(p * w_b, axis=-1)
        dw = jnp.sum(d * w_b, axis=-1)
        b2w0 = jnp.sum(jnp.cross(p, w_b) ** 2, axis=-1)
        col_p, t_p, lay_p, tau_p = shell_event_pallas(
            x0, b2, t_max, tau_s, pw, dw, b2w0, radii * radii, sigma,
            block_b=256, interpret=True,
        )
        col_r, t_r, lay_r, tau_r, col_p, t_p, lay_p, tau_p = map(
            np.asarray, (col_r, t_r, lay_r, tau_r, col_p, t_p, lay_p, tau_p)
        )
        np.testing.assert_array_equal(col_p, col_r)
        both = col_r & col_p
        np.testing.assert_array_equal(lay_p[both], lay_r[both])
        np.testing.assert_allclose(t_p[both], t_r[both], rtol=1e-3, atol=1e-2)
        # blocked sentinel agreement, then value agreement elsewhere
        blk_r = tau_r > 1e9
        blk_p = tau_p > 1e9
        np.testing.assert_array_equal(blk_p, blk_r)
        ok = ~blk_r
        np.testing.assert_allclose(
            tau_p[ok], tau_r[ok], rtol=5e-2, atol=2e-3
        )
