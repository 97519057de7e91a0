"""Statistical pins on the pcg4d per-bounce uniform expansion.

The fast RNG (ops/fastrng.py) replaces the per-bounce threefry draw; the
key *derivation* stays threefry, so these tests pin only the expansion:
uniformity, serial/cross-stream decorrelation, determinism, and
statistical agreement of a full transport run against the legacy
threefry stream (role model: the reference sampler tests,
``/root/reference/tests/01_plugins/samplers``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.ops.fastrng import bounce_uniforms, uniforms_from_keys


def _keys(b, seed=0):
    return jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(jax.random.key(seed), (b,)), jnp.arange(b)
    )


class TestUniformity:
    def test_range_and_grid(self):
        u = np.asarray(uniforms_from_keys(_keys(4096), jnp.zeros(4096, jnp.uint32), 10))
        assert u.shape == (4096, 10)
        assert u.min() >= 0.0 and u.max() < 1.0
        # top-24-bit construction: exact multiples of 2^-24
        assert np.allclose(u * (1 << 24), np.round(u * (1 << 24)))

    def test_chi2_uniform(self):
        """Chi-square over 64 bins, all 10 slots pooled, B=2^16 lanes."""
        B = 1 << 16
        u = np.asarray(
            uniforms_from_keys(_keys(B), jnp.zeros(B, jnp.uint32), 10)
        ).ravel()
        nbins = 64
        counts, _ = np.histogram(u, bins=nbins, range=(0, 1))
        expected = u.size / nbins
        chi2 = ((counts - expected) ** 2 / expected).sum()
        # dof=63: mean 63, sd ~11.2; 5 sigma ~ 119
        assert chi2 < 120.0, chi2

    def test_mean_var(self):
        B = 1 << 16
        u = np.asarray(
            uniforms_from_keys(_keys(B), jnp.zeros(B, jnp.uint32), 8)
        )
        n = u.size
        assert abs(u.mean() - 0.5) < 5 * np.sqrt(1 / 12 / n)
        assert abs(u.var() - 1 / 12) < 5e-4


class TestDecorrelation:
    """Pearson r over N pairs is ~N(0, 1/sqrt(N)) under independence;
    gates are 5 sigma."""

    B = 1 << 15

    def _corr(self, a, b):
        a = (a - a.mean()) / a.std()
        b = (b - b.mean()) / b.std()
        return float((a * b).mean())

    def test_across_slots(self):
        u = np.asarray(
            uniforms_from_keys(_keys(self.B), jnp.zeros(self.B, jnp.uint32), 10)
        )
        lim = 5 / np.sqrt(self.B)
        for i in range(10):
            for j in range(i + 1, 10):
                assert abs(self._corr(u[:, i], u[:, j])) < lim, (i, j)

    def test_across_depths(self):
        k = _keys(self.B)
        u0 = np.asarray(uniforms_from_keys(k, jnp.zeros(self.B, jnp.uint32), 4))
        u1 = np.asarray(uniforms_from_keys(k, jnp.ones(self.B, jnp.uint32), 4))
        lim = 5 / np.sqrt(self.B)
        for i in range(4):
            for j in range(4):
                assert abs(self._corr(u0[:, i], u1[:, j])) < lim, (i, j)

    def test_adjacent_lanes(self):
        """Keys of adjacent lanes come from fold_in(key, i) — the hash
        must decorrelate lane i from lane i+1 in every slot."""
        u = np.asarray(
            uniforms_from_keys(_keys(self.B), jnp.zeros(self.B, jnp.uint32), 8)
        )
        lim = 5 / np.sqrt(self.B - 1)
        for s in range(8):
            assert abs(self._corr(u[:-1, s], u[1:, s])) < lim, s

    def test_sequential_counters_one_lane(self):
        """One lane, counter 0..N-1 (the raw pcg4d stream): serial
        correlation at lags 1..4."""
        N = 1 << 15
        k = jnp.broadcast_to(jax.random.key(3), (N,))
        u = np.asarray(uniforms_from_keys(k, jnp.arange(N, dtype=jnp.uint32), 4))
        lim = 5 / np.sqrt(N - 4)
        for lag in (1, 2, 3, 4):
            for s in range(4):
                assert abs(self._corr(u[:-lag, s], u[lag:, s])) < lim, (lag, s)


class TestContract:
    def test_deterministic(self):
        k = _keys(128, seed=9)
        d = jnp.arange(128, dtype=jnp.uint32) % 7
        a = bounce_uniforms("pcg4d", k, d, 10)
        b = bounce_uniforms("pcg4d", k, d, 10)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_threefry_path_unchanged(self):
        """impl="threefry" reproduces the legacy fold_in+uniform bits."""
        k = _keys(64, seed=4)
        d = jnp.full(64, 3, jnp.uint32)
        legacy = jax.vmap(lambda kk: jax.random.uniform(kk, (10,)))(
            jax.vmap(jax.random.fold_in)(k, d)
        )
        got = bounce_uniforms("threefry", k, d, 10)
        np.testing.assert_array_equal(np.asarray(legacy), np.asarray(got))

    def test_unknown_impl_raises(self):
        with pytest.raises(ValueError):
            bounce_uniforms("xoshiro", _keys(4), jnp.zeros(4, jnp.uint32), 4)


class TestTransportAgreement:
    """Full transport: pcg4d and threefry runs of the same scene must
    agree within MC error (Z-test on the batched per-path mean)."""

    def test_c1_like_scene(self):
        import dataclasses
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_tracer import make_scene, make_sensor

        from eradiate_tpu.ops import SceneConfig, render

        scene = make_scene(sigma_t=0.005, albedo=0.9, reflectance=0.5)
        sensor = make_sensor(np.linspace(-60, 60, 9))
        spp = 4096
        out = {}
        for impl in ("pcg4d", "threefry"):
            cfg = dataclasses.replace(SceneConfig(), rng=impl)
            r = render(scene, sensor, cfg, spp=spp, seed=11)
            rad = np.asarray(r["radiance"]).ravel()
            m2 = np.asarray(r["m2"]).ravel()
            out[impl] = (rad, np.maximum(m2 - rad**2, 0.0) / spp)
        ra, va = out["pcg4d"]
        rb, vb = out["threefry"]
        z = np.abs(ra - rb) / np.sqrt(va + vb + 1e-30)
        assert z.max() < 5.0, (ra, rb, z)
