"""Accuracy contract for the VPU-lean trig pair (ops/fastmath.py).

The transport loop samples azimuths as ``phi = 2*pi*u``; ``cos_sin_2pi``
replaces libm cos+sin (measured at 40% of c1 device time, round 5) with
a quadrant floor + two degree-4 polynomials. This pins the absolute
error below ~3 ulp (5e-7) over several turns, the exact quadrant values, the
unit norm of the pair, and the f64 passthrough.
"""

import numpy as np

from eradiate_tpu.ops.fastmath import cos_sin_2pi


class TestCosSin2Pi:
    def test_accuracy_f32(self):
        u = np.linspace(-8.0, 8.0, 2_000_001).astype(np.float32)
        c, s = cos_sin_2pi(u)
        ref_c = np.cos(2.0 * np.pi * u.astype(np.float64))
        ref_s = np.sin(2.0 * np.pi * u.astype(np.float64))
        assert np.abs(c - ref_c).max() < 5e-7
        assert np.abs(s - ref_s).max() < 5e-7

    def test_quadrant_nodes_exact(self):
        u = np.array([0.0, 0.25, 0.5, 0.75, 1.0, -0.25], np.float32)
        c, s = cos_sin_2pi(u)
        np.testing.assert_allclose(c, [1, 0, -1, 0, 1, 0], atol=3e-7)
        np.testing.assert_allclose(s, [0, 1, 0, -1, 0, -1], atol=3e-7)

    def test_unit_norm(self):
        rng = np.random.default_rng(0)
        u = rng.uniform(-2, 2, 100_000).astype(np.float32)
        c, s = cos_sin_2pi(u)
        np.testing.assert_allclose(c * c + s * s, 1.0, atol=5e-7)

    def test_f64_passthrough_exact(self):
        u = np.linspace(0.0, 1.0, 10_001)  # float64
        c, s = cos_sin_2pi(u)
        np.testing.assert_allclose(c, np.cos(2 * np.pi * u), atol=1e-15)
        np.testing.assert_allclose(s, np.sin(2 * np.pi * u), atol=1e-15)

    def test_jnp_matches_np(self):
        import jax.numpy as jnp

        u = np.linspace(0.0, 1.0, 4097).astype(np.float32)
        cn, sn = cos_sin_2pi(u)
        cj, sj = cos_sin_2pi(jnp.asarray(u))
        np.testing.assert_allclose(np.asarray(cj), cn, atol=2e-7)
        np.testing.assert_allclose(np.asarray(sj), sn, atol=2e-7)
