"""Unit tests: core layer (units, modes, quad, frame, warp, rng)."""

import numpy as np
import pytest

from eradiate_tpu.core import frame, modes, quad, rng, units, warp
from eradiate_tpu.core.units import Quantity, ureg


class TestUnits:
    def test_basic_conversion(self):
        q = ureg.Quantity(1.0, "km")
        assert q.m_as("m") == pytest.approx(1000.0)
        assert q.m_as("cm") == pytest.approx(1e5)

    def test_compound(self):
        q = Quantity(1.0, "W/m^2/nm")
        assert q.m_as("W/m^2/micron") == pytest.approx(1000.0)

    def test_inverse(self):
        q = Quantity(1.0, "km^-1")
        assert q.m_as("m^-1") == pytest.approx(1e-3)

    def test_angle(self):
        q = Quantity(180.0, "deg")
        assert q.m_as("rad") == pytest.approx(np.pi)

    def test_dim_error(self):
        with pytest.raises(units.DimensionalityError):
            Quantity(1.0, "km").to("s")

    def test_arithmetic(self):
        a = Quantity(1.0, "km")
        b = Quantity(500.0, "m")
        assert (a + b).m_as("m") == pytest.approx(1500.0)
        assert (a * b).m_as("m^2") == pytest.approx(5e5)
        assert (a / b).m_as("dimensionless") == pytest.approx(2.0)

    def test_array(self):
        q = Quantity(np.array([1.0, 2.0]), "km")
        np.testing.assert_allclose(q.m_as("m"), [1000.0, 2000.0])

    def test_to_quantity(self):
        assert units.to_quantity((3.0, "km")).m_as("m") == pytest.approx(3000.0)
        assert units.to_quantity({"value": 3.0, "units": "km"}).m_as("m") == pytest.approx(3000.0)
        assert units.to_quantity(3.0, "km").m_as("m") == pytest.approx(3000.0)


class TestModes:
    def test_registry(self):
        assert len(modes.modes()) == 8

    def test_set_mode(self):
        modes.set_mode("ckd")
        m = modes.mode()
        assert m.is_ckd and not m.is_mono
        assert m.is_double_precision  # alias maps to double

    def test_flags(self):
        modes.set_mode("mono_polarized_single")
        m = modes.mode()
        assert m.is_polarized and m.is_single_precision

    def test_unknown(self):
        with pytest.raises(ValueError):
            modes.set_mode("nope")


class TestQuad:
    def test_gauss_legendre_integrates_poly(self):
        q = quad.Quad.gauss_legendre(4)
        # integrate x^2 over [0, 1] = 1/3
        nodes = q.eval_nodes((0.0, 1.0))
        assert q.integrate(nodes**2, (0.0, 1.0)) == pytest.approx(1.0 / 3.0)

    def test_gauss_lobatto_endpoints(self):
        q = quad.Quad.gauss_lobatto(5)
        assert q.nodes[0] == pytest.approx(-1.0)
        assert q.nodes[-1] == pytest.approx(1.0)
        nodes = q.eval_nodes((0.0, 1.0))
        assert q.integrate(nodes**3, (0.0, 1.0)) == pytest.approx(0.25)

    def test_weights_sum(self):
        for n in (2, 4, 8, 16):
            assert quad.Quad.gauss_legendre(n).weights.sum() == pytest.approx(2.0)


class TestFrame:
    def test_angles_to_direction_zenith(self):
        d = frame.angles_to_direction([0.0, 0.0])
        np.testing.assert_allclose(d, [[0, 0, 1]], atol=1e-12)

    def test_angles_roundtrip(self):
        angles = np.array([[0.3, 1.2], [1.0, 4.0], [np.pi / 2 - 0.01, 0.0]])
        d = frame.angles_to_direction(angles)
        back = frame.direction_to_angles(d)
        np.testing.assert_allclose(back, angles, atol=1e-10)

    def test_negative_zenith_flip(self):
        # (-theta, phi) == (theta, phi + pi)
        d1 = frame.angles_to_direction([-0.5, 0.0])
        d2 = frame.angles_to_direction([0.5, np.pi])
        np.testing.assert_allclose(d1, d2, atol=1e-12)

    def test_azimuth_convention(self):
        # North-left (compass): azimuth 90 deg = East = +x
        d = frame.angles_to_direction(
            [np.pi / 2, np.pi / 2], azimuth_convention="NORTH_LEFT"
        )
        np.testing.assert_allclose(d, [[1, 0, 0]], atol=1e-12)

    def test_hplane(self):
        pos, neg = frame.angles_in_hplane(
            0.0, np.array([0.3, 0.3]), np.array([0.0, np.pi])
        )
        assert pos[0] and not pos[1]
        assert neg[1] and not neg[0]


class TestWarp:
    def test_disk(self, rng_np):
        s = rng_np.random((1000, 2))
        p = warp.square_to_uniform_disk(s)
        r = np.hypot(p[:, 0], p[:, 1])
        assert np.all(r <= 1.0 + 1e-9)

    def test_concentric_roundtrip(self, rng_np):
        s = rng_np.random((500, 2))
        p = warp.square_to_uniform_disk_concentric(s)
        s2 = warp.uniform_disk_to_square_concentric(p)
        np.testing.assert_allclose(s2, s, atol=1e-9)

    def test_hemisphere_unit(self, rng_np):
        s = rng_np.random((1000, 2))
        d = warp.square_to_uniform_hemisphere(s)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-7)
        assert np.all(d[:, 2] >= -1e-9)

    def test_cosine_hemisphere_mean(self, rng_np):
        s = rng_np.random((200_000, 2))
        d = warp.square_to_cosine_hemisphere(s)
        # E[cos theta] under cos-weighted pdf = 2/3
        assert np.mean(d[:, 2]) == pytest.approx(2.0 / 3.0, abs=5e-3)

    def test_cone(self, rng_np):
        s = rng_np.random((1000, 2))
        cc = np.cos(0.1)
        d = warp.square_to_uniform_cone(s, cc)
        assert np.all(d[:, 2] >= cc - 1e-9)


class TestRng:
    def test_deterministic(self):
        a = rng.SeedState(42)
        b = rng.SeedState(42)
        assert a.next() == b.next()
        assert np.array_equal(a.next(5), b.next(5))

    def test_distinct(self):
        s = rng.SeedState(42)
        vals = s.next(100)
        assert len(np.unique(vals)) == 100

    def test_reset(self):
        s = rng.SeedState(1)
        v = s.next()
        s.reset()
        assert s.next() == v
