"""6SV-heritage ocean optical tables (VERDICT r2 task #8).

Pins the transcribed Hale & Querry / Pope & Fry / Prieur-Sathyendranath
tables to well-known published anchor values and checks the Morel
case-1 underlight model behaves like ocean colour physically must, plus
that the product BSDF path actually consumes the tables.
"""

import numpy as np
import pytest

from eradiate_tpu.physics import ocean_data as od


class TestWaterIOR:
    def test_published_anchors(self):
        # pure water (chlorinity 0): canonical Hale & Querry values
        assert od.water_ior(550.0, 0.0) == pytest.approx(1.333, abs=2e-3)
        assert od.water_ior(400.0, 0.0) == pytest.approx(1.339, abs=2e-3)
        assert od.water_ior(1000.0, 0.0) == pytest.approx(1.327, abs=2e-3)
        assert od.water_ior(2500.0, 0.0) == pytest.approx(1.261, abs=3e-3)

    def test_salinity_raises_ior(self):
        assert od.water_ior(550.0, 19.0) > od.water_ior(550.0, 0.0)

    def test_monotone_decreasing_vis_nir(self):
        w = np.linspace(400.0, 2400.0, 60)
        n = od.water_ior(w, 0.0)
        assert np.all(np.diff(n) <= 1e-12)


class TestWaterAbsorption:
    def test_pope_fry_anchors(self):
        # published minimum near 420 nm and steep red rise
        assert od.water_absorption_m1(420.0)[0] == pytest.approx(
            0.00454, rel=0.05
        )
        assert od.water_absorption_m1(440.0)[0] == pytest.approx(
            0.00635, rel=0.05
        )
        assert od.water_absorption_m1(700.0)[0] == pytest.approx(
            0.624, rel=0.05
        )

    def test_nir_orders_of_magnitude(self):
        # water is ~4 orders more absorbing at 1.45 um than at 450 nm
        a_vis = od.water_absorption_m1(450.0)[0]
        a_nir = od.water_absorption_m1(1450.0)[0]
        assert a_nir / a_vis > 1e4


class TestCase1Reflectance:
    def test_blue_green_ocean_color(self):
        """Oligotrophic water is blue (R(440) > R(560)); eutrophic water
        shifts green — the defining case-1 behavior."""
        r_blue_clear = od.case1_water_reflectance(440.0, 0.03)[0]
        r_green_clear = od.case1_water_reflectance(560.0, 0.03)[0]
        assert r_blue_clear > 2 * r_green_clear
        r_blue_eutro = od.case1_water_reflectance(440.0, 10.0)[0]
        r_green_eutro = od.case1_water_reflectance(560.0, 10.0)[0]
        assert r_blue_eutro < 1.5 * r_green_eutro

    def test_magnitude_and_nir_dark(self):
        r = od.case1_water_reflectance(440.0, 0.1)[0]
        assert 0.01 < r < 0.15  # typical clear-ocean blue reflectance
        assert od.case1_water_reflectance(900.0, 0.1)[0] < 1e-3

    def test_pigment_darkens_blue(self):
        r = [
            od.case1_water_reflectance(440.0, c)[0]
            for c in (0.03, 0.3, 3.0)
        ]
        assert r[0] > r[1] > r[2]


class TestBsdfUsesTables:
    def test_eval_params_carries_table_values(self):
        from eradiate_tpu.scenes.bsdfs import bsdf_factory

        b = bsdf_factory.convert({"type": "ocean_legacy", "wind_speed": 5.0})
        p = b.eval_params([440.0, 550.0, 1600.0])
        np.testing.assert_allclose(
            p["n_water"], od.water_ior([440.0, 550.0, 1600.0], 19.0)
        )
        np.testing.assert_allclose(
            p["r_water"],
            od.case1_water_reflectance([440.0, 550.0, 1600.0], 0.3),
        )

    def test_kernel_consumes_n_water(self):
        """ocean_legacy_eval with a doctored n_water must differ from the
        fallback path — proving the table value actually drives Fresnel."""
        import jax.numpy as jnp

        from eradiate_tpu.ops import bsdf_ops

        def direction(zen, az=0.0):
            z, a = np.deg2rad(zen), np.deg2rad(az)
            return jnp.asarray(
                [np.sin(z) * np.cos(a), np.sin(z) * np.sin(a), np.cos(z)]
            )

        base = {
            "wind_speed": jnp.asarray([5.0]),
            "wind_azimuth": jnp.asarray([0.0]),
            "chlorinity": jnp.asarray([19.0]),
            "pigmentation": jnp.asarray([0.3]),
            "wavelength": jnp.asarray([550.0]),
        }
        wi = direction(30.0)
        wo = direction(30.0, 180.0)
        f_fallback = float(
            bsdf_ops.bsdf_eval("ocean_legacy", base, wi, wo)[0]
        )
        doctored = dict(base)
        doctored["n_water"] = jnp.asarray([1.5])
        doctored["r_water"] = jnp.asarray([0.0])
        f_table = float(
            bsdf_ops.bsdf_eval("ocean_legacy", doctored, wi, wo)[0]
        )
        assert f_table != pytest.approx(f_fallback, rel=1e-3)
