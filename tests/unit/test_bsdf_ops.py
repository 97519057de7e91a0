"""Unit tests: BSDF evaluation kernels (literature-anchored oracles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.ops import bsdf_ops


def direction(theta_deg, phi_deg=0.0):
    t, p = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    return jnp.asarray(
        [np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], dtype=jnp.float32
    )[None, :]


def white_sky_albedo(kind, params, n=64):
    """Bi-hemispherical reflectance by cosine-quadrature."""
    rng = np.random.default_rng(0)
    from eradiate_tpu.core.warp import square_to_cosine_hemisphere

    wi = jnp.asarray(square_to_cosine_hemisphere(rng.random((n, 2))))
    wo = jnp.asarray(square_to_cosine_hemisphere(rng.random((n, 2))))
    total = 0.0
    for i in range(n):
        f = bsdf_ops.bsdf_eval(kind, params, wi[i : i + 1], wo)
        total += float(jnp.mean(f))
    # ALB = (1/pi) E[f / (pdf_i pdf_o)] with cosine pdfs mu/pi -> pi * E[f]
    return np.pi * total / n


class TestRPV:
    def test_reduces_to_lambertian(self):
        params = {"rho_0": 0.3, "k": 1.0, "g": 0.0, "rho_c": 1.0}
        wi = direction(30.0)
        for to, po in [(0.0, 0.0), (45.0, 90.0), (70.0, 180.0)]:
            f = bsdf_ops.bsdf_eval("rpv", params, wi, direction(to, po))
            np.testing.assert_allclose(float(f[0]), 0.3 / np.pi, rtol=1e-5)

    def test_reciprocity(self):
        params = {"rho_0": 0.183, "k": 0.78, "g": -0.1, "rho_c": 0.183}
        a = bsdf_ops.bsdf_eval("rpv", params, direction(30.0), direction(50.0, 120.0))
        b = bsdf_ops.bsdf_eval("rpv", params, direction(50.0, 120.0), direction(30.0))
        np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-5)

    def test_hot_spot(self):
        # Backscattering (wo == wi) must exceed forward scattering for g<0
        params = {"rho_0": 0.183, "k": 0.78, "g": -0.1, "rho_c": 0.183}
        wi = direction(30.0)
        back = float(bsdf_ops.bsdf_eval("rpv", params, wi, direction(30.0))[0])
        fwd = float(bsdf_ops.bsdf_eval("rpv", params, wi, direction(30.0, 180.0))[0])
        assert back > fwd

    def test_bowl_shape(self):
        # k < 1 -> limb brightening (f increases with view zenith)
        params = {"rho_0": 0.183, "k": 0.78, "g": 0.0, "rho_c": 1.0}
        wi = direction(0.0)
        f20 = float(bsdf_ops.bsdf_eval("rpv", params, wi, direction(20.0, 90.0))[0])
        f70 = float(bsdf_ops.bsdf_eval("rpv", params, wi, direction(70.0, 90.0))[0])
        assert f70 > f20


class TestHapke:
    PARAMS = {
        "w": 0.5,
        "b": 0.2,
        "c": 0.5,
        "theta": 0.0,
        "B_0": 0.0,
        "h": 0.0,
    }

    def test_reciprocity_smooth(self):
        a = bsdf_ops.bsdf_eval(
            "hapke", self.PARAMS, direction(30.0), direction(55.0, 70.0)
        )
        b = bsdf_ops.bsdf_eval(
            "hapke", self.PARAMS, direction(55.0, 70.0), direction(30.0)
        )
        np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-4)

    def test_lommel_seeliger_limit(self):
        # w -> 0: f ~ (w/4pi) p(g) / (mu_i + mu_o)
        params = dict(self.PARAMS, w=1e-4)
        wi, wo = direction(30.0), direction(45.0, 90.0)
        f = float(bsdf_ops.bsdf_eval("hapke", params, wi, wo)[0])
        cos_g = float(jnp.sum(wi * wo))
        p = float(bsdf_ops._hapke_phase(0.2, 0.5, cos_g))
        mu_i, mu_o = np.cos(np.deg2rad(30.0)), np.cos(np.deg2rad(45.0))
        expected = 1e-4 / (4 * np.pi) * p / (mu_i + mu_o)
        np.testing.assert_allclose(f, expected, rtol=0.01)

    def test_opposition_effect(self):
        base = dict(self.PARAMS)
        with_oe = dict(self.PARAMS, B_0=1.0, h=0.06)
        wi = direction(30.0)
        f0 = float(bsdf_ops.bsdf_eval("hapke", base, wi, direction(30.0))[0])
        f1 = float(bsdf_ops.bsdf_eval("hapke", with_oe, wi, direction(30.0))[0])
        assert f1 > f0
        # effect decays away from backscatter
        g40_0 = float(bsdf_ops.bsdf_eval("hapke", base, wi, direction(70.0))[0])
        g40_1 = float(bsdf_ops.bsdf_eval("hapke", with_oe, wi, direction(70.0))[0])
        assert (g40_1 - g40_0) < (f1 - f0)

    def test_roughness_darkens_nadir(self):
        smooth = dict(self.PARAMS)
        rough = dict(self.PARAMS, theta=np.deg2rad(30.0))
        wi = direction(40.0)
        wo = direction(0.0)
        f_smooth = float(bsdf_ops.bsdf_eval("hapke", smooth, wi, wo)[0])
        f_rough = float(bsdf_ops.bsdf_eval("hapke", rough, wi, wo)[0])
        assert f_rough != f_smooth  # roughness changes the signal
        assert f_rough > 0

    def test_energy_bounded(self):
        a09 = white_sky_albedo("hapke", dict(self.PARAMS, w=0.9))
        a10 = white_sky_albedo("hapke", dict(self.PARAMS, w=1.0))
        assert a09 < 1.0
        # conservative scattering -> white-sky albedo ~ 1
        assert 0.9 < a10 < 1.1

    def test_lambertian_albedo_sanity(self):
        np.testing.assert_allclose(
            white_sky_albedo("lambertian", {"reflectance": 0.5}), 0.5, rtol=1e-6
        )


class TestRTLS:
    PARAMS = {"f_iso": 0.209, "f_vol": 0.081, "f_geo": 0.004}

    def test_nadir_kernels_vanish(self):
        # At i = e = 0 both kernels are 0 -> BRF = f_iso
        f = bsdf_ops.bsdf_eval("rtls", self.PARAMS, direction(0.0), direction(0.0))
        np.testing.assert_allclose(float(f[0]) * np.pi, 0.209, rtol=1e-4)

    def test_reciprocity(self):
        a = bsdf_ops.bsdf_eval(
            "rtls", self.PARAMS, direction(30.0), direction(55.0, 110.0)
        )
        b = bsdf_ops.bsdf_eval(
            "rtls", self.PARAMS, direction(55.0, 110.0), direction(30.0)
        )
        np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-4)

    def test_hot_spot_direction(self):
        # RossThick kernel peaks toward backscatter
        wi = direction(30.0)
        back = float(bsdf_ops.bsdf_eval("rtls", self.PARAMS, wi, direction(30.0))[0])
        fwd = float(
            bsdf_ops.bsdf_eval("rtls", self.PARAMS, wi, direction(30.0, 180.0))[0]
        )
        assert back > fwd


class TestBilambertian:
    def test_two_sided(self):
        params = {"reflectance": 0.45, "transmittance": 0.3}
        up_i = direction(30.0)
        up_o = direction(40.0, 90.0)
        down_o = -up_o
        refl = float(bsdf_ops.bsdf_eval("bilambertian", params, up_i, up_o)[0])
        trans = float(bsdf_ops.bsdf_eval("bilambertian", params, up_i, down_o)[0])
        np.testing.assert_allclose(refl, 0.45 / np.pi, rtol=1e-6)
        np.testing.assert_allclose(trans, 0.3 / np.pi, rtol=1e-6)


class TestSampling:
    @pytest.mark.parametrize("kind,params", [
        ("lambertian", {"reflectance": 0.5}),
        ("rpv", {"rho_0": 0.183, "k": 0.78, "g": -0.1, "rho_c": 0.183}),
        ("hapke", TestHapke.PARAMS),
        ("rtls", TestRTLS.PARAMS),
    ])
    def test_sample_weight_consistency(self, kind, params):
        """E[weight] over cosine sampling == directional-hemispherical
        reflectance computed by quadrature."""
        import jax

        wo = direction(30.0)[0]
        keys = jax.random.split(jax.random.key(0), 4096)
        w_new, weight = jax.vmap(
            lambda k: bsdf_ops.bsdf_sample(kind, params, wo, k)
        )(keys)
        mc = float(jnp.mean(weight))
        # quadrature: integral of f cos over hemisphere
        from eradiate_tpu.core.warp import square_to_cosine_hemisphere

        rng = np.random.default_rng(1)
        wi = jnp.asarray(square_to_cosine_hemisphere(rng.random((8192, 2))))
        f = bsdf_ops.bsdf_eval(kind, params, wi, jnp.broadcast_to(wo, wi.shape))
        quad = float(jnp.mean(f) * np.pi)
        np.testing.assert_allclose(mc, quad, rtol=0.05)


class TestOcean:
    PARAMS = {
        "wind_speed": 5.0,
        "wind_azimuth": 0.0,
        "chlorinity": 19.0,
        "pigmentation": 0.3,
        "wavelength": 550.0,
    }

    def test_glint_peak_at_specular(self):
        wi = direction(30.0, 0.0)
        f_spec = float(
            bsdf_ops.bsdf_eval("ocean_legacy", self.PARAMS, wi, direction(30.0, 180.0))[0]
        )
        f_off = float(
            bsdf_ops.bsdf_eval("ocean_legacy", self.PARAMS, wi, direction(60.0, 180.0))[0]
        )
        f_back = float(
            bsdf_ops.bsdf_eval("ocean_legacy", self.PARAMS, wi, direction(30.0, 0.0))[0]
        )
        assert f_spec > 5 * f_off
        assert f_spec > 50 * f_back

    def test_glint_widens_with_wind(self):
        wi = direction(30.0, 0.0)
        wo_off = direction(60.0, 180.0)  # facet tilt ~15 deg: far off-specular
        calm = dict(self.PARAMS, wind_speed=1.0)
        windy = dict(self.PARAMS, wind_speed=12.0)
        f_calm = float(bsdf_ops.bsdf_eval("ocean_legacy", calm, wi, wo_off)[0])
        f_windy = float(bsdf_ops.bsdf_eval("ocean_legacy", windy, wi, wo_off)[0])
        assert f_windy > f_calm  # wider glint lobe off-specular

    def test_reciprocity(self):
        a = bsdf_ops.bsdf_eval(
            "ocean_legacy", self.PARAMS, direction(25.0), direction(50.0, 140.0)
        )
        b = bsdf_ops.bsdf_eval(
            "ocean_legacy", self.PARAMS, direction(50.0, 140.0), direction(25.0)
        )
        np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-4)

    def test_nir_dark_water(self):
        # water-leaving signal vanishes in the NIR; off-glint NIR ocean is dark
        nir = dict(self.PARAMS, wavelength=1600.0)
        wi = direction(30.0, 0.0)
        wo = direction(30.0, 60.0)
        f_vis = float(bsdf_ops.bsdf_eval("ocean_legacy", self.PARAMS, wi, wo)[0])
        f_nir = float(bsdf_ops.bsdf_eval("ocean_legacy", nir, wi, wo)[0])
        assert f_nir < f_vis


class TestMQDiffuse:
    def test_constant_data_is_lambertian(self):
        data = jnp.full((5, 7, 5), 0.3 / np.pi)
        params = {"data": data}
        wi = direction(30.0)
        for to, po in [(0.0, 0.0), (45.0, 90.0)]:
            f = float(bsdf_ops.bsdf_eval("mqdiffuse", params, wi, direction(to, po))[0])
            np.testing.assert_allclose(f, 0.3 / np.pi, rtol=1e-5)

    def test_gradient_data_interpolates(self):
        nto, npd, nti = 9, 9, 9
        ti = np.linspace(0, np.pi / 2, nti)
        data = jnp.asarray(np.broadcast_to(np.cos(ti)[None, None, :], (nto, npd, nti)))
        params = {"data": data}
        f0 = float(bsdf_ops.bsdf_eval("mqdiffuse", params, direction(0.0), direction(30.0))[0])
        f60 = float(bsdf_ops.bsdf_eval("mqdiffuse", params, direction(60.0), direction(30.0))[0])
        np.testing.assert_allclose(f0, 1.0, rtol=0.02)
        np.testing.assert_allclose(f60, 0.5, rtol=0.05)


class TestBsdfProbe:
    """Angular probe helper (mirror of kernel/_bsdf.py:25-52)."""

    def test_lambertian_constant(self):
        from eradiate_tpu.test_tools.bsdf_probe import eval_bsdf

        import jax.numpy as jnp

        ds = eval_bsdf(
            "lambertian",
            {"reflectance": jnp.asarray(0.6)},
            np.linspace(0.05, 1.4, 5),
            np.linspace(0.0, 2 * np.pi, 4, endpoint=False),
            [np.deg2rad(30.0)],
            [0.0],
        )
        assert ds["bsdf"].dims == ("theta_o", "phi_o", "theta_i", "phi_i")
        np.testing.assert_allclose(ds["bsdf"].values, 0.6 / np.pi, rtol=1e-6)

    def test_rpv_hotspot_structure(self):
        from eradiate_tpu.test_tools.bsdf_probe import eval_bsdf

        import jax.numpy as jnp

        params = {
            "rho_0": jnp.asarray(0.1),
            "k": jnp.asarray(0.7),
            "g": jnp.asarray(-0.2),
            "rho_c": jnp.asarray(0.1),
        }
        ti = np.deg2rad(30.0)
        ds = eval_bsdf(
            "rpv", params,
            np.asarray([ti]),                      # theta_o grid
            np.asarray([0.0, np.pi]),              # backscatter vs forward
            [ti], [0.0],
        )
        v = ds["bsdf"].values[0, :, 0, 0]
        assert v[0] > v[1]  # hot spot: backscatter exceeds forward
