"""System tests: BRF symmetries and surface-model consistency.

Mirror of the reference's ``tests/02_system/test_onedim_symmetry.py``
(principal-plane symmetry) plus engine-vs-direct-BSDF consistency: without
an atmosphere, the distant BRF is exactly pi * f(w_sun, w_v).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.core.frame import angles_to_direction
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.ops import bsdf_ops


def run_brf(surface, sza=30.0, saa=0.0, vzas=None, vaa=0.0, spp=1, atmosphere=None):
    vzas = np.linspace(-75, 75, 11) if vzas is None else vzas
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": sza, "azimuth": saa},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": vzas,
            "azimuth": vaa,
            "spp": spp,
            "id": "m",
        },
        surface=surface,
        atmosphere=atmosphere,
    )
    return eradiate_tpu.run(exp), vzas


class TestNoAtmosphereExactness:
    @pytest.mark.parametrize(
        "surface",
        [
            {"type": "rpv"},
            {"type": "rpv", "rho_0": 0.3, "k": 0.6, "g": -0.2, "rho_c": 0.2},
            {"type": "hapke"},
            {"type": "rtls"},
        ],
    )
    def test_brf_equals_pi_f(self, mode_mono, surface):
        sza = 30.0
        result, vzas = run_brf(dict(surface), sza=sza)
        brf = result["brf"].values[0]

        # direct BSDF evaluation
        from eradiate_tpu.scenes.bsdfs import bsdf_factory

        bsdf = bsdf_factory.convert(dict(surface))
        params = {
            k: jnp.asarray(v[0], dtype=jnp.float32)
            for k, v in bsdf.eval_params(np.array([550.0])).items()
        }
        w_sun = angles_to_direction([np.deg2rad(sza), 0.0])[0]
        w_v = angles_to_direction(
            np.stack([np.deg2rad(vzas), np.zeros(len(vzas))], axis=-1)
        )
        f = bsdf_ops.bsdf_eval(
            bsdf.kind, params, jnp.asarray(w_sun)[None, :], jnp.asarray(w_v)
        )
        np.testing.assert_allclose(brf, np.pi * np.asarray(f), rtol=1e-4)


class TestPrincipalPlaneSymmetry:
    def test_sza0_symmetry(self, mode_mono):
        """Overhead sun: BRF(+vza) == BRF(-vza) exactly (deterministic
        first-bounce, no atmosphere)."""
        result, vzas = run_brf({"type": "rpv"}, sza=0.0)
        brf = result["brf"].values[0]
        np.testing.assert_allclose(brf, brf[::-1], rtol=1e-5)

    def test_azimuth_invariance_rotation(self, mode_mono):
        """Rotating sun and sensor azimuths together leaves BRF unchanged."""
        r1, _ = run_brf({"type": "rpv"}, sza=40.0, saa=0.0, vaa=0.0)
        r2, _ = run_brf({"type": "rpv"}, sza=40.0, saa=60.0, vaa=60.0)
        np.testing.assert_allclose(
            r1["brf"].values, r2["brf"].values, rtol=1e-5
        )

    def test_rayleigh_atmosphere_symmetry(self, mode_mono):
        """With a Rayleigh atmosphere and overhead sun, the mean BRF over
        the +vza and -vza branches agree within MC tolerance."""
        result, vzas = run_brf(
            {"type": "lambertian", "reflectance": 0.3},
            sza=0.0,
            spp=2048,
            atmosphere={"type": "molecular"},
        )
        brf = result["brf"].values[0]
        var = result["var"].values[0]
        sigma = np.sqrt(var) * np.pi  # brf-space
        diff = np.abs(brf - brf[::-1])
        assert np.all(diff < 5 * (sigma + sigma[::-1]) + 5e-4)


class TestAstroObject:
    def test_matches_directional_for_small_disk(self, mode_mono):
        """A 0.5-deg sun disk over a lambertian surface matches the ideal
        directional BRF to first order."""
        import eradiate_tpu
        from eradiate_tpu.experiments import AtmosphereExperiment

        base = dict(
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [0.0, 40.0],
                "azimuth": 0.0,
                "spp": 512,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.5},
            atmosphere=None,
        )
        r_dir = eradiate_tpu.run(
            AtmosphereExperiment(
                illumination={"type": "directional", "zenith": 30.0}, **base
            )
        )
        r_astro = eradiate_tpu.run(
            AtmosphereExperiment(
                illumination={
                    "type": "astro_object",
                    "zenith": 30.0,
                    "angular_diameter": 0.5334,
                },
                **base,
            )
        )
        np.testing.assert_allclose(
            r_astro["brf"].values, r_dir["brf"].values, rtol=2e-3
        )

    def test_large_disk_softens(self, mode_mono):
        """A very large disk source spreads illumination: BRF of a
        lambertian surface stays ~reflectance (energy check)."""
        import eradiate_tpu
        from eradiate_tpu.experiments import AtmosphereExperiment

        exp = AtmosphereExperiment(
            illumination={
                "type": "astro_object",
                "zenith": 0.0,
                "angular_diameter": 10.0,
            },
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [0.0],
                "azimuth": 0.0,
                "spp": 4096,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.5},
            atmosphere=None,
        )
        r = eradiate_tpu.run(exp)
        # cos-weighting over the 10-deg disk shifts BRF by < 1%
        np.testing.assert_allclose(r["brf"].values, 0.5, rtol=0.01)
