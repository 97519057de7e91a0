"""run() under a device mesh == run() single-device, all experiment types.

VERDICT round 1, item #1 "Done" criterion: ``run()`` on the 8-device CPU
mesh produces distribution-identical results to 1 device for all 4
experiment types. Uses explicit ``mesh=`` / ``mesh=None`` arguments and a
pinned SeedState so both runs consume identical seeds.
"""

import jax
import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.core.rng import SeedState
from eradiate_tpu.experiments import (
    AtmosphereExperiment,
    CanopyAtmosphereExperiment,
    CanopyExperiment,
    DEMExperiment,
)
from eradiate_tpu.parallel import make_render_mesh

RTOL = 5e-5


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_render_mesh(1, 8)


def _compare(make_exp, mesh, spp=32, fields=("radiance", "brf")):
    r_mesh = eradiate_tpu.run(
        make_exp(), spp=spp, seed_state=SeedState(123), mesh=mesh
    )
    r_single = eradiate_tpu.run(
        make_exp(), spp=spp, seed_state=SeedState(123), mesh=None
    )
    for f in fields:
        if f not in r_single:
            continue
        np.testing.assert_allclose(
            np.asarray(r_mesh[f].values),
            np.asarray(r_single[f].values),
            rtol=RTOL,
            atol=1e-7,
            err_msg=f,
        )


def test_atmosphere_experiment(mode_mono, mesh8):
    def make_exp():
        return AtmosphereExperiment(
            atmosphere={
                "type": "homogeneous",
                "sigma_s": 1e-3,
                "top": 40.0,
            },
            surface={"type": "lambertian", "reflectance": 0.4},
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-45.0, 0.0, 45.0],
                "azimuth": 0.0,
                "id": "m",
            },
        )

    _compare(make_exp, mesh8)


def test_atmosphere_experiment_polarized(mode_mono_polarized, mesh8):
    def make_exp():
        return AtmosphereExperiment(
            atmosphere={
                "type": "homogeneous",
                "sigma_s": 1e-3,
                "top": 40.0,
            },
            surface={"type": "lambertian", "reflectance": 0.4},
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-45.0, 0.0, 45.0],
                "azimuth": 0.0,
                "id": "m",
            },
            integrator={"type": "volpath", "stokes": True},
        )

    _compare(make_exp, mesh8, fields=("radiance", "brf", "dolp"))


def test_canopy_experiment(mode_mono, mesh8):
    from eradiate_tpu.scenes.biosphere import DiscreteCanopy, LeafCloud

    def make_exp():
        cloud = LeafCloud.cuboid(
            n_leaves=100,
            leaf_radius=0.25,
            l_horizontal=10.0,
            l_vertical=1.0,
            seed=1,
            leaf_reflectance=0.5,
            leaf_transmittance=0.3,
        )
        canopy = DiscreteCanopy(
            size=(10.0, 10.0, 1.0),
            instanced_canopy_elements=[
                {"type": "instanced", "canopy_element": cloud}
            ],
        )
        return CanopyExperiment(
            canopy=canopy,
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-30.0, 0.0, 30.0],
                "azimuth": 0.0,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.25},
        )

    _compare(make_exp, mesh8)


def test_canopy_atmosphere_experiment(mode_mono, mesh8):
    from eradiate_tpu.scenes.biosphere import DiscreteCanopy, LeafCloud

    def make_exp():
        cloud = LeafCloud.cuboid(
            n_leaves=100,
            leaf_radius=0.25,
            l_horizontal=10.0,
            l_vertical=1.0,
            seed=1,
            leaf_reflectance=0.5,
            leaf_transmittance=0.3,
        )
        canopy = DiscreteCanopy(
            size=(10.0, 10.0, 1.0),
            instanced_canopy_elements=[
                {"type": "instanced", "canopy_element": cloud}
            ],
        )
        return CanopyAtmosphereExperiment(
            canopy=canopy,
            atmosphere={"type": "homogeneous", "sigma_s": 1e-3, "top": 40.0},
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-30.0, 0.0, 30.0],
                "azimuth": 0.0,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.25},
        )

    _compare(make_exp, mesh8)


def test_dem_experiment(mode_mono, mesh8):
    from eradiate_tpu.scenes.surface import DEMSurface

    def make_exp():
        surface = DEMSurface.gaussian_hill(
            height_km=0.5, sigma_km=1.0, extent_km=8.0, n=17,
            bsdf={"type": "lambertian", "reflectance": 0.4},
        )
        return DEMExperiment(
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [-30.0, 0.0, 30.0],
                "azimuth": 0.0,
                "id": "m",
            },
            surface=surface,
            atmosphere=None,
        )

    _compare(make_exp, mesh8)


def test_spherical_experiment(mode_mono, mesh8):
    def make_exp():
        return AtmosphereExperiment(
            geometry="spherical_shell",
            atmosphere={
                "type": "homogeneous",
                "sigma_s": 1e-3,
                "top": 40.0,
            },
            surface={"type": "lambertian", "reflectance": 0.4},
            illumination={"type": "directional", "zenith": 45.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [0.0, 30.0],
                "azimuth": 0.0,
                "id": "m",
            },
        )

    _compare(make_exp, mesh8)
