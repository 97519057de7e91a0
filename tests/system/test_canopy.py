"""System tests: canopy experiments.

Oracles:
- empty canopy (zero leaves / zero-size) reduces to the bare-surface BRF;
- a dense dark canopy darkens the scene relative to a bright surface;
- leaf reflectance ordering is preserved;
- coupled canopy + Rayleigh atmosphere runs (BASELINE config 5 shape).
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import CanopyAtmosphereExperiment, CanopyExperiment
from eradiate_tpu.scenes.biosphere import DiscreteCanopy, LeafCloud


def make_canopy(n_leaves=200, refl=0.5, trans=0.3, lai_boost=1.0, seed=1):
    cloud = LeafCloud.cuboid(
        n_leaves=n_leaves,
        leaf_radius=0.25 * lai_boost,
        l_horizontal=10.0,
        l_vertical=1.0,
        seed=seed,
        leaf_reflectance=refl,
        leaf_transmittance=trans,
    )
    return DiscreteCanopy(
        size=(10.0, 10.0, 1.0),
        instanced_canopy_elements=[
            {"type": "instanced", "canopy_element": cloud}
        ],
    )


def run_canopy(canopy, surface_refl=0.25, spp=256, atmosphere=None, sza=30.0):
    cls = CanopyAtmosphereExperiment if atmosphere is not None else CanopyExperiment
    kwargs = {}
    if atmosphere is not None:
        kwargs["atmosphere"] = atmosphere
    exp = cls(
        canopy=canopy,
        illumination={"type": "directional", "zenith": sza, "azimuth": 0.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": [-30.0, 0.0, 30.0],
            "azimuth": 0.0,
            "spp": spp,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": surface_refl},
        **kwargs,
    )
    return eradiate_tpu.run(exp)


class TestCanopyExperiment:
    def test_no_canopy_reduces_to_surface(self, mode_mono):
        exp = CanopyExperiment(
            canopy=None,
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [0.0],
                "azimuth": 0.0,
                "spp": 1,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.25},
        )
        result = eradiate_tpu.run(exp)
        np.testing.assert_allclose(result["brf"].values, 0.25, atol=1e-5)

    def test_dark_canopy_darkens(self, mode_mono):
        dark = make_canopy(n_leaves=800, refl=0.02, trans=0.01)
        r = run_canopy(dark, surface_refl=0.8, spp=512)
        brf = r["brf"].values
        assert np.all(brf < 0.8)
        assert np.all(brf > 0.0)

    def test_leaf_reflectance_ordering(self, mode_mono):
        brfs = []
        for refl in (0.1, 0.6):
            c = make_canopy(n_leaves=600, refl=refl, trans=0.05, seed=7)
            r = run_canopy(c, surface_refl=0.05, spp=1024)
            brfs.append(float(np.mean(r["brf"].values)))
        assert brfs[1] > brfs[0]

    def test_energy_bound(self, mode_mono):
        c = make_canopy(n_leaves=400, refl=0.5, trans=0.4)
        r = run_canopy(c, surface_refl=0.5, spp=1024)
        assert np.all(r["brf"].values < 1.5)


class TestCanopyAtmosphere:
    def test_coupled_runs(self, mode_mono):
        c = make_canopy(n_leaves=200, refl=0.4, trans=0.3)
        r = run_canopy(
            c, surface_refl=0.2, spp=256, atmosphere={"type": "molecular"}
        )
        brf = r["brf"].values
        assert np.all(np.isfinite(brf)) and np.all(brf > 0)

    def test_padding(self, mode_mono):
        c = make_canopy(n_leaves=100)
        padded = c.padded_copy(1)
        flat = padded.flatten()
        assert flat.n_leaves == 900
