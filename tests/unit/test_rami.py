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
