"""System tests: tree canopies (trunk meshes + crowns) end to end.

Oracles:
- An opaque trunk forest over a bright ground darkens the nadir BRF
  relative to the bare ground (shadowing + dark wood).
- Tree canopy renders finite non-negative radiance with and without crowns.

Reference: ``scenes/biosphere/_tree.py``, ``experiments/_canopy.py:21``.
"""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import CanopyExperiment


def _run(canopy, spp=64, zenith=30.0):
    # explicit point target on the central tree: keeps the darkening oracle
    # sharp (the default canopy target is the footprint rectangle, which
    # dilutes the trunk's effect over mostly-bare ground)
    exp = CanopyExperiment(
        illumination={"type": "directional", "zenith": zenith, "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0]],
            "target": {"type": "point", "xyz": [0.0, 0.0, 0.0]},
            "spp": spp,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.8},
        canopy=canopy,
    )
    result = eradiate_tpu.run(exp)
    return float(np.asarray(result["brf"]).ravel()[0])


def _tree_canopy(n_leaves):
    tree = {
        "type": "abstract_tree",
        "leaf_cloud": {
            "construct": "sphere",
            "n_leaves": n_leaves,
            "leaf_radius": 0.1,
            "radius": 1.0,
            "center": (0, 0, 1.0),
            "leaf_reflectance": 0.45,
            "leaf_transmittance": 0.02,
        },
        "trunk_height": 2.0,
        "trunk_radius": 0.5,
        "trunk_reflectance": 0.1,
    }
    # 3x3 grid of trees on a 30 m canopy cell
    g = 0.01  # km
    positions = [[i * g, j * g, 0.0] for i in (-1, 0, 1) for j in (-1, 0, 1)]
    return {
        "type": "discrete_canopy",
        "size": (30.0, 30.0, 4.0),
        "instanced_canopy_elements": [
            {
                "type": "instanced",
                "canopy_element": tree,
                "instance_positions": positions,
            }
        ],
    }


def test_trunk_forest_darkens_brf(mode_mono):
    brf_forest = _run(_tree_canopy(n_leaves=0 or 1), spp=64)
    # bare bright ground
    exp_bare = CanopyExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0]],
            "spp": 64,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.8},
        canopy={
            "type": "leaf_cloud",
            "construct": "cuboid",
            "n_leaves": 1,
            "leaf_radius": 1e-6,
            "l_horizontal": 30.0,
            "l_vertical": 1.0,
        },
    )
    brf_bare = float(np.asarray(eradiate_tpu.run(exp_bare)["brf"]).ravel()[0])
    assert np.isfinite(brf_forest)
    assert 0.0 < brf_forest < brf_bare


def test_full_tree_canopy_runs(mode_mono):
    brf = _run(_tree_canopy(n_leaves=300), spp=32)
    assert np.isfinite(brf)
    assert brf > 0.0
