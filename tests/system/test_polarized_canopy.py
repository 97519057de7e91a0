"""System tests: polarized canopy transport (BASELINE config 5 shape).

The polarized canopy tracer (ops/tracer_canopy_polarized.py) shares the
scalar canopy tracer's event structure and per-bounce uniform slot layout,
so with depolarizing-only interactions (bilambertian leaves + lambertian
floor, no atmosphere) the Stokes I component must reproduce the scalar
radiance exactly (same sample paths, identity Mueller chains on I).
With a Rayleigh atmosphere above the canopy the skylight acquires real
polarization (reference ``CanopyAtmosphereExperiment`` + ``stokes``
wrapper, ``experiments/_canopy_atmosphere.py:47``).
"""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.experiments import CanopyAtmosphereExperiment, CanopyExperiment


def _canopy_kwargs(spp):
    return dict(
        canopy={
            "type": "discrete_canopy",
            "size": [20.0, 20.0, 2.0],
            "instanced_canopy_elements": [
                {
                    "type": "instanced",
                    "canopy_element": {
                        "type": "leaf_cloud",
                        "construct": "cuboid",
                        "n_leaves": 300,
                        "leaf_radius": 0.1,
                        "l_horizontal": 20.0,
                        "l_vertical": 2.0,
                        "leaf_reflectance": 0.45,
                        "leaf_transmittance": 0.3,
                    },
                    "instance_positions": [[0.0, 0.0, 0.0]],
                }
            ],
        },
        illumination={"type": "directional", "zenith": 30.0, "azimuth": 0.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": np.linspace(-60, 60, 5),
            "azimuth": 0.0,
            "spp": spp,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.2},
    )


def test_polarized_canopy_matches_scalar_for_depolarizing_scene(
    mode_mono, mode_mono_polarized
):
    # no atmosphere: every interaction (leaf, floor) is depolarizing, and
    # the polarized tracer's I must equal the scalar radiance (same paths)
    eradiate_tpu.set_mode("mono")
    exp = CanopyExperiment(**_canopy_kwargs(spp=256))
    eradiate_tpu.root_seed_state.reset(3)
    r_scalar = eradiate_tpu.run(exp)

    eradiate_tpu.set_mode("mono_polarized")
    exp = CanopyExperiment(**_canopy_kwargs(spp=256))
    eradiate_tpu.root_seed_state.reset(3)
    r_pol = eradiate_tpu.run(exp)

    # same uniforms => same paths, up to rare borderline branch flips
    # (disk-edge hits round differently through the two bounce codepaths);
    # at spp 256 a single diverged path moves a pixel by ~2e-3 relative
    np.testing.assert_allclose(
        r_pol["radiance"].values, r_scalar["radiance"].values, rtol=5e-3
    )
    assert (
        np.median(
            np.abs(r_pol["radiance"].values - r_scalar["radiance"].values)
            / r_scalar["radiance"].values
        )
        < 1e-6
    )
    # and the scene is strictly depolarizing: Q = U = V = 0
    for c in ("Q", "U", "V"):
        np.testing.assert_allclose(r_pol[c].values, 0.0, atol=1e-7)


def test_polarized_canopy_atmosphere_dolp(mode_mono_polarized):
    kwargs = _canopy_kwargs(spp=1024)
    kwargs["atmosphere"] = {"type": "molecular"}
    # dark floor + Rayleigh sky: polarization survives to TOA
    kwargs["surface"] = {"type": "lambertian", "reflectance": 0.05}
    exp = CanopyAtmosphereExperiment(**kwargs)
    eradiate_tpu.root_seed_state.reset(5)
    result = eradiate_tpu.run(exp)
    for name in ("I", "Q", "U", "V", "dolp"):
        assert name in result, name
    I = result["I"].values
    dolp = result["dolp"].values
    assert np.all(np.isfinite(I)) and np.all(I > 0)
    assert np.all((dolp >= 0) & (dolp <= 1.0 + 1e-6))
    # Rayleigh scattering above the canopy must polarize some directions
    assert dolp.max() > 0.02


def test_lane_sort_bit_invariance(mode_mono_polarized, monkeypatch):
    """The polarized canopy loop's Morton lane sorting must not change
    results beyond f32 summation grouping (keys travel with lanes; sums
    scatter back to original order)."""
    import numpy as np

    from eradiate_tpu.ops import SceneConfig
    from eradiate_tpu.ops.canopy import LeafCloudArrays
    from eradiate_tpu.ops.tracer_canopy_polarized import (
        render_canopy_polarized,
    )

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "unit"))
    from test_tracer import make_scene, make_sensor

    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 96
    centers = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0.2, 1.0, n)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    leaves = LeafCloudArrays(
        centers=jnp.asarray(centers),
        normals=jnp.asarray(normals),
        radii=jnp.full(n, 0.3),
    )
    leaf_params = {
        "reflectance": jnp.full(1, 0.45),
        "transmittance": jnp.full(1, 0.3),
    }
    scene = make_scene(sigma_t=0.0, reflectance=0.25, S=1)
    sensor = make_sensor(np.array([0.0, 30.0]))
    sensor = dataclasses.replace(sensor, ray_offset=jnp.asarray(50.0))
    cfg = SceneConfig(polarized=True)

    monkeypatch.setenv("ERADIATE_CANOPY_SORT", "0")
    r_unsorted = render_canopy_polarized(
        scene, leaf_params, leaves, sensor, cfg, spp=64, seed=4
    )
    monkeypatch.setenv("ERADIATE_CANOPY_SORT", "1")
    r_sorted = render_canopy_polarized(
        scene, leaf_params, leaves, sensor, cfg, spp=64, seed=4
    )
    np.testing.assert_allclose(
        np.asarray(r_sorted["stokes"]),
        np.asarray(r_unsorted["stokes"]),
        rtol=2e-5, atol=1e-8,
    )
