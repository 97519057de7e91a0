"""System test: stratified first-flight sampling reduces MC variance on a
scattering atmosphere while leaving the estimator unbiased (reference
sampler plugin semantics, ``scenes/measure/_core.py:142-154``)."""

import numpy as np

import eradiate_tpu
from eradiate_tpu.experiments import AtmosphereExperiment


def _run(sampler, spp, seed=7):
    eradiate_tpu.root_seed_state.reset(seed)
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[30.0, 0.0]],
            "spp": spp,
            "sampler": sampler,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.3},
        # pure Rayleigh scattering column: first-flight distance dominates
        atmosphere={"type": "homogeneous", "sigma_s": 0.05, "top": 10.0},
        geometry={"type": "plane_parallel", "toa_altitude": 10.0},
    )
    result = eradiate_tpu.run(exp)
    rad = float(np.asarray(result["radiance"]).ravel()[0])
    var = float(np.asarray(result["var"]).ravel()[0])
    return rad, var


def test_stratified_unbiased_and_lower_variance(mode_mono):
    spp = 512
    rad_ind, var_ind = _run("independent", spp)
    rad_str, var_str = _run("stratified", spp)
    # unbiased: both estimates agree within combined MC error
    sigma = np.sqrt(var_ind + var_str)
    assert abs(rad_ind - rad_str) < 5 * max(sigma, 1e-12)
    # stratified first flight cuts the sample variance
    assert var_str < var_ind


def test_ldsampler_runs(mode_mono):
    rad, var = _run("ldsampler", 128)
    assert np.isfinite(rad) and rad > 0
    assert var >= 0
