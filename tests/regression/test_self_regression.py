"""Regression tier: self-consistency via the statistical test machinery.

The reference compares against stored NetCDF references rendered by
Mitsuba (``tests/03_regression``); those artifacts are not available
offline, so this tier (a) validates the statistical machinery itself and
(b) pins our own reference results: a stored run of each canonical scene
(committed under ``tests/regression_references``) must match re-runs within
MC tolerance. References regenerate with
``python -m tests.regression.test_self_regression`` (as __main__).

Canonical cases mirror the reference regression scenes
(``tests/03_regression/{atmospheres,ocean,rami4atm,romc,spherical}``).
"""

import os

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.test_tools import RMSETest, SidakTTest, ZTest
from eradiate_tpu.test_tools import test_cases as tc

REF_DIR = os.path.join(os.path.dirname(__file__), "..", "regression_references")

#: case id -> (factory, regen kwargs, rerun seed)
CASES = {
    "rpv_afgl1986_brfpp": (
        tc.create_rpv_afgl1986_brfpp, dict(spp=4096, n_vza=19), 7),
    "rpv_afgl1986_continental_brfpp": (
        tc.create_rpv_afgl1986_continental_brfpp, dict(spp=1024, n_vza=19), 7),
    "het01_brfpp": (tc.create_het01_brfpp, dict(spp=512, n_vza=19), 7),
    "het04a1_brfpp": (tc.create_het04a1_brfpp, dict(spp=512, n_vza=19), 7),
    "het06_brfpp": (tc.create_het06_brfpp, dict(spp=512, n_vza=19), 7),
    "ocean_grasp_coastal": (
        tc.create_ocean_grasp_coastal_no_atm, dict(spp=512), 7),
    "ocean_grasp_open": (tc.create_ocean_grasp_open_no_atm, dict(spp=512), 7),
    "rami4atm_toa_brfpp": (
        tc.create_rami4atm_toa_brfpp, dict(spp=1024, n_vza=19), 7),
    "spherical_rpv_brfpp": (tc.create_spherical_rpv_brfpp, dict(spp=512), 7),
}

#: per-case RMSE ballpark threshold; spherical delta tracking over a dark
#: RPV surface is noisy at this spp, so the statistical test carries the
#: weight there (the reference likewise uses SidakTTest only,
#: ``tests/03_regression/spherical/test_spherical.py:60``)
RMSE_THRESHOLD = {"spherical_rpv_brfpp": 0.35}


def run_case(factory=tc.create_rpv_afgl1986_brfpp, spp=1000, seed=1, **kwargs):
    exp = factory(spp=spp, **kwargs)
    eradiate_tpu.root_seed_state.reset(seed)
    return eradiate_tpu.run(exp)


class TestStatisticalMachinery:
    def test_ztest_same_distribution_passes(self, mode_mono):
        r1 = run_case(spp=512, n_vza=19, seed=1)
        r2 = run_case(spp=512, n_vza=19, seed=2)
        var = r1["var"].values + r2["var"].values
        test = ZTest(
            value=r1["radiance"].values,
            reference=r2["radiance"].values,
            variance=var,
            threshold=0.01,
        )
        assert test.run(), test.metric_value

    def test_ztest_detects_bias(self, mode_mono):
        r1 = run_case(spp=512, n_vza=19, seed=1)
        biased = r1["radiance"].values * 1.2
        test = ZTest(
            value=r1["radiance"].values,
            reference=biased,
            variance=np.maximum(r1["var"].values, 1e-30),
            threshold=0.05,
        )
        assert not test.run()

    def test_sidak_ttest(self, mode_mono):
        r1 = run_case(spp=512, n_vza=19, seed=3)
        r2 = run_case(spp=512, n_vza=19, seed=4)
        test = SidakTTest(
            value=r1["radiance"].values,
            reference=r2["radiance"].values,
            variance=r1["var"].values,
            reference_variance=r2["var"].values,
            threshold=0.05,
        )
        assert test.run(), test.metric_value


@pytest.mark.parametrize("case_id", sorted(CASES))
def test_matches_pinned_reference(case_id, mode_mono):
    factory, kwargs, seed = CASES[case_id]
    ref_file = os.path.join(REF_DIR, f"{case_id}.npz")
    if not os.path.exists(ref_file):
        pytest.skip(f"pinned reference {case_id} not generated yet")
    ref = np.load(ref_file)
    kwargs = dict(kwargs, spp=int(ref["spp"]))
    r = run_case(factory, seed=seed, **kwargs)
    # Relative variance floor: smooth specular scenes (ocean glint) have
    # angles where every sample path is identical, so the MC variance is
    # EXACTLY zero and the t-statistic divides by ~0 — any f32
    # summation-order change (e.g. a different lane decomposition) then
    # reads as infinite significance. Floor at (1e-5 * value)^2: still
    # catches any real bias > ~1e-5 relative, immune to bit-order shifts.
    var_floor = (1e-5 * np.abs(r["radiance"].values)) ** 2
    test = SidakTTest(
        value=r["radiance"].values,
        reference=ref["radiance"],
        variance=np.maximum(r["var"].values, var_floor),
        reference_variance=np.maximum(ref["var"], var_floor),
        threshold=0.01,
    )
    assert test.run(), (case_id, test.metric_value)
    # and the BRF magnitude is in the physical ballpark
    rmse = RMSETest(
        value=r["brf"].values,
        reference=ref["brf"],
        threshold=RMSE_THRESHOLD.get(case_id, 0.05),
    )
    assert rmse.run(), (case_id, rmse.metric_value)


def regenerate():
    eradiate_tpu.set_mode("mono")
    os.makedirs(REF_DIR, exist_ok=True)
    for case_id, (factory, kwargs, _) in CASES.items():
        r = run_case(factory, seed=11, **kwargs)
        out = os.path.join(REF_DIR, f"{case_id}.npz")
        np.savez(
            out,
            radiance=r["radiance"].values,
            var=r["var"].values,
            brf=r["brf"].values,
            spp=kwargs["spp"],
        )
        print("wrote", out)


if __name__ == "__main__":
    regenerate()
