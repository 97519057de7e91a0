"""Regression tier: self-consistency via the statistical test machinery.

The reference compares against stored NetCDF references rendered by
Mitsuba (``tests/03_regression``); those artifacts are not available
offline, so this tier (a) validates the statistical machinery itself and
(b) pins our own reference results: a stored run of each canonical scene
(committed under ``tests/regression_references``) must match re-runs within
MC tolerance. References regenerate with
``python -m tests.regression.test_self_regression`` (as __main__).
"""

import os

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.test_tools import SidakTTest, ZTest, RMSETest
from eradiate_tpu.test_tools.test_cases import create_rpv_afgl1986_brfpp

REF_DIR = os.path.join(os.path.dirname(__file__), "..", "regression_references")


def run_case(spp=1000, seed=1):
    exp = create_rpv_afgl1986_brfpp(spp=spp, n_vza=19)
    eradiate_tpu.root_seed_state.reset(seed)
    result = eradiate_tpu.run(exp)
    return result


class TestStatisticalMachinery:
    def test_ztest_same_distribution_passes(self, mode_mono):
        r1 = run_case(spp=512, seed=1)
        r2 = run_case(spp=512, seed=2)
        var = r1["var"].values + r2["var"].values
        test = ZTest(
            value=r1["radiance"].values,
            reference=r2["radiance"].values,
            variance=var,
            threshold=0.01,
        )
        assert test.run(), test.metric_value

    def test_ztest_detects_bias(self, mode_mono):
        r1 = run_case(spp=512, seed=1)
        biased = r1["radiance"].values * 1.2
        test = ZTest(
            value=r1["radiance"].values,
            reference=biased,
            variance=np.maximum(r1["var"].values, 1e-30),
            threshold=0.05,
        )
        assert not test.run()

    def test_sidak_ttest(self, mode_mono):
        r1 = run_case(spp=512, seed=3)
        r2 = run_case(spp=512, seed=4)
        test = SidakTTest(
            value=r1["radiance"].values,
            reference=r2["radiance"].values,
            variance=r1["var"].values,
            reference_variance=r2["var"].values,
            threshold=0.05,
        )
        assert test.run(), test.metric_value


class TestPinnedReference:
    REF_FILE = os.path.join(REF_DIR, "rpv_afgl1986_brfpp.npz")

    def test_matches_pinned_reference(self, mode_mono):
        if not os.path.exists(self.REF_FILE):
            pytest.skip("pinned reference not generated yet")
        ref = np.load(self.REF_FILE)
        r = run_case(spp=int(ref["spp"]), seed=7)
        test = SidakTTest(
            value=r["radiance"].values,
            reference=ref["radiance"],
            variance=r["var"].values,
            reference_variance=ref["var"],
            threshold=0.01,
        )
        assert test.run(), test.metric_value
        # and the BRF magnitude is in the physical ballpark
        rmse = RMSETest(
            value=r["brf"].values, reference=ref["brf"], threshold=0.05
        )
        assert rmse.run(), rmse.metric_value


def regenerate():
    eradiate_tpu.set_mode("mono")
    os.makedirs(REF_DIR, exist_ok=True)
    r = run_case(spp=4096, seed=11)
    np.savez(
        TestPinnedReference.REF_FILE,
        radiance=r["radiance"].values,
        var=r["var"].values,
        brf=r["brf"].values,
        spp=4096,
    )
    print("wrote", TestPinnedReference.REF_FILE)


if __name__ == "__main__":
    regenerate()
