"""Unit tests: regression metrics, srf tools, settings, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from eradiate_tpu.srf_tools import pad_srf, spectral_filter, trim_srf
from eradiate_tpu.test_tools import (
    Chi2Test,
    PairedStudentTTest,
    RMSETest,
    SidakTTest,
    ZTest,
)


class TestRegressionMetrics:
    def test_rmse(self):
        r = np.ones(10)
        assert RMSETest(value=r * 1.01, reference=r, threshold=0.05).run()
        assert not RMSETest(value=r * 1.2, reference=r, threshold=0.05).run()

    def test_ztest(self, rng_np):
        ref = np.ones(50)
        var = np.full(50, 0.01**2)
        val = ref + rng_np.normal(0, 0.01, 50)
        assert ZTest(value=val, reference=ref, variance=var).run()
        assert not ZTest(value=ref + 0.1, reference=ref, variance=var).run()

    def test_chi2(self, rng_np):
        ref = np.ones(50)
        var = np.full(50, 0.01**2)
        val = ref + rng_np.normal(0, 0.01, 50)
        assert Chi2Test(value=val, reference=ref, variance=var).run()

    def test_sidak(self, rng_np):
        ref = np.ones(50)
        var = np.full(50, 0.01**2)
        val = ref + rng_np.normal(0, 0.01, 50)
        assert SidakTTest(value=val, reference=ref, variance=var).run()

    def test_paired_t(self, rng_np):
        ref = rng_np.random(30)
        val = ref + rng_np.normal(0, 1e-3, 30)
        assert PairedStudentTTest(value=val, reference=ref).run()

    def test_archive_on_failure(self, tmp_path):
        t = RMSETest(
            value=np.ones(5) * 2,
            reference=np.ones(5),
            threshold=0.01,
            archive_dir=str(tmp_path),
            name="t",
        )
        assert not t.run()
        assert (tmp_path / "t_failure.npz").exists()


class TestSRFTools:
    def test_trim_threshold(self):
        w = np.linspace(400, 600, 201)
        v = np.exp(-0.5 * ((w - 500) / 10) ** 2)
        w2, v2 = trim_srf(w, v, threshold=1e-2)
        assert w2.size < w.size
        assert v2.max() == v.max()

    def test_trim_integral(self):
        w = np.linspace(400, 600, 201)
        v = np.exp(-0.5 * ((w - 500) / 10) ** 2)
        w2, v2 = trim_srf(w, v, keep_integral=0.99)
        assert w2.size < w.size
        # kept integral close to 99%
        kept = np.trapezoid(v2, w2) / np.trapezoid(v, w)
        assert kept > 0.985

    def test_pad(self):
        w, v = pad_srf([500.0, 510.0], [1.0, 1.0], n=2)
        assert w.size == 6 and v[0] == 0 and v[-1] == 0
        assert np.all(np.diff(w) > 0)

    def test_filter(self):
        w, v = spectral_filter(np.arange(10.0), np.ones(10), wmin=3, wmax=6)
        assert w.size == 4


class TestSettings:
    def test_defaults(self):
        from eradiate_tpu.config import settings

        assert settings.get("PROGRESS") == "SPECTRAL_LOOP"
        assert settings.get("RNG_SEED") == 0

    def test_env_override(self, monkeypatch):
        from eradiate_tpu.config import settings

        monkeypatch.setenv("ERADIATE_TPU_RNG_SEED", "42")
        assert settings.get("RNG_SEED") == 42

    def test_progress_enum(self):
        from eradiate_tpu.config import ProgressLevel, settings

        assert settings.progress == ProgressLevel.SPECTRAL_LOOP


class TestCLI:
    def _run(self, *args):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        return subprocess.run(
            [sys.executable, "-m", "eradiate_tpu.cli", *args],
            capture_output=True,
            text=True,
            cwd=os.path.join(os.path.dirname(__file__), "..", ".."),
            timeout=240,
            env=env,
        )

    def test_sys_info(self):
        out = self._run("sys-info")
        assert out.returncode == 0, out.stderr
        info = json.loads(out.stdout)
        assert "jax" in info and "eradiate_tpu" in info

    def test_data_paths(self):
        out = self._run("data", "paths")
        assert out.returncode == 0
        assert "store" in out.stdout

    def test_srf_trim_roundtrip(self, tmp_path):
        w = np.linspace(400, 600, 101)
        v = np.exp(-0.5 * ((w - 500) / 10) ** 2)
        src = tmp_path / "in.npz"
        dst = tmp_path / "out.npz"
        np.savez(src, w=w, srf=v)
        out = self._run("srf", "trim", str(src), str(dst))
        assert out.returncode == 0, out.stderr
        d = np.load(dst)
        assert d["w"].size < 101
