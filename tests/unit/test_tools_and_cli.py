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


class TestSrfToolsParity:
    """Reference-parity srf_tools functions (srf_tools.py:79-1045)."""

    def _gauss(self, n=101):
        w = np.linspace(500.0, 600.0, n)
        v = np.exp(-0.5 * ((w - 550.0) / 10.0) ** 2)
        return w, v

    def test_trim_zeros(self):
        from eradiate_tpu.srf_tools import trim

        w = np.arange(10.0)
        v = np.array([0, 0, 0, 0.5, 1.0, 0.5, 0, 0, 0, 0])
        w2, v2 = trim(w, v)
        # keeps one zero on each side
        np.testing.assert_allclose(v2, [0, 0.5, 1.0, 0.5, 0])
        np.testing.assert_allclose(w2, [2, 3, 4, 5, 6])

    def test_threshold_filter(self):
        from eradiate_tpu.srf_tools import threshold_filter

        w, v = self._gauss()
        w2, v2 = threshold_filter(w, v, value=0.5)
        assert np.all(v2 > 0.5)
        assert w2.min() >= 550.0 - 12.0 and w2.max() <= 550.0 + 12.0
        with pytest.raises(ValueError):
            threshold_filter(w, v, value=1.5)

    def test_threshold_filter_disconnection_warns(self):
        import warnings as _w

        from eradiate_tpu.srf_tools import threshold_filter

        w = np.arange(7.0)
        v = np.array([0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0])
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            threshold_filter(w, v, value=0.5)
        assert any("disconnect" in str(r.message) for r in rec)

    @pytest.mark.parametrize("method", ["walk", "symmetry"])
    def test_integral_filter(self, method):
        from eradiate_tpu.srf_tools import integral_filter

        w, v = self._gauss()
        w2, v2 = integral_filter(w, v, percentage=95.0, method=method)
        # kept window integral ~95% of total
        total = np.trapezoid(v, w)
        kept = np.trapezoid(v2, w2)
        assert kept / total > 0.9
        assert w2.size < w.size
        with pytest.raises(ValueError):
            integral_filter(w, v, percentage=0.0)

    def test_symmetry_bounds_symmetric(self):
        from eradiate_tpu.srf_tools import integral_filter, mean_wavelength

        w, v = self._gauss()
        w2, v2 = integral_filter(w, v, percentage=90.0, method="symmetry")
        m = mean_wavelength(w, v)
        assert abs((m - w2.min()) - (w2.max() - m)) < 2.5  # grid-step tol

    def test_stats(self):
        from eradiate_tpu.srf_tools import (
            filtering_summary,
            mean_wavelength,
            summarize,
            wavelength_bandwidth,
            wavelength_range_width,
        )

        w, v = self._gauss()
        assert wavelength_range_width(w) == pytest.approx(100.0)
        assert mean_wavelength(w, v) == pytest.approx(550.0, abs=0.1)
        assert wavelength_bandwidth(w, v) == pytest.approx(
            10.0 * np.sqrt(2 * np.pi), rel=1e-3
        )
        fs = filtering_summary(w, v, w[10:-10], v[10:-10])
        assert fs["n_wavelength"]["difference"] == -20
        txt = summarize(w, v, w[10:-10], v[10:-10])
        assert "mean_wavelength" in txt

    def test_filter_srf_pipeline_and_save(self, tmp_path):
        from eradiate_tpu.srf_tools import filter_srf, save

        w = np.concatenate([[480.0, 490.0], self._gauss()[0], [610.0, 620.0]])
        v = np.concatenate([[0.0, 0.0], self._gauss()[1], [0.0, 0.0]])
        w2, v2 = filter_srf(
            w, v, trim_prior=True, percentage=99.0, threshold=1e-3, pad=True
        )
        # padded edges are zero, interior survives
        assert v2[0] == 0.0 and v2[-1] == 0.0
        assert v2.max() == pytest.approx(1.0)
        path = tmp_path / "test_srf.npz"
        save(w2, v2, path, attrs={"id": "test"})
        d = np.load(path, allow_pickle=True)
        np.testing.assert_allclose(d["w"], w2)
        assert "attr__history" in d.files

    def test_make_gaussian_alias(self):
        from eradiate_tpu.srf_tools import make_gaussian

        srf = make_gaussian(550.0, 10.0)
        assert srf is not None


class TestAssetManager:
    """Offline asset manager (reference _asset_manager.py:61 lifecycle
    minus the network fetch)."""

    def _patch_dir(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ERADIATE_TPU_DATA_PATH", str(tmp_path / "store"))

    def test_install_directory_and_resolve(self, tmp_path, monkeypatch):
        self._patch_dir(tmp_path, monkeypatch)
        from eradiate_tpu.data import resolve_data
        from eradiate_tpu.data.asset_manager import (
            install,
            list_installed,
            remove,
        )

        src = tmp_path / "absorption_mono" 
        (src / "mydb").mkdir(parents=True)
        np.save(src / "mydb" / "dummy.npy", np.arange(3))
        dest = install(src, name="absorption_mono")
        assert (dest / "mydb" / "dummy.npy").exists()
        assert resolve_data("absorption_mono/mydb") is not None
        assert "absorption_mono" in list_installed()
        assert remove("absorption_mono")
        assert resolve_data("absorption_mono/mydb") is None

    def test_install_zip_with_checksum(self, tmp_path, monkeypatch):
        import hashlib
        import zipfile

        self._patch_dir(tmp_path, monkeypatch)
        from eradiate_tpu.data.asset_manager import install

        payload = tmp_path / "payload"
        payload.mkdir()
        (payload / "a.txt").write_text("hello")
        archive = tmp_path / "asset.zip"
        with zipfile.ZipFile(archive, "w") as zf:
            zf.write(payload / "a.txt", "a.txt")
        digest = hashlib.sha256(archive.read_bytes()).hexdigest()
        dest = install(archive, sha256=digest)
        assert (dest / "a.txt").read_text() == "hello"
        with pytest.raises(ValueError):
            install(archive, name="again", sha256="0" * 64)

    def test_cli_roundtrip(self, tmp_path, monkeypatch, capsys):
        self._patch_dir(tmp_path, monkeypatch)
        from eradiate_tpu.cli import main

        src = tmp_path / "solar"
        src.mkdir()
        np.savez(src / "mysun.npz", w=np.array([550.0]), ssi=np.array([1.9]))
        assert main(["data", "install", str(src), "--name", "solar"]) == 0
        assert main(["data", "installed"]) == 0
        out = capsys.readouterr().out
        assert "solar" in out
        assert main(["data", "remove", "solar"]) == 0
        assert main(["data", "remove", "solar"]) == 1
