"""Native (C++) runtime component tests; every function must also pass via
the numpy fallback path."""

import numpy as np
import pytest

from eradiate_tpu import native


@pytest.fixture(params=["native", "fallback"])
def backend(request, monkeypatch):
    if request.param == "native":
        if not native.available():
            pytest.skip("native library unavailable")
    else:
        monkeypatch.setattr(native, "_load", lambda: None)
    return request.param


class TestVolIO:
    def test_roundtrip(self, tmp_path, backend):
        data = np.random.default_rng(0).random((4, 3, 2, 1)).astype(np.float32)
        path = tmp_path / "grid.vol"
        native.vol_write(path, data, bbox=(0, 0, 0, 1, 1, 1))
        out, bbox = native.vol_read(path)
        np.testing.assert_array_equal(out, data)
        np.testing.assert_allclose(bbox, [0, 0, 0, 1, 1, 1])

    def test_3d_input(self, tmp_path, backend):
        data = np.ones((5, 5, 5), dtype=np.float32)
        path = tmp_path / "g.vol"
        native.vol_write(path, data)
        out, _ = native.vol_read(path)
        assert out.shape == (5, 5, 5, 1)

    def test_cross_backend_compat(self, tmp_path):
        """Files written natively read identically through the fallback."""
        if not native.available():
            pytest.skip("native library unavailable")
        data = np.random.default_rng(1).random((3, 4, 5, 2)).astype(np.float32)
        path = tmp_path / "x.vol"
        native.vol_write(path, data)
        lib_backup = native._lib
        try:
            native._lib = None
            native._load_failed = True
            out, _ = native.vol_read(path)
        finally:
            native._lib = lib_backup
            native._load_failed = False
        np.testing.assert_array_equal(out, data)


class TestAbsorptionInterp:
    def test_matches_reference(self, backend):
        rng = np.random.default_rng(0)
        W, P, T, S, L = 16, 8, 6, 32, 10
        table = rng.random((W, P, T)).astype(np.float32)
        iw = rng.integers(0, W - 1, S).astype(np.int32)
        fw = rng.random(S).astype(np.float32)
        ip = rng.integers(0, P - 1, L).astype(np.int32)
        fp = rng.random(L).astype(np.float32)
        it = rng.integers(0, T - 1, L).astype(np.int32)
        ft = rng.random(L).astype(np.float32)
        out = native.absorption_interp(table, iw, fw, ip, fp, it, ft)
        assert out.shape == (S, L)
        # dense reference
        ref = np.empty((S, L))
        for s in range(S):
            for l in range(L):
                def bil(w):
                    t = table[w]
                    return (
                        t[ip[l], it[l]] * (1 - fp[l]) * (1 - ft[l])
                        + t[ip[l], it[l] + 1] * (1 - fp[l]) * ft[l]
                        + t[ip[l] + 1, it[l]] * fp[l] * (1 - ft[l])
                        + t[ip[l] + 1, it[l] + 1] * fp[l] * ft[l]
                    )
                ref[s, l] = bil(iw[s]) * (1 - fw[s]) + bil(
                    min(iw[s] + 1, W - 1)
                ) * fw[s]
        np.testing.assert_allclose(out, ref, rtol=1e-5)


class TestLeafGen:
    def test_generates(self, backend):
        pos, nrm = native.generate_leaf_cloud(1000, 0.01, 0.001, seed=3)
        assert pos.shape == (1000, 3) and nrm.shape == (1000, 3)
        assert np.all(np.abs(pos[:, 0]) <= 0.005 + 1e-6)
        assert np.all((pos[:, 2] >= 0) & (pos[:, 2] <= 0.001 + 1e-6))
        np.testing.assert_allclose(
            np.linalg.norm(nrm, axis=-1), 1.0, rtol=1e-5
        )
        assert np.all(nrm[:, 2] >= 0)
