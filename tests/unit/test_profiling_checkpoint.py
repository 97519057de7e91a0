"""Unit tests: profiling counters + checkpoint/resume
(SURVEY §5 aux subsystems: tracing/profiling, checkpoint/resume)."""

import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.checkpoint import RenderCheckpoint
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.profiling import RenderStats, annotate, stats


def _exp(**kwargs):
    return AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "irradiance": 1.0},
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0], [30.0, 0.0]],
            "srf": {
                "type": "delta",
                "wavelengths": [440.0, 550.0, 660.0, 870.0],
            },
            "spp": 16,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere={"type": "homogeneous", "sigma_s": 0.01, "top": 10.0},
        geometry={"type": "plane_parallel", "toa_altitude": 10.0},
        **kwargs,
    )


def test_render_stats_recorded(mode_mono):
    stats.clear()
    exp = _exp()
    eradiate_tpu.run(exp)
    assert stats.last is not None
    assert stats.last.label == "measure:m"
    # 4 wavelengths x 2 pixels x 16 spp
    assert stats.last.n_paths == 4 * 2 * 16
    assert stats.last.samples_per_s > 0
    summary = stats.summary()
    assert summary["n_renders"] >= 1
    assert summary["total_paths"] >= stats.last.n_paths


def test_render_stats_isolated():
    s = RenderStats()
    assert s.summary()["n_renders"] == 0
    s.record("x", wall_s=2.0, spectral_size=10, n_pixels=5, spp=4)
    assert s.last.n_paths == 200
    assert s.last.samples_per_s == 100.0
    s.clear()
    assert s.last is None


def test_annotate_noops_gracefully():
    with annotate("unit-test-scope"):
        pass


def test_checkpoint_roundtrip(tmp_path):
    cp = RenderCheckpoint(tmp_path)
    w = np.array([500.0, 600.0])
    raws = [
        {"radiance": np.ones((2, 3)), "m2": np.ones((2, 3)), "spp": 16},
        {"radiance": np.full((2, 3), 2.0), "m2": np.ones((2, 3)), "spp": 16},
    ]
    cp.save("m", 16, w, raws)
    loaded, n_done = cp.load("m", 16, w)
    assert n_done == 2
    np.testing.assert_allclose(loaded[1]["radiance"], 2.0)
    assert loaded[0]["spp"] == 16
    # fingerprint guards: different spp or grid -> fresh start
    assert cp.load("m", 32, w) == ([], 0)
    assert cp.load("m", 16, w * 2)[1] == 0
    cp.clear("m")
    assert cp.load("m", 16, w) == ([], 0)


def test_checkpoint_resume_bit_identical(mode_mono, tmp_path):
    """A run interrupted between spectral chunks and resumed produces the
    same radiance as an uninterrupted run with the same seed."""
    # chunked: 4 wavelengths in chunks of 1
    exp_a = _exp(spectral_chunk_size=1)
    eradiate_tpu.root_seed_state.reset(123)
    res_a = eradiate_tpu.run(exp_a)
    rad_a = np.asarray(res_a["radiance"])

    # simulate interruption: run chunk-by-chunk with checkpoints, fresh
    # experiment + seed; then "resume" with another fresh experiment
    exp_b = _exp(spectral_chunk_size=1)
    eradiate_tpu.root_seed_state.reset(123)
    cp_dir = tmp_path / "ckpt"
    eradiate_tpu.run(exp_b, checkpoint_dir=str(cp_dir))

    # resume after completion: everything comes from the checkpoint, the
    # engine is not invoked (results must still match)
    exp_c = _exp(spectral_chunk_size=1)
    eradiate_tpu.root_seed_state.reset(123)
    res_c = eradiate_tpu.run(exp_c, checkpoint_dir=str(cp_dir))
    rad_c = np.asarray(res_c["radiance"])

    np.testing.assert_allclose(rad_a, rad_c, rtol=0, atol=0)


def test_checkpoint_partial_resume(mode_mono, tmp_path):
    """Pre-populate the checkpoint with the first chunks of a run, then
    resume to completion; results match the uninterrupted run."""
    exp_ref = _exp(spectral_chunk_size=1)
    eradiate_tpu.root_seed_state.reset(7)
    rad_ref = np.asarray(eradiate_tpu.run(exp_ref)["radiance"])

    # full checkpointed run, then truncate the store to 2 of 4 chunks
    exp_full = _exp(spectral_chunk_size=1)
    eradiate_tpu.root_seed_state.reset(7)
    cp_dir = str(tmp_path / "ckpt2")
    eradiate_tpu.run(exp_full, checkpoint_dir=cp_dir)
    cp = RenderCheckpoint(cp_dir)
    w = exp_full.spectral_context(exp_full.measures[0])["w"]
    raws, n_done = cp.load("m", 16, w)
    assert n_done == 4
    cp.save("m", 16, w, raws[:2])

    exp_res = _exp(spectral_chunk_size=1)
    eradiate_tpu.root_seed_state.reset(7)
    rad_res = np.asarray(
        eradiate_tpu.run(exp_res, checkpoint_dir=cp_dir)["radiance"]
    )
    np.testing.assert_allclose(rad_ref, rad_res, rtol=0, atol=0)
