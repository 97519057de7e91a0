"""Multi-host failure drill (VERDICT r3 task #10).

Two-process ``jax.distributed`` render over a 4-chunk spectral loop with
per-host checkpointing; one process is SIGKILLed mid-loop, the survivor
is reaped, and the SAME command line is relaunched against the same
checkpoint directories. The resumed run must produce a dataset equal to
the uninterrupted 2-process run (bit-identical: same mesh, same seeds,
chunks skipped on resume still consume their seeds), which in turn
matches the single-device render up to float summation order.

Procedure documented in ``docs/user_guide/distribution.md``.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..", "..")

_WORKER = textwrap.dedent(
    """
    import os, signal, sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    ckpt_base = sys.argv[4]
    kill_after = int(sys.argv[5])

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    sys.path.insert(0, os.getcwd())
    import numpy as np

    import eradiate_tpu
    import eradiate_tpu.checkpoint as ckpt_mod
    from eradiate_tpu.core.rng import SeedState
    from eradiate_tpu.experiments import AtmosphereExperiment
    from eradiate_tpu.parallel import make_render_mesh

    eradiate_tpu.set_mode("mono_single")

    # failure injection: SIGKILL this process right after it persists its
    # Nth spectral chunk (only process 1 dies; process 0 is coordinator)
    n_saves = {"n": 0}
    orig_save = ckpt_mod.RenderCheckpoint.save

    def save_and_maybe_die(self, *a, **k):
        orig_save(self, *a, **k)
        n_saves["n"] += 1
        if kill_after >= 0 and pid == 1 and n_saves["n"] >= kill_after:
            os.kill(os.getpid(), signal.SIGKILL)

    ckpt_mod.RenderCheckpoint.save = save_and_maybe_die

    exp = AtmosphereExperiment(
        illumination={
            "type": "directional", "zenith": 30.0, "irradiance": 1.0,
        },
        measures={
            "type": "mdistant",
            "construct": "from_angles",
            "angles": [[0.0, 0.0], [30.0, 0.0]],
            "srf": {
                "type": "delta",
                # 8 wavelengths in chunks of 2: 4 spectral chunks, each
                # an S=2 batch divisible by the mesh spectral axis
                "wavelengths": [
                    440.0, 490.0, 550.0, 600.0, 660.0, 740.0, 870.0, 1020.0,
                ],
            },
            "spp": 32,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere={"type": "homogeneous", "sigma_s": 0.01, "top": 10.0},
        geometry={"type": "plane_parallel", "toa_altitude": 10.0},
        spectral_chunk_size=2,
    )
    mesh = make_render_mesh(2, 4)
    # per-host checkpoint directory (hosts may die at different chunks;
    # Experiment.process resumes from the minimum across hosts)
    ckpt_dir = os.path.join(ckpt_base, f"host{pid}")
    exp.process(
        spp=32,
        seed_state=SeedState(123),
        checkpoint_dir=ckpt_dir,
        mesh=mesh,
    )
    if pid == 0:
        raw = exp.measures[0].results["raw"]
        np.savez(out_path, radiance=np.asarray(raw["radiance"]))
    jax.distributed.shutdown()
    print("WORKER_OK", pid)
    """
)


def _launch(port, out_path, ckpt_base, kill_after, timeout):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "ERADIATE_TPU_MESH": "none"}
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-c", _WORKER, str(i), str(port),
                str(out_path), str(ckpt_base), str(kill_after),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()  # exact PID of the child we started
            out, _ = p.communicate()
        outs.append(out)
    return outs


@pytest.mark.slow
def test_kill_and_resume_matches_uninterrupted(tmp_path):
    # uninterrupted 2-host reference
    ref_path = tmp_path / "ref.npz"
    outs = _launch(12411, ref_path, tmp_path / "ckpt_ref", -1, timeout=420)
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out, f"worker {i} failed:\n{out[-2000:]}"
    assert ref_path.exists()

    # drill: process 1 dies after persisting 2 of 4 chunks; process 0 is
    # reaped by the harness when the collective stalls
    drill_path = tmp_path / "drill.npz"
    ckpt = tmp_path / "ckpt_drill"
    outs = _launch(12412, drill_path, ckpt, 2, timeout=180)
    assert not drill_path.exists()  # the run really was interrupted
    assert (ckpt / "host0" / "m.npz").exists()
    assert (ckpt / "host1" / "m.npz").exists()

    # resume: same command line, same checkpoint dirs, no kill
    outs = _launch(12413, drill_path, ckpt, -1, timeout=420)
    for i, out in enumerate(outs):
        assert f"WORKER_OK {i}" in out, f"worker {i} failed:\n{out[-2000:]}"
    assert drill_path.exists()

    ref = np.load(ref_path)["radiance"]
    got = np.load(drill_path)["radiance"]
    # same mesh + same seeds; resumed chunks skip but consume seeds, so
    # the dataset is bit-identical to the uninterrupted run
    np.testing.assert_array_equal(got, ref)
