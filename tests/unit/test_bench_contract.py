"""bench.py driver-capture contract (VERDICT r2 task #1).

The driver parses the LAST stdout line of `python bench.py` under an
arbitrary timeout, so the contract is: a valid cumulative JSON summary
line exists before any device work, after every config, and on
SIGTERM/atexit.  These tests pin that contract without touching a
device (the config builders are monkeypatched).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _parse_lines(out):
    lines = [ln for ln in out.splitlines() if ln.strip().startswith("{")]
    return [json.loads(ln) for ln in lines]


def _run_bench_stub(body, sig=None, timeout=60):
    """Run bench.main() in a child with _experiment_rate stubbed."""
    code = f"""
import sys, types, time
sys.path.insert(0, {REPO!r})
sys.argv = ["bench.py"]
import bench
{body}
bench.main()
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO,
    )
    if sig is not None:
        # wait for the startup summary line before signaling (interpreter
        # start + imports can take seconds on a busy machine)
        first = proc.stdout.readline()
        assert first.strip().startswith("{"), first
        proc.send_signal(sig)
        out_rest, err = proc.communicate(timeout=timeout)
        return proc.returncode, first + out_rest, err
    out, err = proc.communicate(timeout=timeout)
    return proc.returncode, out, err


class TestSummaryContract:
    def test_incremental_lines_and_final_completeness(self):
        rc, out, err = _run_bench_stub(
            "bench._experiment_rate = lambda *a, **k: 123.0\n"
            "bench._experiment_rate_noise = "
            "lambda *a, **k: {'samples_per_s': 99.0, 'wall_s': 1.0}\n"
            "bench.cpu_reference_rates = lambda timeout: "
            "{k: 10.0 for k, _, _, _ in bench.CPU_REF_CONFIGS}\n"
        )
        assert rc == 0, err[-1000:]
        parsed = _parse_lines(out)
        # startup line + one per config + final
        assert len(parsed) >= len(bench_configs()) + 2
        first, last = parsed[0], parsed[-1]
        assert first["note"] == "startup"
        assert all(v is None for v in first["configs"].values())
        assert last["note"] == "complete"
        assert all(v == 123.0 for v in last["configs"].values())
        # fixed-noise mode results ride along for all five configs
        assert set(last["noise_target"]) == set(last["configs"])
        assert last["noise_target"]["c1_rayleigh_lambert"][
            "samples_per_s"
        ] == 99.0
        # per-config cpu references and engine-relative ratios
        assert set(last["cpu_reference"]) == set(last["configs"])
        assert last["cpu_reference_c1"] == 10.0
        assert set(last["vs_baseline_per_config"]) == set(last["configs"])
        # every intermediate line is itself a valid full summary
        for p in parsed:
            assert set(p) >= {"metric", "value", "unit", "vs_baseline",
                              "configs"}

    def test_failed_config_does_not_abort_sweep(self):
        rc, out, err = _run_bench_stub(
            "calls = []\n"
            "def rate(builder, spp, reps=3, mode=None):\n"
            "    calls.append(1)\n"
            "    if len(calls) == 1:\n"
            "        raise RuntimeError('boom')\n"
            "    return 55.0\n"
            "bench._experiment_rate = rate\n"
            "bench._experiment_rate_noise = lambda *a, **k: {}\n"
            "bench.cpu_reference_rates = lambda timeout: {}\n"
        )
        assert rc == 0, err[-1000:]
        last = _parse_lines(out)[-1]
        vals = list(last["configs"].values())
        assert vals[0] is None
        assert all(v == 55.0 for v in vals[1:])

    def test_sigterm_flushes_valid_last_line(self):
        rc, out, err = _run_bench_stub(
            "def rate(builder, spp, reps=3, mode=None):\n"
            "    import time\n"
            "    time.sleep(60)\n"
            "bench._experiment_rate = rate\n",
            sig=signal.SIGTERM,
            timeout=30,
        )
        parsed = _parse_lines(out)
        assert parsed, out
        last = parsed[-1]
        assert last["note"] in ("flushed_on_exit", "startup")
        assert set(last) >= {"metric", "value", "configs"}

    def test_budget_guard_stops_launching(self):
        rc, out, err = _run_bench_stub(
            "bench.SWEEP_BUDGET_S = -1.0\n"
            "bench._experiment_rate = lambda *a, **k: 1.0\n"
        )
        assert rc == 0, err[-1000:]
        last = _parse_lines(out)[-1]
        assert all(v is None for v in last["configs"].values())


def bench_configs():
    sys.path.insert(0, REPO)
    import bench

    return bench.CONFIGS
