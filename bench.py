"""Benchmark: path samples/s/chip on BASELINE config 1.

Scene (BASELINE.md config 1): monochromatic 550 nm Rayleigh-only AFGL
atmosphere, Lambertian surface, TOA BRF with an hplane mdistant measure.

Prints ONE JSON line:
    {"metric": "path_samples_per_s_per_chip", "value": N, "unit": "samples/s",
     "vs_baseline": R}

``vs_baseline`` is measured against the BASELINE target of >= 20x a
CPU-reference samples/s/chip: a CPU-backend run of the same engine in a
subprocess provides the CPU reference; vs_baseline = device_rate /
(20 * cpu_rate), so 1.0 == meets the target.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_VZA = 76
# large enough that device execution dominates the per-render fixed costs
# (~45 ms measured under the remote tunnel: dispatch + host fetch); the
# regenerative engine multiplexes the whole budget over a fixed lane pool
SPP = 262144
N_LAYERS = 1200  # 100 m grid over 120 km (reference default)


def build_inputs():
    import jax
    import jax.numpy as jnp

    import eradiate_tpu as ert
    from eradiate_tpu.experiments import AtmosphereExperiment

    ert.set_mode("mono_single")
    exp = AtmosphereExperiment(
        illumination={"type": "directional", "zenith": 30.0, "azimuth": 0.0},
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": np.linspace(-75, 75, N_VZA),
            "azimuth": 0.0,
            "spp": SPP,
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere={"type": "molecular"},  # Rayleigh-only AFGL
    )
    measure = exp.measures[0]
    ctx = exp.spectral_context(measure)
    scene, sensor, config = exp.compile_scene(measure, ctx)
    return scene, sensor, config


def measure_rate(reps=3):
    from eradiate_tpu.ops.tracer import render

    scene, sensor, config = build_inputs()
    n_pix = sensor.directions.shape[0]
    S = scene.medium.tau_levels.shape[0]

    # warmup/compile at the benchmarked shape; sync via a full host fetch —
    # under the remote-device tunnel, block_until_ready returns at enqueue
    # time and would measure dispatch latency instead of execution
    out = render(scene, sensor, config, spp=SPP, seed=0)
    np.asarray(out["radiance"])

    t0 = time.perf_counter()
    for i in range(reps):
        out = render(scene, sensor, config, spp=SPP, seed=i)
        np.asarray(out["radiance"])
    dt = (time.perf_counter() - t0) / reps
    samples = S * n_pix * SPP
    return samples / dt


def cpu_reference_rate():
    """CPU-backend samples/s of the same engine (reference proxy), in a
    subprocess so the platform choice is clean."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench.SPP = 256\n"
        "print('CPURATE', bench.measure_rate(reps=1))\n"
    ) % os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPURATE"):
                return float(line.split()[1])
    except Exception as e:
        print(f"cpu reference failed: {e}", file=sys.stderr)
    return None


def main():
    rate = measure_rate()
    cpu_rate = cpu_reference_rate()
    if cpu_rate:
        vs = rate / (20.0 * cpu_rate)
    else:
        vs = rate / 1e8  # fallback normalization: 1.0 == 100 M samples/s
    print(
        json.dumps(
            {
                "metric": "path_samples_per_s_per_chip",
                "value": round(rate, 1),
                "unit": "samples/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
