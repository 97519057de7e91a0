"""Scaling-efficiency harness: samples/s at 1 device vs N devices.

BASELINE demands >=90% scaling efficiency to 2 hosts. The reference has
nothing to scale (serial Python loops around a single-host C++ kernel,
``src/eradiate/kernel/_render.py:433-468``); this harness measures the TPU
build's sample-axis scaling on whatever devices exist:

- on a TPU pod slice: real chips over ICI (run under
  ``eradiate_tpu.parallel.initialize()`` for multi-host);
- on CPU: N virtual devices (mechanism check, not a perf claim — virtual
  CPU devices share the same cores, so efficiency there measures collective
  overhead only at fixed total compute).

Usage::

    python benchmarks/scaling.py [--devices 8] [--spp 262144] [--pixels 64]

Prints one JSON line per device count:
    {"n_devices": N, "samples_per_s": R, "efficiency": R / (N * R1)}
and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_scene(S, n_layers, n_pix):
    import jax.numpy as jnp
    import numpy as np

    from eradiate_tpu.core.frame import angles_to_direction
    from eradiate_tpu.ops.medium import cumulative_tau
    from eradiate_tpu.ops.scene_state import (
        IlluminationArrays,
        MediumArrays,
        SceneArrays,
        SceneConfig,
        SensorArrays,
        SurfaceArrays,
    )

    z_levels = jnp.linspace(0.0, 100.0, n_layers + 1)
    # Rayleigh-like exponential profile
    sigma = 0.012 * np.exp(-np.linspace(0, 100, n_layers) / 8.5)
    sigma_t = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (S, n_layers))
    med = MediumArrays(
        z_levels=z_levels,
        tau_levels=cumulative_tau(sigma_t, z_levels),
        albedo=jnp.full((S, n_layers), 0.99),
        phase_weights=jnp.ones((S, 1, n_layers)),
        phase_params=({"depol": jnp.zeros((S, n_layers))},),
    )
    surf = SurfaceArrays(params={"reflectance": jnp.full(S, 0.5)})
    d_sun = -angles_to_direction([np.deg2rad(30.0), 0.0])[0]
    illum = IlluminationArrays(
        direction=jnp.asarray(d_sun),
        irradiance=jnp.ones(S),
        cos_cutoff=1.0,
        sky_radiance=jnp.zeros(S),
    )
    scene = SceneArrays(medium=med, surface=surf, illumination=illum)
    vzas = np.linspace(-75, 75, n_pix)
    dirs = angles_to_direction(
        np.stack([np.deg2rad(vzas), np.zeros(n_pix)], axis=-1)
    )
    sensor = SensorArrays(
        directions=jnp.asarray(dirs), target=jnp.zeros(3), ray_offset=jnp.nan
    )
    return scene, sensor, SceneConfig()


def measure(scene, sensor, config, spp, mesh, repeats=3):
    """Best-of-N samples/s for one mesh (None = single-device render)."""
    import jax
    import numpy as np

    from eradiate_tpu.ops.tracer import render
    from eradiate_tpu.parallel import render_sharded

    def once():
        if mesh is None:
            out = render(scene, sensor, config, spp=spp, seed=0)
        else:
            out = render_sharded(
                scene, sensor, config, spp=spp, seed=0, mesh=mesh
            )
        jax.block_until_ready(out["radiance"])
        return out

    once()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = once()
        best = min(best, time.perf_counter() - t0)
    n_pix = np.asarray(sensor.directions).shape[0]
    S = np.asarray(scene.medium.tau_levels).shape[0]
    return S * n_pix * out["spp"] / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="max devices (default: all; CPU default 8 virtual)")
    ap.add_argument("--spp", type=int, default=262144)
    ap.add_argument("--pixels", type=int, default=64)
    ap.add_argument("--layers", type=int, default=128)
    ap.add_argument("--spectral", type=int, default=1)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force N virtual CPU devices (mechanism check; the ambient "
        "environment may pin JAX to a tunneled TPU via sitecustomize, so "
        "env vars alone do not switch the backend)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices or 8)
        except RuntimeError:
            pass
    elif args.devices and jax.default_backend() == "cpu":
        try:
            jax.config.update("jax_num_cpu_devices", args.devices)
        except RuntimeError:
            pass

    from eradiate_tpu.parallel import initialize, make_render_mesh

    initialize()
    devices = jax.devices()
    n_max = min(args.devices or len(devices), len(devices))

    scene, sensor, config = build_scene(args.spectral, args.layers, args.pixels)

    rows = []
    r1 = None
    n = 1
    while n <= n_max:
        mesh = (
            None if n == 1
            else make_render_mesh(1, n, devices=devices[:n])
        )
        rate = measure(scene, sensor, config, args.spp, mesh)
        if r1 is None:
            r1 = rate
        row = {
            "n_devices": n,
            "samples_per_s": rate,
            "efficiency": rate / (n * r1),
        }
        rows.append(row)
        print(json.dumps(row))
        n *= 2

    print(json.dumps({
        "metric": "scaling_efficiency",
        "backend": jax.default_backend(),
        "n_hosts": jax.process_count(),
        "max_devices": rows[-1]["n_devices"],
        "efficiency_at_max": rows[-1]["efficiency"],
    }))


if __name__ == "__main__":
    main()
