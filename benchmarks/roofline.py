"""Roofline microbenchmarks of the four hot kernels (VERDICT r1 #5).

Measures wall time of each kernel at its production shape, computes the
analytic FLOP / HBM-byte counts, and prints achieved-vs-peak fractions +
the bound resource via :func:`eradiate_tpu.profiling.kernel_roofline`.

Kernels:
1. collision fetch — one-hot hi/lo-bf16 MXU table fetch
   (``ops/medium.collision_fetch``), B=16384 lanes x L=1200 layers;
2. shell flight — exact spherical free flight, triangular-matmul prefix
   (``ops/spherical.shell_flight``), B=16384 x L=100 shells;
3. leaf sweep — Pallas tiled disk intersection
   (``ops/canopy.leaf_nearest``), B=16384 x N=65536 leaves;
4. Mueller chain — per-lane 4x4 Stokes rotations+phase products
   (``ops/mueller``), B=16384.

Usage: python benchmarks/roofline.py [--cpu] — peaks are v5e numbers, so
fractions are only meaningful on TPU; the CPU path checks the plumbing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B = 16384


def _timeit(fn, reps=5):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps


def bench_collision_fetch():
    import jax
    import jax.numpy as jnp

    from eradiate_tpu.ops.medium import collision_fetch, cumulative_tau

    L = 1200
    z_levels = jnp.linspace(0.0, 120.0, L + 1)
    sigma = jnp.asarray(0.012 * np.exp(-np.linspace(0, 120, L) / 8.5))[None]
    tau_levels = cumulative_tau(sigma, z_levels)[0]
    tables = [jnp.asarray(np.random.rand(L), jnp.float32) for _ in range(4)]
    tau_q = jnp.asarray(
        np.random.rand(B) * float(tau_levels[-1]), jnp.float32
    )

    f = jax.jit(lambda tq: collision_fetch(tq, z_levels, tau_levels, tables))
    wall = _timeit(lambda: f(tau_q))
    # one-hot [B, L] built + 2 bf16 matmuls (hi/lo) against [L, T+1]-ish
    n_fetch = len(tables) + 1
    flops = 2 * B * L * n_fetch * 2
    bytes_moved = B * L * 2 + B * L * 4  # bf16 one-hot out + compare reads
    return "collision_fetch", wall, flops, bytes_moved, "mxu_bf16"


def bench_shell_flight():
    import jax
    import jax.numpy as jnp

    from eradiate_tpu.ops.spherical import shell_flight

    L = 100
    R = 6378.1
    radii = jnp.asarray(R + np.linspace(0, 100, L + 1), jnp.float32)
    sigma = jnp.asarray(
        0.012 * np.exp(-np.linspace(0, 100, L) / 8.5), jnp.float32
    )
    rng = np.random.default_rng(0)
    r0 = R + rng.uniform(0, 100, B)
    p = np.zeros((B, 3), np.float32)
    p[:, 2] = r0
    d = rng.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = jnp.asarray(p)
    d = jnp.asarray(d, jnp.float32)
    t_max = jnp.full(B, 200.0, jnp.float32)
    tau_s = jnp.asarray(-np.log(rng.uniform(1e-6, 1, B)), jnp.float32)

    f = jax.jit(lambda pp: shell_flight(pp, d, t_max, radii, sigma, tau_s))
    wall = _timeit(lambda: f(p))
    # triangular prefix matmul [B, L] x [L, L+1] (hi/lo) + ~10 [B, L] passes
    flops = 2 * B * L * (L + 1) * 2 + 10 * B * L
    bytes_moved = B * L * 2 * 2 + B * (L + 1) * 4  # bf16 c hi/lo + f32 G out
    return "shell_flight", wall, flops, bytes_moved, "mxu_bf16"


def bench_leaf_sweep():
    import jax
    import jax.numpy as jnp

    from eradiate_tpu.ops.canopy import (
        LeafCloudArrays,
        leaf_nearest,
        leaf_spheres,
        morton_order,
    )

    N = 65536
    rng = np.random.default_rng(1)
    centers = rng.uniform(-0.05, 0.05, (N, 3)).astype(np.float32)
    centers[:, 2] += 0.06
    order = morton_order(centers)
    normals = rng.normal(size=(N, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    leaves = LeafCloudArrays(
        centers=jnp.asarray(centers[order]),
        normals=jnp.asarray(normals[order]),
        radii=jnp.full(N, 1e-4, jnp.float32),
    )
    p = rng.uniform(-0.05, 0.05, (B, 3)).astype(np.float32)
    p[:, 2] = 0.2
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = jnp.asarray(p)
    d = jnp.asarray(d)
    t_max = jnp.full(B, 1.0, jnp.float32)
    accel = jax.jit(lambda: leaf_spheres(p, leaves))()

    f = jax.jit(lambda pp: leaf_nearest(pp, d, t_max, leaves, accel))
    wall = _timeit(lambda: f(p))
    # ~20 FLOP per (ray, leaf) disk test, all pairs (upper bound: culling
    # only reduces achieved work, so this reports an effective rate)
    flops = 20 * B * N
    bytes_moved = B * 7 * 4 + N * 7 * 4  # SoA rays + leaves read once
    return "leaf_sweep", wall, flops, bytes_moved, "vpu_f32"


def bench_mueller_chain():
    import jax
    import jax.numpy as jnp

    from eradiate_tpu.ops import mueller

    rng = np.random.default_rng(2)
    cos_t = jnp.asarray(rng.uniform(-1, 1, B), jnp.float32)
    phi1 = jnp.asarray(rng.uniform(0, 2 * np.pi, B), jnp.float32)
    stokes = jnp.asarray(rng.uniform(0, 1, (B, 4)), jnp.float32)

    def chain(c, f1, s):
        m = jax.vmap(mueller.rayleigh_mueller)(c, jnp.zeros(B))
        r1 = jax.vmap(mueller.rotator)(f1)
        r2 = jax.vmap(mueller.rotator)(-f1)
        out = jnp.einsum("bij,bjk,bkl,bl->bi", r2, m, r1, s)
        return out

    f = jax.jit(chain)
    wall = _timeit(lambda: f(cos_t, phi1, stokes))
    # 3 [4x4]x[4x4] matmuls + 1 matvec per lane + matrix builds
    flops = B * (3 * 128 + 32 + 60)
    bytes_moved = B * (4 + 4 + 1 + 1) * 4
    return "mueller_chain", wall, flops, bytes_moved, "vpu_f32"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from eradiate_tpu.profiling import kernel_roofline

    rows = []
    for bench in (
        bench_collision_fetch,
        bench_shell_flight,
        bench_leaf_sweep,
        bench_mueller_chain,
    ):
        label, wall, flops, bytes_moved, unit = bench()
        row = kernel_roofline(label, wall, flops, bytes_moved, unit=unit)
        row["backend"] = jax.default_backend()
        rows.append(row)
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in row.items()}))


if __name__ == "__main__":
    main()
