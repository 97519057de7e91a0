"""In-loop per-call cost of the shell Pallas kernels vs (B, W).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_shell_kernels.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eradiate_tpu.ops.pallas.shell_flight import (
    shell_flight_pallas,
    slant_tau_pallas,
)

R = 6378.1
ITER = 50


def bench(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def make_inputs(B, L):
    rng = np.random.default_rng(0)
    z = np.linspace(0, 120, L + 1)
    radii = jnp.asarray(R + z, jnp.float32)
    sigma = jnp.asarray(0.0113 * np.exp(-z[:-1] / 8.0), jnp.float32)
    r0 = R + rng.uniform(0, 100, B)
    mu = rng.uniform(-1, 1, B)
    x0 = jnp.asarray(r0 * mu, jnp.float32)
    b2 = jnp.asarray(r0 * r0 * (1 - mu * mu), jnp.float32)
    tmax = jnp.asarray(rng.uniform(10, 300, B), jnp.float32)
    tau_s = jnp.asarray(rng.exponential(1.0, B), jnp.float32)
    return x0, b2, tmax, tau_s, radii, sigma


def flight_loop(x0, b2, tmax, tau_s, radii, sigma):
    def body(i, carry):
        x0c, acc = carry
        col, t, lay = shell_flight_pallas(
            x0c, b2, tmax, tau_s, radii * radii, sigma, exit_clipped=True
        )
        return (x0c + 1e-6 * t, acc + jnp.sum(t))

    return jax.lax.fori_loop(0, ITER, body, (x0, jnp.float32(0.0)))[1]


def slant_loop(x0, b2, tmax, tau_s, radii, sigma):
    def body(i, carry):
        x0c, acc = carry
        tau = slant_tau_pallas(x0c, b2, radii, sigma)
        return (x0c + 1e-6 * tau, acc + jnp.sum(tau))

    return jax.lax.fori_loop(0, ITER, body, (x0, jnp.float32(0.0)))[1]


def main():
    for B in (16384, 65536):
        for L in (232, 600, 1200):
            args = make_inputs(B, L)
            tf = bench(flight_loop, *args) / ITER
            ts = bench(slant_loop, *args) / ITER
            print(
                f"B={B:6d} L={L:5d}: flight {tf*1e3:7.3f} ms/call  "
                f"slant {ts*1e3:7.3f} ms/call",
                flush=True,
            )


if __name__ == "__main__":
    main()
