"""Per-call cost of the shell kernels vs ray-block size (post-merge W)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eradiate_tpu.ops.pallas.shell_flight import (
    shell_flight_pallas,
    slant_tau_pallas,
)

R = 6378.1
ITER = 200


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


def run(kind, B, L, bb):
    x0, b2, tmax, tau_s, radii, sigma = make_inputs(B, L)

    if kind == "flight":
        def loop(x0, b2, tmax, tau_s, radii, sigma):
            def body(i, carry):
                x0c, acc = carry
                col, t, lay = shell_flight_pallas(
                    x0c, b2, tmax, tau_s, radii * radii, sigma,
                    exit_clipped=True, block_b=bb,
                )
                return (x0c + 1e-6 * t, acc + jnp.sum(t))

            return jax.lax.fori_loop(0, ITER, body, (x0, jnp.float32(0.0)))[1]
    else:
        def loop(x0, b2, tmax, tau_s, radii, sigma):
            def body(i, carry):
                x0c, acc = carry
                tau = slant_tau_pallas(x0c, b2, radii, sigma, block_b=bb)
                return (x0c + 1e-9 * tau, acc + jnp.sum(tau))

            return jax.lax.fori_loop(0, ITER, body, (x0, jnp.float32(0.0)))[1]

    f = jax.jit(loop)
    out = f(x0, b2, tmax, tau_s, radii, sigma)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = f(x0, b2, tmax, tau_s, radii, sigma)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(
        f"{kind:6s} B={B:6d} L={L:5d} bb={bb:6d}: {best/ITER*1e3:7.4f} ms/call"
        f"  acc={float(out):.4g}",
        flush=True,
    )


def main():
    run("flight", 16384, 232, 1024)
    run("flight", 16384, 232, 4096)
    run("flight", 16384, 232, 16384)
    run("slant", 16384, 232, 4096)


if __name__ == "__main__":
    main()
