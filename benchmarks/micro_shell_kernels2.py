"""Careful re-measurement of in-loop shell kernel cost."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eradiate_tpu.ops.pallas.shell_flight import shell_flight_pallas

R = 6378.1


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


def main():
    for B, L, ITER in [(16384, 232, 200), (16384, 1200, 200)]:
        x0, b2, tmax, tau_s, radii, sigma = make_inputs(B, L)

        def loop(x0, b2, tmax, tau_s, radii, sigma, n=ITER):
            def body(i, carry):
                x0c, acc = carry
                col, t, lay = shell_flight_pallas(
                    x0c, b2, tmax, tau_s, radii * radii, sigma,
                    exit_clipped=True,
                )
                return (x0c + 1e-6 * t, acc + jnp.sum(t))

            return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))[1]

        f = jax.jit(loop)
        out = f(x0, b2, tmax, tau_s, radii, sigma)
        print(f"B={B} L={L} acc={float(out):.4g}", flush=True)
        for rep in range(3):
            t0 = time.perf_counter()
            out = f(x0, b2, tmax, tau_s, radii, sigma)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            print(
                f"  rep{rep}: total {dt*1e3:8.2f} ms  "
                f"{dt/ITER*1e3:7.4f} ms/call",
                flush=True,
            )


if __name__ == "__main__":
    main()
