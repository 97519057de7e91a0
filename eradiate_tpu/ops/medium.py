"""Layered-medium traversal primitives (plane-parallel geometry).

The TPU-native replacement for the reference's C++ ``piecewise`` medium +
``piecewise_volpath`` integrator (SURVEY §2.1): with a 1D piecewise-constant
extinction profile, the cumulative vertical optical depth ``tau(z)`` is a
monotone piecewise-linear function of altitude, so

- transmittance along any straight ray between altitudes z1, z2 with
  direction cosine mu is ``exp(-|tau(z2) - tau(z1)| / |mu|)`` (closed form,
  deterministic — no delta tracking);
- exact free-flight sampling inverts ``tau`` via a vectorized
  ``searchsorted`` (O(log L) per path, fully data-parallel).

All functions are shape-polymorphic over a leading path-batch axis and are
jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "cumulative_tau",
    "tau_at_z",
    "z_at_tau",
    "layer_index",
    "MU_EPS",
]

#: Direction cosines are clamped away from zero: exactly-horizontal rays are
#: measure-zero and the clamp keeps the closed-form traversal finite.
MU_EPS = 1e-6


def clamp_mu(mu):
    """Clamp |mu| >= MU_EPS preserving sign (sign(0) treated as +)."""
    s = jnp.where(mu < 0.0, -1.0, 1.0)
    return s * jnp.maximum(jnp.abs(mu), MU_EPS)


def cumulative_tau(sigma_t, z_levels):
    """Cumulative vertical optical depth at levels, from the bottom.

    sigma_t: [..., L], z_levels: [L+1] -> tau_levels: [..., L+1]
    """
    dz = jnp.diff(z_levels)
    seg = sigma_t * dz
    zero = jnp.zeros(seg.shape[:-1] + (1,), seg.dtype)
    return jnp.concatenate([zero, jnp.cumsum(seg, axis=-1)], axis=-1)


def tau_at_z(z, z_levels, tau_levels):
    """Interpolate tau(z); z: [...], z_levels: [L+1], tau_levels: [L+1]."""
    i = jnp.clip(
        jnp.searchsorted(z_levels, z, side="right") - 1, 0, z_levels.shape[0] - 2
    )
    z0 = z_levels[i]
    dz = z_levels[i + 1] - z0
    frac = jnp.clip((z - z0) / jnp.maximum(dz, 1e-30), 0.0, 1.0)
    t0 = tau_levels[i]
    return t0 + frac * (tau_levels[i + 1] - t0)


def z_at_tau(tau, z_levels, tau_levels):
    """Invert the piecewise-linear tau(z); returns (z, layer_index).

    Within zero-extinction layers tau is flat and the inverse is ambiguous;
    collisions never land there (tau strictly increases only across
    sigma_t > 0 layers), so clamping into the bracketing layer is exact.
    """
    i = jnp.clip(
        jnp.searchsorted(tau_levels, tau, side="right") - 1,
        0,
        tau_levels.shape[0] - 2,
    )
    t0 = tau_levels[i]
    dt = tau_levels[i + 1] - t0
    frac = jnp.clip((tau - t0) / jnp.maximum(dt, 1e-30), 0.0, 1.0)
    z = z_levels[i] + frac * (z_levels[i + 1] - z_levels[i])
    return z, i


def layer_index(z, z_levels):
    """Index of the layer containing altitude z."""
    return jnp.clip(
        jnp.searchsorted(z_levels, z, side="right") - 1, 0, z_levels.shape[0] - 2
    )
