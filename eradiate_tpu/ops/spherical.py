"""Spherical-shell geometry primitives.

TPU-native replacement for the reference's ``sphericalcoordsvolume`` medium
remap + curved-shell traversal (SURVEY §2.1; ``scenes/atmosphere/_core.py:
689-724``). The atmosphere is a set of concentric shells with
piecewise-constant extinction. Two ingredients:

- **Closed-form slant optical depth**: along a straight ray with impact
  parameter b, the path length inside the radius interval [ra, rb] is
  ``sqrt(rb^2 - b^2) - sqrt(ra^2 - b^2)``, so the slant optical depth to
  the sun is an L-term weighted sum — precomputed as a (altitude x local
  cosine) **Chapman-style table** per spectral index, contracted on the MXU
  as a [L+1*M, L] x [L, S] matmul, then bilinearly interpolated by the
  tracer at every NEE event.
- **Ray/sphere stepping** for the delta-tracking free-flight sampler
  (the ``heterogeneous`` medium analog).

All radii in km; the planet center is the coordinate origin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "ray_sphere_intersect",
    "slant_path_matrix",
    "sun_tau_table",
    "lookup_sun_tau",
]

#: Optical depth treated as total blockage (ground shadow).
TAU_BLOCKED = 1e10


def ray_sphere_intersect(p, d, radius):
    """Distances to a sphere |x| = radius along x = p + t d.

    Returns (t_near, t_far, hit): roots sorted ascending; ``hit`` False if
    no real intersection. Vectorized over leading axes of p/d.
    """
    b = jnp.sum(p * d, axis=-1)
    c = jnp.sum(p * p, axis=-1) - radius * radius
    disc = b * b - c
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return -b - sq, -b + sq, hit


def _seg(b2, ra, rb):
    """Path length between radii ra <= rb at squared impact parameter b2."""
    fa = jnp.sqrt(jnp.maximum(ra * ra - b2, 0.0))
    fb = jnp.sqrt(jnp.maximum(rb * rb - b2, 0.0))
    return jnp.maximum(fb - fa, 0.0)


def slant_path_matrix(radii, r0_grid, mu_grid, r_ground=None):
    """Geometric path-length matrix D[i, j, k]: length of the path from
    radius ``r0_grid[i]`` with local direction cosine ``mu_grid[j]``
    (toward zenith = +1) inside shell k, until exit at the top radius.

    Rays with a tangent radius below ``r_ground`` are blocked (the caller
    adds TAU_BLOCKED). Returns (D, blocked) with D [I, J, L], blocked
    [I, J] bool.
    """
    radii = jnp.asarray(radii)
    r_top = radii[-1]
    r_ground = radii[0] if r_ground is None else r_ground
    r0 = jnp.asarray(r0_grid)[:, None]  # [I, 1]
    mu = jnp.asarray(mu_grid)[None, :]  # [1, J]

    sin2 = jnp.clip(1.0 - mu * mu, 0.0, 1.0)
    b2 = (r0 * r0) * sin2  # [I, J]
    b = jnp.sqrt(b2)

    descending = mu < 0.0
    blocked = descending & (b <= r_ground)

    lo = radii[:-1][None, None, :]  # [1, 1, L]
    hi = radii[1:][None, None, :]
    b2e = b2[..., None]
    r0e = jnp.broadcast_to(r0[..., None], b2e.shape)

    # ascending part: radii in [max(r0, b), r_top]
    asc_lo = jnp.maximum(lo, jnp.maximum(r0e, jnp.sqrt(b2e)))
    asc_hi = hi
    up = _seg(b2e, jnp.minimum(asc_lo, asc_hi), asc_hi)

    # descending prefix (mu < 0): radii in [b, r0] traversed once more
    des_lo = jnp.maximum(lo, jnp.sqrt(b2e))
    des_hi = jnp.minimum(hi, r0e)
    down = _seg(b2e, jnp.minimum(des_lo, des_hi), des_hi)
    # ascending part for mu<0 covers [b, r_top] instead of [r0, r_top]
    asc_lo_tan = jnp.maximum(lo, jnp.sqrt(b2e))
    up_tan = _seg(b2e, jnp.minimum(asc_lo_tan, hi), hi)

    D = jnp.where(descending[..., None], down + up_tan, up)
    return D, blocked


import functools


@functools.partial(jax.jit, static_argnames=("chunk",))
def sun_tau_table(sigma_t, radii, mu_grid, r_ground=None, chunk=128):
    """Slant optical depth table tau[s, i, j] from level radius i toward
    the sun at local cosine mu_grid[j].

    sigma_t: [S, L]; radii: [L+1]. Chunked over the altitude axis to bound
    the [I, J, L] geometric tensor; the contraction over shells runs on the
    MXU. Jitted: eagerly, the chunk loop's ops each pay a host round trip
    (~2 min measured under the remote-device tunnel vs <1 s compiled).
    """
    radii = jnp.asarray(radii)
    I = radii.shape[0]
    n_chunks = -(-I // chunk)
    pad = n_chunks * chunk - I
    r0_padded = jnp.concatenate([radii, jnp.full(pad, radii[-1])]) if pad else radii
    r0_chunks = r0_padded.reshape(n_chunks, chunk)

    def per_chunk(r0c):
        D, blocked = slant_path_matrix(radii, r0c, mu_grid, r_ground)
        # [chunk, J, L] x [S, L] -> [S, chunk, J]
        tau = jnp.einsum("ijl,sl->sij", D, sigma_t)
        tau = jnp.where(blocked[None, :, :], TAU_BLOCKED, tau)
        return tau

    taus = jax.lax.map(per_chunk, r0_chunks)  # [n_chunks, S, chunk, J]
    taus = jnp.moveaxis(taus, 0, 1).reshape(
        sigma_t.shape[0], n_chunks * chunk, mu_grid.shape[0]
    )
    return taus[:, :I, :]


def lookup_sun_tau(table, radii, mu_grid, r, mu):
    """Bilinear interpolation of the per-row slant-tau table.

    table: [L+1, M] (single spectral row); r, mu: per-path scalars/batches.
    """
    i = jnp.clip(jnp.searchsorted(radii, r, side="right") - 1, 0, radii.shape[0] - 2)
    fr = jnp.clip(
        (r - radii[i]) / jnp.maximum(radii[i + 1] - radii[i], 1e-30), 0.0, 1.0
    )
    j = jnp.clip(
        jnp.searchsorted(mu_grid, mu, side="right") - 1, 0, mu_grid.shape[0] - 2
    )
    fm = jnp.clip(
        (mu - mu_grid[j]) / jnp.maximum(mu_grid[j + 1] - mu_grid[j], 1e-30), 0.0, 1.0
    )
    t00 = table[i, j]
    t01 = table[i, j + 1]
    t10 = table[i + 1, j]
    t11 = table[i + 1, j + 1]
    return (
        t00 * (1 - fr) * (1 - fm)
        + t01 * (1 - fr) * fm
        + t10 * fr * (1 - fm)
        + t11 * fr * fm
    )
