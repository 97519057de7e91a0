"""Pallas kernel: tiled ray / leaf-disk nearest-intersection sweep.

The canopy tracer's hot op is a dense [rays x leaves] intersection grid
(SURVEY §7.1: "BSDF/phase eval ... great Pallas targets"; the BVH-free
canopy design makes this the FLOP-heavy inner loop). This kernel tiles the
grid as (ray block x leaf block) programs: leaf tiles stream through VMEM
while a per-ray running minimum accumulates in the revisited output block —
the same dataflow as a matmul with a min-reduction instead of an MAC.

SoA layout: rays as 7 [B] vectors (px py pz dx dy dz t_max), leaves as 7
[N] vectors (cx cy cz nx ny nz r2). Outputs: best distance [B] and best
leaf index [B] (-1 = miss).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["ray_leaves_nearest_pallas"]

_BIG = 3.0e38


def _kernel(
    px, py, pz, dx, dy, dz, tmax,
    cx, cy, cz, nx, ny, nz, r2,
    best_t, best_i,
    *, block_n: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_t[:] = jnp.minimum(tmax[:], _BIG)
        best_i[:] = jnp.full(best_i.shape, -1, dtype=jnp.int32)

    # [TB, TN] broadcasting: ray quantities as columns, leaf as rows
    dn = (
        dx[:][:, None] * nx[:][None, :]
        + dy[:][:, None] * ny[:][None, :]
        + dz[:][:, None] * nz[:][None, :]
    )
    cn = cx[:] * nx[:] + cy[:] * ny[:] + cz[:] * nz[:]  # [TN]
    pn = (
        px[:][:, None] * nx[:][None, :]
        + py[:][:, None] * ny[:][None, :]
        + pz[:][:, None] * nz[:][None, :]
    )
    dn_safe = jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
    t = (cn[None, :] - pn) / dn_safe

    qx = px[:][:, None] + dx[:][:, None] * t - cx[:][None, :]
    qy = py[:][:, None] + dy[:][:, None] * t - cy[:][None, :]
    qz = pz[:][:, None] + dz[:][:, None] * t - cz[:][None, :]
    dist2 = qx * qx + qy * qy + qz * qz

    ok = (
        (t > 1e-7)
        & (t < best_t[:][:, None])
        & (dist2 <= r2[:][None, :])
        & (jnp.abs(dn) > 1e-12)
    )
    t_masked = jnp.where(ok, t, _BIG)
    tmin = jnp.min(t_masked, axis=1)
    amin = jnp.argmin(t_masked, axis=1).astype(jnp.int32)

    better = tmin < best_t[:]
    best_t[:] = jnp.where(better, tmin, best_t[:])
    best_i[:] = jnp.where(
        better, amin + j * block_n, best_i[:]
    )


def ray_leaves_nearest_pallas(
    p, d, t_max, centers, normals, radii,
    block_b: int = 256,
    block_n: int = 512,
    interpret: bool = False,
):
    """Nearest leaf-disk hit. Returns (t_hit [B], leaf_idx [B], hit [B]).

    ``leaf_idx`` indexes the (padded) leaf arrays; gather normals on the
    caller side. Misses keep t_hit == t_max and idx == -1.
    """
    B = p.shape[0]
    N = centers.shape[0]
    nb = -(-B // block_b)
    nn = -(-N // block_n)
    Bp = nb * block_b
    Np = nn * block_n

    def pad1(x, n, fill):
        return jnp.pad(x, (0, n - x.shape[0]), constant_values=fill)

    rays = [
        pad1(p[:, 0], Bp, 0.0), pad1(p[:, 1], Bp, 0.0), pad1(p[:, 2], Bp, 0.0),
        pad1(d[:, 0], Bp, 0.0), pad1(d[:, 1], Bp, 0.0), pad1(d[:, 2], Bp, 1.0),
        pad1(t_max, Bp, 0.0),
    ]
    leaves = [
        pad1(centers[:, 0], Np, 1e18), pad1(centers[:, 1], Np, 1e18),
        pad1(centers[:, 2], Np, 1e18),
        pad1(normals[:, 0], Np, 0.0), pad1(normals[:, 1], Np, 0.0),
        pad1(normals[:, 2], Np, 1.0),
        pad1(radii * radii, Np, 0.0),
    ]

    ray_spec = pl.BlockSpec((block_b,), lambda i, j: (i,))
    leaf_spec = pl.BlockSpec((block_n,), lambda i, j: (j,))
    out_spec = pl.BlockSpec((block_b,), lambda i, j: (i,))

    best_t, best_i = pl.pallas_call(
        functools.partial(_kernel, block_n=block_n),
        grid=(nb, nn),
        in_specs=[ray_spec] * 7 + [leaf_spec] * 7,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Bp,), p.dtype),
            jax.ShapeDtypeStruct((Bp,), jnp.int32),
        ),
        interpret=interpret,
    )(*rays, *leaves)

    best_t = best_t[:B]
    best_i = best_i[:B]
    hit = (best_i >= 0) & (best_i < N)
    return jnp.where(hit, best_t, t_max), jnp.where(hit, best_i, 0), hit
