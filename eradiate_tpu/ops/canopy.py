"""Canopy geometry kernels: ray / leaf-disk intersection.

TPU-native replacement for the reference's triangle-mesh + BVH canopy
tracing (SURVEY §2.1: scenes are "meshes for canopies"; leaf clouds are
disk sets, ``scenes/biosphere/_leaf_cloud.py``). Instead of a BVH — a
pointer-chasing structure hostile to SIMD — leaves are tested with a
**dense tiled sweep**: the [paths x leaves] intersection grid is evaluated
in VMEM-sized chunks (regular compute, no divergence), which XLA maps well
onto the VPU; a Pallas tiling pass is the planned speed-of-light follow-up.

Leaves are flat disks: centers [N, 3], unit normals [N, 3], radii [N].
Lengths in km (kernel units).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .scene_state import _pytree_dataclass

__all__ = ["LeafCloudArrays", "ray_leaves_nearest", "ray_leaves_occluded"]


@_pytree_dataclass
class LeafCloudArrays:
    centers: Any  # [N, 3]
    normals: Any  # [N, 3]
    radii: Any  # [N]


_EPS_T = 1e-7


def _chunk_hits(p, d, centers, normals, radii, t_max):
    """Intersection distances of rays [B, 3] against a leaf chunk [Nc].

    Returns t [B, Nc] with +inf where missed.
    """
    # t = dot(c - p, n) / dot(d, n)
    dn = jnp.einsum("bj,nj->bn", d, normals)
    cn = jnp.einsum("nj,nj->n", centers, normals)
    pn = jnp.einsum("bj,nj->bn", p, normals)
    t = (cn[None, :] - pn) / jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
    q = p[:, None, :] + d[:, None, :] * t[..., None]  # [B, Nc, 3]
    dist2 = jnp.sum((q - centers[None, :, :]) ** 2, axis=-1)
    ok = (
        (t > _EPS_T)
        & (t < t_max[:, None])
        & (dist2 <= (radii * radii)[None, :])
        & (jnp.abs(dn) > 1e-12)
    )
    return jnp.where(ok, t, jnp.inf)


def _scan_chunks(p, d, leaves, t_max, chunk, reduce_fn, init):
    N = leaves.centers.shape[0]
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    centers = jnp.pad(leaves.centers, ((0, pad), (0, 0)))
    normals = jnp.pad(
        leaves.normals, ((0, pad), (0, 0)), constant_values=0.0
    ).at[N:, 2].set(1.0) if pad else leaves.normals
    radii = jnp.pad(leaves.radii, (0, pad), constant_values=0.0) if pad else leaves.radii
    if pad:
        centers = centers.at[N:, 2].set(-1e9)  # far away

    cc = centers.reshape(n_chunks, chunk, 3)
    nn = normals.reshape(n_chunks, chunk, 3)
    rr = radii.reshape(n_chunks, chunk)

    def body(carry, xs):
        c, n, r = xs
        t = _chunk_hits(p, d, c, n, r, t_max)
        return reduce_fn(carry, t, xs), None

    carry, _ = jax.lax.scan(body, init, (cc, nn, rr))
    return carry


def ray_leaves_nearest(p, d, t_max, leaves: LeafCloudArrays, chunk: int = 512):
    """Nearest leaf hit along p + t d for t in (0, t_max).

    Returns (t_hit [B], leaf_normal [B, 3], hit [B]).
    """
    B = p.shape[0]

    def reduce_fn(carry, t, xs):
        best_t, best_n = carry
        c, n, r = xs
        # gather-free winner selection: per-lane gathers (t[arange, idx],
        # n[idx]) lower to serial dynamic slices on TPU; min + equality
        # one-hot masked reductions stay fully vectorized. Exact f32 ties
        # (measure-zero) average the tied normals.
        tmin = jnp.min(t, axis=1)
        m = (t == tmin[:, None]) & jnp.isfinite(tmin)[:, None]
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1)
        n_sel = jnp.stack(
            [jnp.sum(jnp.where(m, n[None, :, j], 0.0), axis=1) for j in range(3)],
            axis=-1,
        ) / cnt[:, None].astype(t.dtype)
        better = tmin < best_t
        best_n = jnp.where(better[:, None], n_sel, best_n)
        best_t = jnp.where(better, tmin, best_t)
        return best_t, best_n

    init = (jnp.full(B, jnp.inf), jnp.zeros((B, 3)).at[:, 2].set(1.0))
    best_t, best_n = _scan_chunks(p, d, leaves, t_max, chunk, reduce_fn, init)
    hit = jnp.isfinite(best_t)
    return jnp.where(hit, best_t, t_max), best_n, hit


def ray_leaves_occluded(p, d, t_max, leaves: LeafCloudArrays, chunk: int = 512):
    """True where any leaf blocks the segment (shadow rays for NEE)."""

    def reduce_fn(carry, t, xs):
        return carry | jnp.any(jnp.isfinite(t), axis=1)

    return _scan_chunks(
        p, d, leaves, t_max, chunk, reduce_fn, jnp.zeros(p.shape[0], dtype=bool)
    )
