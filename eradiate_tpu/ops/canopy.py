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

__all__ = [
    "InstancedLeafArrays",
    "LeafCloudArrays",
    "leaf_bounds",
    "leaf_nearest",
    "leaf_occluded",
    "leaf_spheres",
    "morton_order",
    "ray_leaves_nearest",
    "ray_leaves_occluded",
]


@_pytree_dataclass
class LeafCloudArrays:
    centers: Any  # [N, 3]
    normals: Any  # [N, 3]
    radii: Any  # [N]


@_pytree_dataclass
class InstancedLeafArrays:
    """Instanced leaf geometry: one canonical (Morton-ordered) cloud +
    per-instance translations. The sweeps treat it as the union of
    translated copies WITHOUT materializing them (VERDICT r1, Missing #4:
    instances stay instances) — HBM leaf storage is the canonical cloud
    alone; the Pallas kernels run a virtual-block grid whose prefetch
    operand carries per-block instance offsets, the XLA fallback scans
    instances."""

    canonical: LeafCloudArrays
    offsets: Any  # [I, 3]


def leaf_bounds(leaves):
    """(lo, hi) AABB of the leaf set (flat or instanced)."""
    if isinstance(leaves, InstancedLeafArrays):
        c = leaves.canonical
        lo_c = jnp.min(c.centers - c.radii[:, None], axis=0)
        hi_c = jnp.max(c.centers + c.radii[:, None], axis=0)
        return (
            lo_c + jnp.min(leaves.offsets, axis=0),
            hi_c + jnp.max(leaves.offsets, axis=0),
        )
    lo = jnp.min(leaves.centers - leaves.radii[:, None], axis=0)
    hi = jnp.max(leaves.centers + leaves.radii[:, None], axis=0)
    return lo, hi


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


def morton_order(positions):
    """Host-side Morton (Z-curve) ordering permutation for leaf positions
    [N, 3] (numpy). Spatially adjacent leaves land in adjacent array slots,
    which makes the per-block bounding spheres of the Pallas sweep kernels
    tight (:func:`eradiate_tpu.ops.pallas.leaf_intersect.leaf_block_spheres`)
    so that block culling actually rejects tiles. Pure reordering — the
    sweep results are order-invariant (min/any reductions).
    """
    import numpy as np

    pos = np.asarray(positions, dtype=np.float64)
    lo = pos.min(axis=0)
    span = np.maximum(pos.max(axis=0) - lo, 1e-12)
    q = np.clip((pos - lo) / span * ((1 << 21) - 1), 0, (1 << 21) - 1).astype(
        np.uint64
    )
    code = np.zeros(pos.shape[0], dtype=np.uint64)
    for b in range(21):
        for ax in range(3):
            code |= ((q[:, ax] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                3 * b + ax
            )
    return np.argsort(code, kind="stable")


def _pallas_eligible(p, leaves: LeafCloudArrays) -> bool:
    """The Mosaic sweep kernels are f32-only and TPU-only; everything else
    (CPU tests, f64 double modes) takes the XLA dense sweep.
    ``ERADIATE_NO_PALLAS=1`` forces the XLA path (A/B tooling)."""
    import os

    if os.environ.get("ERADIATE_NO_PALLAS"):
        return False
    return (
        jax.default_backend() == "tpu"
        and p.dtype == jnp.float32
        and leaves.centers.dtype == jnp.float32
    )


def leaf_spheres(p, leaves):
    """Acceleration data for the leaf sweeps: ``(block_spheres, aabb_lo,
    aabb_hi)`` where ``block_spheres`` is None on the XLA path (canonical-
    cloud block spheres for instanced sets). Compute ONCE per render,
    outside the path loop, and pass to every
    :func:`leaf_nearest`/:func:`leaf_occluded` call — XLA does not reliably
    hoist the reductions out of ``while_loop`` bodies.
    """
    lo, hi = leaf_bounds(leaves)
    base = leaves.canonical if isinstance(leaves, InstancedLeafArrays) else leaves
    if not _pallas_eligible(p, base):
        return None, lo, hi
    from .pallas.leaf_intersect import leaf_block_spheres

    sph = leaf_block_spheres(base.centers, base.normals, base.radii)
    return sph, lo, hi


def _advance_to_aabb(p, d, t_max, lo, hi):
    """Clip rays to their overlap with the cloud's AABB: returns
    ``(p_adv, t0, t_cap)`` with ``p_adv = p + t0 d`` and the remaining
    in-box flight cap ``t_cap`` (0 where the segment misses the box).

    Two purposes: (1) **precision** — sweeping from a TOA-distant origin
    (|p| ~ 1e2 km) against 1e-4 km leaf disks loses ~7 mm to f32 rounding
    in ``p + t d``, a double-digit percentage of the disk radius; starting
    at the box keeps the round-off ~1e4x below the disk size. (2) **speed**
    — lanes whose segment misses the box sweep nothing (t_cap = 0 kills
    every per-leaf test and tile-cull early).
    """
    safe_d = jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    ta = (lo[None, :] - p) / safe_d
    tb = (hi[None, :] - p) / safe_d
    t_enter = jnp.max(jnp.minimum(ta, tb), axis=1)
    t_exit = jnp.min(jnp.maximum(ta, tb), axis=1)
    # back the entry off by a relative epsilon: geometry lying ON a box
    # face (tree-trunk caps, flat canopy tops) would otherwise see its
    # hit at t_loc ~ +-ulp(t_enter), rejected by the sweeps' t > 1e-7
    # gate (found by the instanced-mesh equivalence tests: 17/23 cap hits
    # silently lost). 1e-5 relative keeps the advanced origin within
    # ~2e-4 of the box at t ~ 20 km — far below the disk/leaf scale the
    # advance exists to protect.
    t_enter = t_enter - 1e-5 * jnp.abs(t_enter) - 1e-6
    # ... and pad the exit symmetrically: geometry lying ON the far box
    # face (a flat DEM mesh whose floor IS the box's low-z plane) would
    # otherwise see its hit at t_loc == t_cap, rejected by the sweeps'
    # strict t < t_max gate (found by the triangulated-DEM cross-gate:
    # every floor hit silently lost). The sliver this admits contains
    # only real geometry on the face itself.
    t_exit = t_exit + 1e-5 * jnp.abs(t_exit) + 1e-6
    t0 = jnp.clip(t_enter, 0.0, t_max)
    t_cap = jnp.maximum(jnp.minimum(t_exit, t_max) - t0, 0.0)
    return p + t0[:, None] * d, t0, t_cap


def _instanced_nearest_xla(p, d, t_max, inst: InstancedLeafArrays):
    """XLA fallback for instanced sets: scan instances, translate the ray
    into each instance frame, run the canonical chunk sweep, keep the
    winner."""
    c = inst.canonical
    B = p.shape[0]

    def body(carry, offset):
        best_t, best_n, any_hit = carry
        t, n, h = ray_leaves_nearest(p - offset[None, :], d, best_t, c)
        better = h & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_n = jnp.where(better[:, None], n, best_n)
        return (best_t, best_n, any_hit | better), None

    init = (
        t_max,
        jnp.zeros((B, 3), p.dtype).at[:, 2].set(1.0),
        jnp.zeros(B, dtype=bool),
    )
    (best_t, best_n, hit), _ = jax.lax.scan(body, init, inst.offsets)
    return jnp.where(hit, best_t, t_max), best_n, hit


def leaf_nearest(p, d, t_max, leaves, accel=None):
    """Nearest leaf hit: AABB-advanced origins (precision + whole-lane
    culling), then the Pallas tiled kernel on TPU/f32 (block-sphere tile
    culling; virtual-block grid for instanced sets) or the XLA dense
    sweep. Same (t, normal, hit) contract as :func:`ray_leaves_nearest`."""
    spheres, lo, hi = accel if accel is not None else leaf_spheres(p, leaves)
    p_adv, t0, t_cap = _advance_to_aabb(p, d, t_max, lo, hi)
    if isinstance(leaves, InstancedLeafArrays):
        c = leaves.canonical
        if _pallas_eligible(p, c):
            from .pallas.leaf_intersect import (
                ray_leaves_nearest_instanced_pallas,
            )

            t_loc, n, hit = ray_leaves_nearest_instanced_pallas(
                p_adv, d, t_cap, c.centers, c.normals, c.radii,
                leaves.offsets, spheres=spheres,
            )
        else:
            t_loc, n, hit = _instanced_nearest_xla(p_adv, d, t_cap, leaves)
        return jnp.where(hit, t0 + t_loc, t_max), n, hit
    if _pallas_eligible(p, leaves):
        from .pallas.leaf_intersect import ray_leaves_nearest_pallas

        t_loc, n, hit = ray_leaves_nearest_pallas(
            p_adv, d, t_cap, leaves.centers, leaves.normals, leaves.radii,
            spheres=spheres,
        )
    else:
        t_loc, n, hit = ray_leaves_nearest(p_adv, d, t_cap, leaves)
    return jnp.where(hit, t0 + t_loc, t_max), n, hit


def leaf_occluded(p, d, t_max, leaves, accel=None):
    """Shadow-ray any-hit with AABB advance; Pallas on TPU/f32
    (virtual-block grid for instanced sets)."""
    spheres, lo, hi = accel if accel is not None else leaf_spheres(p, leaves)
    p_adv, t0, t_cap = _advance_to_aabb(p, d, t_max, lo, hi)
    if isinstance(leaves, InstancedLeafArrays):
        c = leaves.canonical
        if _pallas_eligible(p, c):
            from .pallas.leaf_intersect import (
                ray_leaves_occluded_instanced_pallas,
            )

            return ray_leaves_occluded_instanced_pallas(
                p_adv, d, t_cap, c.centers, c.normals, c.radii,
                leaves.offsets, spheres=spheres,
            )

        def body(carry, offset):
            return carry | ray_leaves_occluded(
                p_adv - offset[None, :], d, t_cap, c
            ), None

        occ, _ = jax.lax.scan(
            body, jnp.zeros(p.shape[0], dtype=bool), leaves.offsets
        )
        return occ
    if _pallas_eligible(p, leaves):
        from .pallas.leaf_intersect import ray_leaves_occluded_pallas

        return ray_leaves_occluded_pallas(
            p_adv, d, t_cap, leaves.centers, leaves.normals, leaves.radii,
            spheres=spheres,
        )
    return ray_leaves_occluded(p_adv, d, t_cap, leaves)
