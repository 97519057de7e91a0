"""Pallas kernels: tiled ray / triangle Moller-Trumbore sweeps.

Triangle analog of :mod:`eradiate_tpu.ops.pallas.leaf_intersect` for the
BVH-free mesh path (tree trunks, mesh canopy elements; reference mesh
shapes ``scenes/shapes/_filemesh.py``, trees ``scenes/biosphere/_tree.py``).
Same dataflow: (ray block x triangle block) grid programs, VMEM-resident
branchless Moller-Trumbore, per-triangle-block bounding-sphere culling via
SMEM scalar prefetch, geometric normals accumulated in-kernel (one-hot
masked sums — no per-lane gathers).

SoA layout: rays as 7 [B] vectors, triangles as 9 [N] vectors
(v0 | e1 = v1 - v0 | e2 = v2 - v0, one vector per component).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "tri_block_spheres",
    "ray_tris_nearest_pallas",
    "ray_tris_occluded_pallas",
]

_BIG = 3.0e38
_BLOCK_B = 1024
_BLOCK_N = 1024


def tri_block_spheres(v0, e1, e2, block_n: int = _BLOCK_N):
    """Per-triangle-block bounding spheres (centers [M, 3], radius^2 [M]).

    Sphere covers all three vertices of every triangle in the block (pad
    blocks duplicate the last real vertex so spheres stay tight).
    """
    N = v0.shape[0]
    M = -(-N // block_n)
    pad = M * block_n - N

    def padv(a):
        a = jnp.pad(a, ((0, pad), (0, 0)))
        return a.at[N:].set(a[N - 1]) if pad else a

    v0p = padv(v0)
    v1p = padv(v0 + e1)
    v2p = padv(v0 + e2)
    verts = jnp.stack([v0p, v1p, v2p], axis=1).reshape(M, 3 * block_n, 3)
    mid = (jnp.min(verts, axis=1) + jnp.max(verts, axis=1)) * 0.5
    R = jnp.max(jnp.linalg.norm(verts - mid[:, None, :], axis=-1), axis=1)
    return mid, R * R


def _colr(ref):
    """Lane-scalar ref -> [TB, 1] column (see leaf_intersect._colr)."""
    v = ref[:]
    return v if v.ndim == 2 else v[:, None]


def _sphere_cull(px, py, pz, dx, dy, dz, tcap, sx, sy, sz, sr2):
    vx = sx - px
    vy = sy - py
    vz = sz - pz
    tc = jnp.clip(dx * vx + dy * vy + dz * vz, 0.0, tcap)
    ex = vx - dx * tc
    ey = vy - dy * tc
    ez = vz - dz * tc
    return ex * ex + ey * ey + ez * ez <= sr2


def _mt_hits(
    px, py, pz, dx, dy, dz,
    ax, ay, az, bx, by, bz, vx, vy, vz, cap,
):
    """[TB, TN] masked Moller-Trumbore distances (cap where missed).

    a = e1, b = e2, v = v0; rays as columns, triangles as rows.
    """
    # ray components and cap are [TB, 1] columns; triangles [TN] rows
    # pvec = d x e2
    pvx = dy * bz[None, :] - dz * by[None, :]
    pvy = dz * bx[None, :] - dx * bz[None, :]
    pvz = dx * by[None, :] - dy * bx[None, :]
    det = ax[None, :] * pvx + ay[None, :] * pvy + az[None, :] * pvz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    # tvec = p - v0
    tvx = px - vx[None, :]
    tvy = py - vy[None, :]
    tvz = pz - vz[None, :]
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * az[None, :] - tvz * ay[None, :]
    qvy = tvz * ax[None, :] - tvx * az[None, :]
    qvz = tvx * ay[None, :] - tvy * ax[None, :]
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (bx[None, :] * qvx + by[None, :] * qvy + bz[None, :] * qvz) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-7)
        & (t < cap)
    )
    return jnp.where(ok, t, _BIG)


def _kernel_nearest(
    sph,
    px, py, pz, dx, dy, dz, tmax,
    ax, ay, az, bx, by, bz, vx, vy, vz,
    best_t, bn_x, bn_y, bn_z,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_t[:] = jnp.minimum(tmax[:], _BIG)
        bn_x[:] = jnp.zeros(bn_x.shape, bn_x.dtype)
        bn_y[:] = jnp.zeros(bn_y.shape, bn_y.dtype)
        bn_z[:] = jnp.ones(bn_z.shape, bn_z.dtype)

    cap = _colr(best_t)
    pxc, pyc, pzc = _colr(px), _colr(py), _colr(pz)
    dxc, dyc, dzc = _colr(dx), _colr(dy), _colr(dz)
    two_d = len(best_t.shape) == 2
    reach = _sphere_cull(
        pxc, pyc, pzc, dxc, dyc, dzc, cap,
        sph[0, j], sph[1, j], sph[2, j], sph[3, j],
    )

    @pl.when(jnp.any(reach))
    def _tile():
        # rows 4-6 of sph: per-virtual-block instance translation
        # (applied to v0 only — edges are translation-invariant)
        t = _mt_hits(
            pxc, pyc, pzc, dxc, dyc, dzc,
            ax[:], ay[:], az[:], bx[:], by[:], bz[:],
            vx[:] + sph[4, j], vy[:] + sph[5, j], vz[:] + sph[6, j],
            cap,
        )
        tmin = jnp.min(t, axis=1, keepdims=True)
        better = tmin < cap
        # geometric normals n = e1 x e2 (unnormalized; winner sums
        # normalized after division by count on ties, then unit-normalized
        # by the caller-side contract below)
        nx = ay[:] * bz[:] - az[:] * by[:]
        ny = az[:] * bx[:] - ax[:] * bz[:]
        nz = ax[:] * by[:] - ay[:] * bx[:]
        inv_len = jax.lax.rsqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24)
        )
        m = (t == tmin).astype(t.dtype)
        nsel = jax.lax.dot_general(
            m,
            jnp.stack(
                [nx * inv_len, ny * inv_len, nz * inv_len,
                 jnp.ones_like(nx)],
                axis=1,
            ),
            (((1,), (0,)), ((), ())),
            preferred_element_type=t.dtype,
        )
        cnt = jnp.maximum(nsel[:, 3:4], 1.0)

        def upd(ref, val):
            cur = _colr(ref)
            new = jnp.where(better, val, cur)
            ref[:] = new if two_d else new[:, 0]

        upd(bn_x, nsel[:, 0:1] / cnt)
        upd(bn_y, nsel[:, 1:2] / cnt)
        upd(bn_z, nsel[:, 2:3] / cnt)
        upd(best_t, tmin)


def _kernel_occluded(
    sph,
    px, py, pz, dx, dy, dz, tmax,
    ax, ay, az, bx, by, bz, vx, vy, vz,
    occ,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        occ[:] = jnp.zeros(occ.shape, occ.dtype)

    live = _colr(occ) == 0
    pxc, pyc, pzc = _colr(px), _colr(py), _colr(pz)
    dxc, dyc, dzc = _colr(dx), _colr(dy), _colr(dz)
    tmaxc = _colr(tmax)
    two_d = len(occ.shape) == 2
    reach = _sphere_cull(
        pxc, pyc, pzc, dxc, dyc, dzc, tmaxc,
        sph[0, j], sph[1, j], sph[2, j], sph[3, j],
    )

    @pl.when(jnp.any(live & reach))
    def _tile():
        t = _mt_hits(
            pxc, pyc, pzc, dxc, dyc, dzc,
            ax[:], ay[:], az[:], bx[:], by[:], bz[:],
            vx[:] + sph[4, j], vy[:] + sph[5, j], vz[:] + sph[6, j],
            tmaxc,
        )
        hit = jnp.any(t < _BIG, axis=1, keepdims=True)
        cur = _colr(occ)
        new = jnp.where(hit, jnp.ones_like(cur), cur)
        occ[:] = new if two_d else new[:, 0]


def _pad_inputs(p, d, t_max, v0, e1, e2, block_b, block_n):
    B = p.shape[0]
    N = v0.shape[0]
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
    # degenerate far-away pad triangles (e = 0 -> det = 0 -> never hit)
    tris = [
        pad1(e1[:, 0], Np, 0.0), pad1(e1[:, 1], Np, 0.0), pad1(e1[:, 2], Np, 0.0),
        pad1(e2[:, 0], Np, 0.0), pad1(e2[:, 1], Np, 0.0), pad1(e2[:, 2], Np, 0.0),
        pad1(v0[:, 0], Np, 1e17), pad1(v0[:, 1], Np, 1e17), pad1(v0[:, 2], Np, 1e17),
    ]
    return rays, tris, nb, nn, Bp


def _sphere_operands(v0, e1, e2, spheres, block_n, nn):
    if spheres is None:
        sc, sr2 = tri_block_spheres(v0, e1, e2, block_n)
    else:
        sc, sr2 = spheres
    sc = jnp.pad(sc, ((0, nn - sc.shape[0]), (0, 0)), constant_values=1e17)
    sr2 = jnp.pad(sr2, (0, nn - sr2.shape[0]), constant_values=0.0)
    return jnp.concatenate(
        [sc.T, sr2[None, :], jnp.zeros((3, nn), sc.dtype)], axis=0
    )


def instanced_tri_sphere_operands(canonical_spheres, offsets, nc):
    sc, sr2 = canonical_spheres
    sc = jnp.pad(sc, ((0, nc - sc.shape[0]), (0, 0)), constant_values=1e17)
    sr2 = jnp.pad(sr2, (0, nc - sr2.shape[0]), constant_values=0.0)
    I = offsets.shape[0]
    centers_v = (sc[None, :, :] + offsets[:, None, :]).reshape(I * nc, 3)
    sr2_v = jnp.broadcast_to(sr2[None, :], (I, nc)).reshape(I * nc)
    off_v = jnp.broadcast_to(offsets[:, None, :], (I, nc, 3)).reshape(I * nc, 3)
    return jnp.concatenate(
        [centers_v.T, sr2_v[None, :], off_v.T], axis=0
    )


def ray_tris_nearest_pallas(
    p, d, t_max, v0, e1, e2,
    spheres=None,
    block_b: int = _BLOCK_B,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    """Nearest triangle hit. Returns (t_hit [B], normal [B, 3], hit [B]) —
    same contract as :func:`eradiate_tpu.ops.mesh.ray_tris_nearest`."""
    B = p.shape[0]
    rays, tris, nb, nn, Bp = _pad_inputs(
        p, d, t_max, v0, e1, e2, block_b, block_n
    )
    sph = _sphere_operands(v0, e1, e2, spheres, block_n, nn)

    rays = [x[:, None] for x in rays]  # column lane operands
    ray_spec = pl.BlockSpec((block_b, 1), lambda i, j, sph: (i, 0))
    tri_spec = pl.BlockSpec((block_n,), lambda i, j, sph: (j,))
    out_spec = pl.BlockSpec((block_b, 1), lambda i, j, sph: (i, 0))

    best_t, bn_x, bn_y, bn_z = pl.pallas_call(
        _kernel_nearest,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nn),
            in_specs=[ray_spec] * 7 + [tri_spec] * 9,
            out_specs=(out_spec,) * 4,
        ),
        out_shape=(jax.ShapeDtypeStruct((Bp, 1), p.dtype),) * 4,
        # tile temporaries exceed the default 16 MB scoped-VMEM budget at
        # 1024x1024 blocks; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(sph, *rays, *tris)

    best_t, bn_x, bn_y, bn_z = (
        best_t[:, 0], bn_x[:, 0], bn_y[:, 0], bn_z[:, 0]
    )
    best_t = best_t[:B]
    hit = best_t < t_max
    n = jnp.stack([bn_x[:B], bn_y[:B], bn_z[:B]], axis=-1)
    return jnp.where(hit, best_t, t_max), n, hit


def ray_tris_occluded_pallas(
    p, d, t_max, v0, e1, e2,
    spheres=None,
    block_b: int = _BLOCK_B,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    """True where any triangle blocks the segment (shadow rays)."""
    B = p.shape[0]
    rays, tris, nb, nn, Bp = _pad_inputs(
        p, d, t_max, v0, e1, e2, block_b, block_n
    )
    sph = _sphere_operands(v0, e1, e2, spheres, block_n, nn)

    rays = [x[:, None] for x in rays]  # column lane operands
    ray_spec = pl.BlockSpec((block_b, 1), lambda i, j, sph: (i, 0))
    tri_spec = pl.BlockSpec((block_n,), lambda i, j, sph: (j,))
    out_spec = pl.BlockSpec((block_b, 1), lambda i, j, sph: (i, 0))

    occ = pl.pallas_call(
        _kernel_occluded,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nn),
            in_specs=[ray_spec] * 7 + [tri_spec] * 9,
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(sph, *rays, *tris)
    return occ[:B, 0] > 0.5


# ---------------------------------------------------------------------------
# Instanced (virtual-block) triangle sweeps — canonical mesh stored once,
# per-virtual-block instance translations via the prefetch operand (same
# construction as pallas/leaf_intersect's instanced entries).


def _instanced_call(kernel, n_out, p, d, t_max, soup, offsets, spheres,
                    block_b, block_n, interpret):
    B = p.shape[0]
    v0, e1, e2 = soup
    rays, tris, nb, nc, Bp = _pad_inputs(
        p, d, t_max, v0, e1, e2, block_b, block_n
    )
    if spheres is None:
        spheres = tri_block_spheres(v0, e1, e2, block_n)
    sph = instanced_tri_sphere_operands(spheres, offsets, nc)
    I = offsets.shape[0]
    nn = I * nc

    rays = [x[:, None] for x in rays]  # column lane operands
    ray_spec = pl.BlockSpec((block_b, 1), lambda i, j, sph: (i, 0))
    tri_spec = pl.BlockSpec((block_n,), lambda i, j, sph: (j % nc,))
    out_spec = pl.BlockSpec((block_b, 1), lambda i, j, sph: (i, 0))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nn),
            in_specs=[ray_spec] * 7 + [tri_spec] * 9,
            out_specs=(out_spec,) * n_out if n_out > 1 else out_spec,
        ),
        out_shape=(
            (jax.ShapeDtypeStruct((Bp, 1), p.dtype),) * n_out
            if n_out > 1
            else jax.ShapeDtypeStruct((Bp, 1), jnp.float32)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(sph, *rays, *tris)
    out = tuple(o[:, 0] for o in out) if n_out > 1 else out[:, 0]
    return out, B


def ray_tris_nearest_instanced_pallas(
    p, d, t_max, v0, e1, e2, offsets,
    spheres=None, block_b: int = _BLOCK_B, block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    (best_t, bn_x, bn_y, bn_z), B = _instanced_call(
        _kernel_nearest, 4, p, d, t_max, (v0, e1, e2), offsets, spheres,
        block_b, block_n, interpret,
    )
    best_t = best_t[:B]
    hit = best_t < t_max
    n = jnp.stack([bn_x[:B], bn_y[:B], bn_z[:B]], axis=-1)
    return jnp.where(hit, best_t, t_max), n, hit


def ray_tris_occluded_instanced_pallas(
    p, d, t_max, v0, e1, e2, offsets,
    spheres=None, block_b: int = _BLOCK_B, block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    occ, B = _instanced_call(
        _kernel_occluded, 1, p, d, t_max, (v0, e1, e2), offsets, spheres,
        block_b, block_n, interpret,
    )
    return occ[:B] > 0.5
