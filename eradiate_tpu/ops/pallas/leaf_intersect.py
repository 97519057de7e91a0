"""Pallas kernels: tiled ray / leaf-disk intersection sweeps.

The canopy tracer's hot op is a dense [rays x leaves] intersection grid
(SURVEY §7.1: the BVH-free canopy design makes this the FLOP-heavy inner
loop; reference canopies are leaf-disk clouds,
``scenes/biosphere/_leaf_cloud.py``). XLA's fused form of the sweep is
VPU-bound at ~10-32 Gpair/s on v5e; these kernels tile the grid as
(ray block x leaf block) programs with all intermediates VMEM-resident —
the same dataflow as a matmul with a min/any-reduction instead of a MAC —
and add **bounding-sphere tile culling**: each leaf block carries a
precomputed bounding sphere (:func:`leaf_block_spheres`), each tile first
runs a cheap [TB] segment-vs-sphere test and skips the [TB, TN] disk math
when no active lane can possibly hit the block (``@pl.when``). With
Morton-ordered leaves (tight block spheres) and spatially coherent lanes
the skip eliminates most tiles; with incoherent lanes it costs ~2% extra.

SoA layout: rays as 7 [B] vectors (px py pz dx dy dz t_max), leaves as 7
[N] vectors (cx cy cz nx ny nz r2), block spheres as 4 [M] vectors
(sx sy sz sR2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "leaf_block_spheres",
    "ray_leaves_nearest_pallas",
    "ray_leaves_occluded_pallas",
]

_BIG = 3.0e38
# 1D f32 operands on TPU get an XLA layout tiled T(1024); Mosaic requires
# block shapes to match it (verified: 256-wide blocks fail layout checks).
_BLOCK_B = 1024
_BLOCK_N = 1024
#: leaves per CULL sub-block: each 1024-leaf operand tile carries
#: block_n // _SUB bounding spheres and the kernels cull + sweep at this
#: finer granularity (Mosaic pins 1D operand blocks to the 1024-element
#: XLA tiling, so the finer culling lives INSIDE the tile) — measured
#: the main lever on canopy scenes where a 1024-leaf sphere spans a
#: whole crown while a 128-leaf sphere covers a small sector of it
_SUB = 128


def leaf_block_spheres(centers, normals, radii, block_n: int = _SUB):
    """Per-leaf-block bounding spheres (centers [M, 3], radius^2 [M]).

    Blocks are ``block_n`` consecutive leaves (pad with far-away dummies);
    call once per render (outside the path loop) and feed the result to the
    sweep kernels. Tight spheres need spatially sorted leaves — see
    ``morton_order`` in :mod:`eradiate_tpu.ops.canopy`.
    """
    N = centers.shape[0]
    M = -(-N // block_n)
    pad = M * block_n - N
    c = jnp.pad(centers, ((0, pad), (0, 0)), constant_values=0.0)
    r = jnp.pad(radii, (0, pad), constant_values=0.0)
    if pad:
        # duplicate the last real leaf into the padding so the sphere of the
        # final block is not dragged to the origin
        c = c.at[N:].set(c[N - 1])
        r = r.at[N:].set(0.0)
    cb = c.reshape(M, block_n, 3)
    rb = r.reshape(M, block_n)
    mid = (jnp.min(cb, axis=1) + jnp.max(cb, axis=1)) * 0.5  # [M, 3]
    dist = jnp.linalg.norm(cb - mid[:, None, :], axis=-1) + rb
    R = jnp.max(dist, axis=1)
    return mid, R * R


def _colr(ref):
    """Lane-scalar ref -> [TB, 1] column array (see shell_flight._colr:
    1D T(1024) operands pay a Mosaic relayout at every broadcast against
    a [TB, TN] tile; [B, 1] column operands broadcast natively)."""
    v = ref[:]
    return v if v.ndim == 2 else v[:, None]


def _sphere_cull(px, py, pz, dx, dy, dz, tcap, sx, sy, sz, sr2):
    """Conservative per-ray test: can the segment p + t d, t in [0, tcap]
    reach the block sphere? Column convention: ray components and tcap
    are [TB, 1]; returns bool [TB, 1]."""
    vx = sx - px
    vy = sy - py
    vz = sz - pz
    tc = jnp.clip(dx * vx + dy * vy + dz * vz, 0.0, tcap)
    ex = vx - dx * tc
    ey = vy - dy * tc
    ez = vz - dz * tc
    return ex * ex + ey * ey + ez * ez <= sr2


def _disk_hits(px, py, pz, dx, dy, dz, cx, cy, cz, nx, ny, nz, r2, cap):
    """[TB, TN] masked intersection distances (cap where missed).
    Ray components and cap are [TB, 1] columns; leaf vectors are [TN]."""
    dn = dx * nx[None, :] + dy * ny[None, :] + dz * nz[None, :]
    cn = cx * nx + cy * ny + cz * nz  # [TN]
    pn = px * nx[None, :] + py * ny[None, :] + pz * nz[None, :]
    dn_safe = jnp.where(jnp.abs(dn) > 1e-12, dn, 1e-12)
    t = (cn[None, :] - pn) / dn_safe
    qx = px + dx * t - cx[None, :]
    qy = py + dy * t - cy[None, :]
    qz = pz + dz * t - cz[None, :]
    dist2 = qx * qx + qy * qy + qz * qz
    ok = (
        (t > 1e-7)
        & (t < cap)
        & (dist2 <= r2[None, :])
        & (jnp.abs(dn) > 1e-12)
    )
    return jnp.where(ok, t, _BIG)


def _kernel_nearest(
    csph, sph,
    px, py, pz, dx, dy, dz, tmax,
    cx, cy, cz, nx, ny, nz, r2,
    best_t, bn_x, bn_y, bn_z,
    *, spt: int, sub: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_t[:] = jnp.minimum(tmax[:], _BIG)
        bn_x[:] = jnp.zeros(bn_x.shape, bn_x.dtype)
        bn_y[:] = jnp.zeros(bn_y.shape, bn_y.dtype)
        bn_z[:] = jnp.ones(bn_z.shape, bn_z.dtype)

    # two-level cull: ONE coarse whole-tile sphere test keeps the cheap
    # far-tile skip (a flat sub-loop of fine tests measured 10x slower on
    # the 1e6-disk instanced bench, where most tiles are far away)
    coarse = _sphere_cull(
        _colr(px), _colr(py), _colr(pz), _colr(dx), _colr(dy), _colr(dz),
        _colr(best_t),
        csph[0, j], csph[1, j], csph[2, j], csph[3, j],
    )

    @pl.when(jnp.any(coarse))
    def _tile_lvl():
        _kernel_nearest_subs(
            sph, px, py, pz, dx, dy, dz,
            cx, cy, cz, nx, ny, nz, r2,
            best_t, bn_x, bn_y, bn_z, j=j, spt=spt, sub=sub,
        )


def _kernel_nearest_subs(
    sph, px, py, pz, dx, dy, dz,
    cx, cy, cz, nx, ny, nz, r2,
    best_t, bn_x, bn_y, bn_z, *, j, spt, sub,
):
    # in-tile sub-block views (static reshape; 1D refs cannot be sliced
    # at sub-tile offsets under the T(1024) layout)
    cxs = cx[:].reshape(spt, sub)
    cys = cy[:].reshape(spt, sub)
    czs = cz[:].reshape(spt, sub)
    nxs = nx[:].reshape(spt, sub)
    nys = ny[:].reshape(spt, sub)
    nzs = nz[:].reshape(spt, sub)
    r2s = r2[:].reshape(spt, sub)

    pxc, pyc, pzc = _colr(px), _colr(py), _colr(pz)
    dxc, dyc, dzc = _colr(dx), _colr(dy), _colr(dz)
    two_d = len(best_t.shape) == 2
    for k in range(spt):
        col = j * spt + k
        cap = _colr(best_t)
        if spt == 1:
            # the coarse whole-tile gate already fired; no second test
            reach_any = jnp.asarray(True)
        else:
            reach = _sphere_cull(
                pxc, pyc, pzc, dxc, dyc, dzc, cap,
                sph[0, col], sph[1, col], sph[2, col], sph[3, col],
            )
            reach_any = jnp.any(reach)

        @pl.when(reach_any)
        def _tile(k=k, col=col, cap=cap):
            # rows 4-6: per-virtual-block instance offset (zero when the
            # leaf table is flat) — canonical blocks translated in-tile
            t = _disk_hits(
                pxc, pyc, pzc, dxc, dyc, dzc,
                cxs[k] + sph[4, col], cys[k] + sph[5, col],
                czs[k] + sph[6, col],
                nxs[k], nys[k], nzs[k], r2s[k], cap,
            )
            tmin = jnp.min(t, axis=1, keepdims=True)
            better = tmin < cap
            # winner normal via one-hot masked sums (exact f32 ties
            # average, mirroring the XLA reduction in ops/canopy.py)
            m = (t == tmin).astype(t.dtype)
            nsel = jax.lax.dot_general(
                m,
                jnp.stack(
                    [nxs[k], nys[k], nzs[k], jnp.ones_like(nxs[k])], axis=1
                ),
                (((1,), (0,)), ((), ())),
                preferred_element_type=t.dtype,
            )  # [TB, 4]: (sum nx, sum ny, sum nz, count)
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
    csph, sph,
    px, py, pz, dx, dy, dz, tmax,
    cx, cy, cz, nx, ny, nz, r2,
    occ,
    *, spt: int, sub: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        occ[:] = jnp.zeros(occ.shape, occ.dtype)

    live0 = _colr(occ) == 0
    coarse = _sphere_cull(
        _colr(px), _colr(py), _colr(pz), _colr(dx), _colr(dy), _colr(dz),
        _colr(tmax),
        csph[0, j], csph[1, j], csph[2, j], csph[3, j],
    )

    @pl.when(jnp.any(live0 & coarse))
    def _tile_lvl():
        _kernel_occluded_subs(
            sph, px, py, pz, dx, dy, dz, tmax,
            cx, cy, cz, nx, ny, nz, r2, occ, j=j, spt=spt, sub=sub,
        )


def _kernel_occluded_subs(
    sph, px, py, pz, dx, dy, dz, tmax,
    cx, cy, cz, nx, ny, nz, r2, occ, *, j, spt, sub,
):
    cxs = cx[:].reshape(spt, sub)
    cys = cy[:].reshape(spt, sub)
    czs = cz[:].reshape(spt, sub)
    nxs = nx[:].reshape(spt, sub)
    nys = ny[:].reshape(spt, sub)
    nzs = nz[:].reshape(spt, sub)
    r2s = r2[:].reshape(spt, sub)

    pxc, pyc, pzc = _colr(px), _colr(py), _colr(pz)
    dxc, dyc, dzc = _colr(dx), _colr(dy), _colr(dz)
    tmaxc = _colr(tmax)
    two_d = len(occ.shape) == 2
    for k in range(spt):
        col = j * spt + k
        live = _colr(occ) == 0
        if spt == 1:
            gate = jnp.any(live)
        else:
            reach = _sphere_cull(
                pxc, pyc, pzc, dxc, dyc, dzc, tmaxc,
                sph[0, col], sph[1, col], sph[2, col], sph[3, col],
            )
            gate = jnp.any(live & reach)

        @pl.when(gate)
        def _tile(k=k, col=col):
            t = _disk_hits(
                pxc, pyc, pzc, dxc, dyc, dzc,
                cxs[k] + sph[4, col], cys[k] + sph[5, col],
                czs[k] + sph[6, col],
                nxs[k], nys[k], nzs[k], r2s[k], tmaxc,
            )
            hit = jnp.any(t < _BIG, axis=1, keepdims=True)
            cur = _colr(occ)
            new = jnp.where(hit, jnp.ones_like(cur), cur)
            occ[:] = new if two_d else new[:, 0]


def _coarse_from_subs(sph, nn, spt):
    """[4, nn] whole-tile enclosing spheres from the [7, nn*spt] fine
    sub-sphere operand (instance translations already applied). Tiles
    whose sub-spheres are all padding collapse to an unreachable point,
    so the coarse cull skips them entirely."""
    c = sph[:3].T.reshape(nn, spt, 3)
    r = jnp.sqrt(sph[3]).reshape(nn, spt)
    valid = c[..., 0] < 1e16
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)
    ctr = jnp.sum(jnp.where(valid[..., None], c, 0.0), axis=1) / cnt[:, None]
    ctr = jnp.where(
        jnp.any(valid, axis=1)[:, None], ctr, jnp.full_like(ctr, 1e17)
    )
    d = jnp.linalg.norm(c - ctr[:, None, :], axis=-1) + r
    R = jnp.max(jnp.where(valid, d, 0.0), axis=1)
    return jnp.concatenate([ctr.T, (R * R)[None, :]], axis=0)


def _pad_inputs(p, d, t_max, centers, normals, radii, block_b, block_n):
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
        pad1(centers[:, 0], Np, 1e17), pad1(centers[:, 1], Np, 1e17),
        pad1(centers[:, 2], Np, 1e17),
        pad1(normals[:, 0], Np, 0.0), pad1(normals[:, 1], Np, 0.0),
        pad1(normals[:, 2], Np, 1.0),
        pad1(radii * radii, Np, 0.0),
    ]
    return rays, leaves, nb, nn, Bp


def _sphere_operands(centers, normals, radii, spheres, block_n, nn):
    """Sphere data as ONE [7, nn * spt] f32 array (sx sy sz sR2 ox oy oz
    rows, one column per _SUB-leaf cull sub-block) fed to the kernels
    via SMEM scalar prefetch and indexed by ``j * spt + k``. Offset rows
    are zero for flat leaf tables; the instanced entry points build
    virtual-block operands instead."""
    sub = min(_SUB, block_n)
    spt = max(1, block_n // sub)
    n_sub = nn * spt
    if spheres is None:
        sc, sr2 = leaf_block_spheres(centers, normals, radii, sub)
    else:
        sc, sr2 = spheres
    sc = jnp.pad(sc, ((0, n_sub - sc.shape[0]), (0, 0)), constant_values=1e17)
    sr2 = jnp.pad(sr2, (0, n_sub - sr2.shape[0]), constant_values=0.0)
    return jnp.concatenate(
        [sc.T, sr2[None, :], jnp.zeros((3, n_sub), sc.dtype)], axis=0
    )


def instanced_sphere_operands(canonical_spheres, offsets, nc,
                              block_n=_BLOCK_N, spt=None):
    """Virtual-block prefetch operand for instanced sweeps: I * nc * spt
    sub-sphere columns; tile j = (instance j // nc, canonical block
    j % nc), its spt sub-spheres at columns j*spt + k, each the
    canonical sub-sphere translated by the instance offset (offset rows
    carry the translation). ``spt=1`` (canonical spheres at block
    granularity) reproduces the single-level round-2 culling."""
    if spt is None:
        sub = min(_SUB, block_n)
        spt = max(1, block_n // sub)
    nc_sub = nc * spt
    sc, sr2 = canonical_spheres
    sc = jnp.pad(
        sc, ((0, nc_sub - sc.shape[0]), (0, 0)), constant_values=1e17
    )
    sr2 = jnp.pad(sr2, (0, nc_sub - sr2.shape[0]), constant_values=0.0)
    I = offsets.shape[0]
    centers_v = (sc[None, :, :] + offsets[:, None, :]).reshape(I * nc_sub, 3)
    sr2_v = jnp.broadcast_to(sr2[None, :], (I, nc_sub)).reshape(I * nc_sub)
    off_v = jnp.broadcast_to(
        offsets[:, None, :], (I, nc_sub, 3)
    ).reshape(I * nc_sub, 3)
    return jnp.concatenate(
        [centers_v.T, sr2_v[None, :], off_v.T], axis=0
    )


def ray_leaves_nearest_pallas(
    p, d, t_max, centers, normals, radii,
    spheres=None,
    block_b: int = _BLOCK_B,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    """Nearest leaf-disk hit. Returns (t_hit [B], normal [B, 3], hit [B]).

    Matches :func:`eradiate_tpu.ops.canopy.ray_leaves_nearest` semantics
    (misses keep t_hit == t_max; exact-tie normals averaged). ``spheres``
    optionally passes precomputed ``leaf_block_spheres`` for ``block_n``.
    """
    B = p.shape[0]
    rays, leaves, nb, nn, Bp = _pad_inputs(
        p, d, t_max, centers, normals, radii, block_b, block_n
    )
    sph = _sphere_operands(centers, normals, radii, spheres, block_n, nn)
    spt = max(1, block_n // _SUB)
    csph = _coarse_from_subs(sph, nn, spt)

    # lane operands as [Bp, 1] columns (native broadcast in the kernels;
    # 1D T(1024) operands pay a relayout per broadcast per tile)
    rays = [x[:, None] for x in rays]
    ray_spec = pl.BlockSpec((block_b, 1), lambda i, j, csph, sph: (i, 0))
    leaf_spec = pl.BlockSpec((block_n,), lambda i, j, csph, sph: (j,))
    out_spec = pl.BlockSpec((block_b, 1), lambda i, j, csph, sph: (i, 0))

    best_t, bn_x, bn_y, bn_z = pl.pallas_call(
        functools.partial(
            _kernel_nearest, spt=spt, sub=min(_SUB, block_n)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, nn),
            in_specs=[ray_spec] * 7 + [leaf_spec] * 7,
            out_specs=(out_spec,) * 4,
        ),
        out_shape=(jax.ShapeDtypeStruct((Bp, 1), p.dtype),) * 4,
        # tile temporaries exceed the default 16 MB scoped-VMEM budget at
        # 1024x1024 blocks; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(csph, sph, *rays, *leaves)

    best_t, bn_x, bn_y, bn_z = (
        best_t[:, 0], bn_x[:, 0], bn_y[:, 0], bn_z[:, 0]
    )
    best_t = best_t[:B]
    hit = best_t < t_max
    n = jnp.stack([bn_x[:B], bn_y[:B], bn_z[:B]], axis=-1)
    return jnp.where(hit, best_t, t_max), n, hit


def ray_leaves_occluded_pallas(
    p, d, t_max, centers, normals, radii,
    spheres=None,
    block_b: int = _BLOCK_B,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    """True where any leaf blocks the segment (NEE shadow rays)."""
    B = p.shape[0]
    rays, leaves, nb, nn, Bp = _pad_inputs(
        p, d, t_max, centers, normals, radii, block_b, block_n
    )
    sph = _sphere_operands(centers, normals, radii, spheres, block_n, nn)
    spt = max(1, block_n // _SUB)
    csph = _coarse_from_subs(sph, nn, spt)

    rays = [x[:, None] for x in rays]
    ray_spec = pl.BlockSpec((block_b, 1), lambda i, j, csph, sph: (i, 0))
    leaf_spec = pl.BlockSpec((block_n,), lambda i, j, csph, sph: (j,))
    out_spec = pl.BlockSpec((block_b, 1), lambda i, j, csph, sph: (i, 0))

    occ = pl.pallas_call(
        functools.partial(
            _kernel_occluded, spt=spt, sub=min(_SUB, block_n)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, nn),
            in_specs=[ray_spec] * 7 + [leaf_spec] * 7,
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(csph, sph, *rays, *leaves)
    return occ[:B, 0] > 0.5


# ---------------------------------------------------------------------------
# Instanced (virtual-block) sweeps: the canonical leaf table is stored ONCE;
# the leaf-tile axis runs over I x nc virtual blocks whose index map selects
# canonical block (j % nc) while the prefetch operand carries the instance
# translation (VERDICT r1, Missing #4: keep instances as instances — HBM
# leaf storage shrinks by the instance count, tile count stays the same as
# the equivalent flattened sweep).


def _instanced_call(kernel, n_out, p, d, t_max, leaves, offsets, spheres,
                    block_b, block_n, interpret, sub_cull=False):
    B = p.shape[0]
    centers, normals, radii = leaves
    rays, leaf_ops, nb, nc, Bp = _pad_inputs(
        p, d, t_max, centers, normals, radii, block_b, block_n
    )
    if spheres is None:
        spheres = leaf_block_spheres(
            centers, normals, radii, min(_SUB, block_n)
        )
    sub = min(_SUB, block_n) if sub_cull else block_n
    spt = max(1, block_n // sub)
    if not sub_cull and spheres[0].shape[0] > -(-centers.shape[0] // block_n):
        # block-level culling requested: tight block spheres directly
        # from the canonical leaves (tighter than merging fine spheres)
        spheres = leaf_block_spheres(centers, normals, radii, block_n)
    sph = instanced_sphere_operands(spheres, offsets, nc, block_n if sub_cull else None, spt=spt)
    I = offsets.shape[0]
    nn = I * nc
    csph = _coarse_from_subs(sph, nn, spt)

    rays = [x[:, None] for x in rays]
    ray_spec = pl.BlockSpec((block_b, 1), lambda i, j, csph, sph: (i, 0))
    leaf_spec = pl.BlockSpec((block_n,), lambda i, j, csph, sph: (j % nc,))
    out_spec = pl.BlockSpec((block_b, 1), lambda i, j, csph, sph: (i, 0))

    out = pl.pallas_call(
        functools.partial(kernel, spt=spt, sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb, nn),
            in_specs=[ray_spec] * 7 + [leaf_spec] * 7,
            out_specs=(out_spec,) * n_out if n_out > 1 else out_spec,
        ),
        out_shape=(
            (jax.ShapeDtypeStruct((Bp, 1), p.dtype),) * n_out
            if n_out > 1
            else jax.ShapeDtypeStruct((Bp, 1), jnp.float32)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(csph, sph, *rays, *leaf_ops)
    out = (
        tuple(o[:, 0] for o in out) if n_out > 1 else out[:, 0]
    )
    return out, B


def ray_leaves_nearest_instanced_pallas(
    p, d, t_max, centers, normals, radii, offsets,
    spheres=None, block_b: int = _BLOCK_B, block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    """Nearest hit against the union of translated canonical-cloud
    instances; same contract as :func:`ray_leaves_nearest_pallas`."""
    (best_t, bn_x, bn_y, bn_z), B = _instanced_call(
        _kernel_nearest, 4, p, d, t_max, (centers, normals, radii),
        offsets, spheres, block_b, block_n, interpret,
    )
    best_t = best_t[:B]
    hit = best_t < t_max
    n = jnp.stack([bn_x[:B], bn_y[:B], bn_z[:B]], axis=-1)
    return jnp.where(hit, best_t, t_max), n, hit


def ray_leaves_occluded_instanced_pallas(
    p, d, t_max, centers, normals, radii, offsets,
    spheres=None, block_b: int = _BLOCK_B, block_n: int = _BLOCK_N,
    interpret: bool = False,
):
    occ, B = _instanced_call(
        _kernel_occluded, 1, p, d, t_max, (centers, normals, radii),
        offsets, spheres, block_b, block_n, interpret,
    )
    return occ[:B] > 0.5
