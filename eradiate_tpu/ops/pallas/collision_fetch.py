"""Pallas kernel: fused cumulative-τ inversion + per-layer table fetch.

EXPERIMENTAL — measured *slower* than the XLA one-hot matmul it was meant
to replace (166 vs 93 µs/iter at B=16k, L=1200 on v5e), so the tracers
keep ``ops/medium.collision_fetch``. Kept as a tested reference point for
the VMEM-resident formulation (and because the attempt surfaced a real
pitfall, see below). Hypothesis going in: XLA materializes the [B, L]
one-hot mask to HBM because it fuses into dot outputs but not dot
operands; a VMEM-resident kernel should beat it. In practice the Mosaic
lowering of the per-block [TB, L] compare + dot did not outperform XLA's
pipeline on this shape.

Pitfall worth keeping on record: the hi/lo bf16 split (``lo = x -
f32(bf16(x))``) silently collapsed to ``lo = 0`` when feeding a
``pallas_call`` under ``--xla_allow_excess_precision`` (the bf16→f32
round-trip was elided); an ``optimization_barrier`` on ``hi`` restores it.
The XLA-dot path in ``ops/medium`` is measured unaffected (4e-6 relative),
but any future rearrangement of hi/lo code should re-verify on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["collision_fetch_pallas"]


def _kernel(tau_q, tau_levels, hi, lo, out, idx_out, *, idx_max, k):
    tq = tau_q[:]  # [TB]
    tb = tq.shape[0]
    lv = tau_levels[:]  # [n_levels] VMEM-resident
    n_levels = lv.shape[0]

    # pass 1: bracketing index via compare-count (mask lives in VMEM only)
    leq = lv[None, :] <= tq[:, None]  # [TB, n_levels]
    idx = jnp.clip(
        jnp.sum(leq.astype(jnp.int32), axis=1) - 1, 0, idx_max
    )
    idx_out[:] = idx

    # pass 2: one-hot fetch on the MXU. hi/lo bf16 recovers ~f32; the two
    # passes ride ONE dot over row-concatenated [hi; lo] with a duplicated
    # one-hot (a separate hi-dot + lo-dot was observed to lose the lo
    # residual under Mosaic with --xla_allow_excess_precision)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, n_levels), 1)
    oh = (iota == idx[:, None]).astype(jnp.bfloat16)  # exact 0/1
    oh2 = jnp.concatenate([oh, oh], axis=1)  # [TB, 2 n_levels]
    hl = jnp.concatenate([hi[:], lo[:]], axis=0)  # [2 n_levels, K]
    out[:] = jnp.dot(oh2, hl, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block_b", "n_chunk", "interpret")
)
def collision_fetch_pallas(
    tau_q, tau_levels, stacked, block_b: int = 1024, n_chunk: int = 128,
    interpret: bool = False,
):
    """Fused search+fetch: returns (out [B, K] f32, idx [B] int32) with
    ``out[b] = stacked[idx[b]]`` and ``idx = searchsorted_leq(tau_levels,
    tau_q)``.

    ``tau_levels`` [L+1] ascending; ``stacked`` [L+1, K] per-level rows
    (callers put per-layer tables in rows 0..L-1; row L is read only when
    idx == L-1 never — see medium.collision_fetch). Shapes are padded to
    block multiples internally.
    """
    B = tau_q.shape[0]
    Lp1, K = stacked.shape

    # pad levels so the chunk loop divides evenly; padding levels at +inf
    # never satisfies (level <= tau) and fetches zeros
    n_levels = ((Lp1 + n_chunk - 1) // n_chunk) * n_chunk
    pad_l = n_levels - Lp1
    tau_pad = jnp.pad(tau_levels, (0, pad_l), constant_values=jnp.inf)
    stacked_pad = jnp.pad(stacked, ((0, pad_l), (0, 0)))
    hi = jax.lax.optimization_barrier(stacked_pad.astype(jnp.bfloat16))
    lo = (stacked_pad - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    pad_b = (-B) % block_b
    tq = jnp.pad(tau_q, (0, pad_b))
    n_blocks = (B + pad_b) // block_b

    out, idx = pl.pallas_call(
        functools.partial(_kernel, idx_max=Lp1 - 2, k=K),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_b,), lambda i: (i,)),
            pl.BlockSpec((n_levels,), lambda i: (0,)),
            pl.BlockSpec((n_levels, K), lambda i: (0, 0)),
            pl.BlockSpec((n_levels, K), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, K), lambda i: (i, 0)),
            pl.BlockSpec((block_b,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B + pad_b, K), jnp.float32),
            jax.ShapeDtypeStruct((B + pad_b,), jnp.int32),
        ],
        interpret=interpret,
    )(tq, tau_pad, hi, lo)
    return out[:B], idx[:B]
