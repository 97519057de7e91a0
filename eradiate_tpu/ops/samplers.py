"""Sample generators (reference Mitsuba samplers: ``independent``,
``stratified``, ``multijitter``, ``orthogonal``, ``ldsampler``;
``scenes/measure/_core.py:142-154``).

TPU-native design: the reference's samplers are stateful per-pixel streams
(PCG32) feeding every MC decision. Here all secondary decisions come from
counter-based threefry keys (deterministic under resharding); the sampler
kind controls the **primary sample dimension** — the first collision
distance, which dominates estimator variance for distant radiometer banks.
Stratifying path-dependent dimensions beyond the first has vanishing effect
(paths diverge after one event), so the TPU build spends its structure where
it pays: the first flight.

All generators return ``u`` in [0, 1) of shape ``[spp]`` (per pixel), to be
broadcast across pixels with per-pixel decorrelation (Cranley-Patterson
rotation by a per-pixel uniform offset).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["SAMPLER_KINDS", "primary_samples"]

SAMPLER_KINDS = (
    "independent",
    "stratified",
    "multijitter",
    "orthogonal",
    "ldsampler",
)


def _radical_inverse_base2(i):
    """Van der Corput sequence: bit-reversed integers mapped to [0, 1)."""
    i = i.astype(jnp.uint32)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    i = (i << 16) | (i >> 16)
    return i.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)  # 2^-32


def primary_samples(kind: str, spp: int, key):
    """Primary-dimension samples for one pixel: ``u`` [spp] in [0, 1).

    - ``independent``: iid uniforms.
    - ``stratified``: one jittered sample per stratum ``[k/spp, (k+1)/spp)``.
    - ``multijitter``: stratified with sub-stratum jitter correlation
      (Chiu-Shirley-Wang); its 1D projection is stratified with a shared
      sub-offset permutation.
    - ``orthogonal``: orthogonal-array sampling; 1D projection likewise
      stratified (strength-2 OA guarantees 1D stratification by
      construction), realized as a random-permutation stratified set.
    - ``ldsampler``: low-discrepancy van der Corput (base 2) points.

    Per-pixel decorrelation (rotation/scramble) is the caller's job — fold
    the pixel index into ``key`` before calling.
    """
    if kind == "independent":
        return jax.random.uniform(key, (spp,))
    idx = jnp.arange(spp)
    if kind == "stratified":
        jitter = jax.random.uniform(key, (spp,))
        return (idx + jitter) / spp
    if kind == "multijitter":
        # correlated multi-jitter 1D projection: stratified strata with a
        # permuted sub-stratum offset + fine jitter
        k_perm, k_jit = jax.random.split(key)
        sub = jax.random.permutation(k_perm, spp)
        jitter = jax.random.uniform(k_jit, (spp,))
        return (idx + (sub + jitter) / spp) / spp
    if kind == "orthogonal":
        # strength-2 OA 1D projection: randomly permuted stratified set
        k_perm, k_jit = jax.random.split(key)
        perm = jax.random.permutation(k_perm, spp)
        jitter = jax.random.uniform(k_jit, (spp,))
        return (perm + jitter) / spp
    if kind == "ldsampler":
        # van der Corput with a Cranley-Patterson rotation from the key
        shift = jax.random.uniform(key, ())
        return (_radical_inverse_base2(idx) + shift) % 1.0
    raise ValueError(f"unsupported sampler kind '{kind}'")
