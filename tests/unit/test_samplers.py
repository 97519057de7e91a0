"""Unit tests: sample generators (reference sampler plugins
``independent``/``stratified``/``multijitter``/``orthogonal``/``ldsampler``,
``scenes/measure/_core.py:142-154``)."""

import jax
import numpy as np
import pytest

from eradiate_tpu.ops.samplers import SAMPLER_KINDS, primary_samples


@pytest.mark.parametrize("kind", SAMPLER_KINDS)
def test_samples_in_unit_interval(kind):
    u = np.asarray(primary_samples(kind, 64, jax.random.key(0)))
    assert u.shape == (64,)
    assert (u >= 0.0).all() and (u < 1.0).all()


@pytest.mark.parametrize("kind", ["stratified", "multijitter", "ldsampler"])
def test_strata_occupancy_exact(kind):
    """Each of the spp strata contains exactly one point (the defining
    property of stratified/CMJ sets; base-2 VdC with spp=2^k likewise)."""
    spp = 32
    u = np.asarray(primary_samples(kind, spp, jax.random.key(1)))
    strata = np.floor(u * spp).astype(int)
    assert sorted(strata) == list(range(spp))


def test_orthogonal_covers_strata():
    spp = 16
    u = np.asarray(primary_samples("orthogonal", spp, jax.random.key(2)))
    strata = np.floor(u * spp).astype(int)
    assert sorted(strata) == list(range(spp))


@pytest.mark.parametrize("kind", SAMPLER_KINDS)
def test_mean_near_half(kind):
    u = np.asarray(primary_samples(kind, 1024, jax.random.key(3)))
    tol = 0.05 if kind == "independent" else 0.01
    assert abs(u.mean() - 0.5) < tol


def test_keys_decorrelate():
    a = np.asarray(primary_samples("stratified", 16, jax.random.key(0)))
    b = np.asarray(primary_samples("stratified", 16, jax.random.key(1)))
    assert not np.allclose(a, b)


def test_ldsampler_discrepancy_beats_random():
    """Star discrepancy proxy: max |ecdf - u| is much smaller for the LD
    set than iid uniforms at the same count."""

    def d_star(u):
        u = np.sort(u)
        n = len(u)
        k = np.arange(1, n + 1)
        return np.maximum(k / n - u, u - (k - 1) / n).max()

    n = 256
    ld = np.asarray(primary_samples("ldsampler", n, jax.random.key(4)))
    iid = np.asarray(primary_samples("independent", n, jax.random.key(4)))
    assert d_star(ld) < d_star(iid) / 3


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        primary_samples("sobolol", 8, jax.random.key(0))
