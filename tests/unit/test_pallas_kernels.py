"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.ops.canopy import (
    LeafCloudArrays,
    ray_leaves_nearest,
    ray_leaves_occluded,
)
from eradiate_tpu.ops.pallas.leaf_intersect import (
    ray_leaves_nearest_pallas,
    ray_leaves_occluded_pallas,
)


def make_problem(B=100, N=300, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    p[:, 2] = 2.0  # above the cloud
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3  # downward
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full(B, 10.0, dtype=np.float32)
    centers = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    normals = rng.normal(size=(N, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    radii = rng.uniform(0.05, 0.2, N).astype(np.float32)
    return p, d, t_max, centers, normals, radii


class TestLeafIntersectPallas:
    def test_matches_xla_reference(self):
        p, d, t_max, centers, normals, radii = make_problem()
        leaves = LeafCloudArrays(
            centers=jnp.asarray(centers),
            normals=jnp.asarray(normals),
            radii=jnp.asarray(radii),
        )
        t_ref, n_ref, hit_ref = ray_leaves_nearest(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max), leaves
        )
        t_pl, n_pl, hit_pl = ray_leaves_nearest_pallas(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(centers), jnp.asarray(normals), jnp.asarray(radii),
            block_b=32, block_n=64, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(hit_pl), np.asarray(hit_ref))
        np.testing.assert_allclose(
            np.asarray(t_pl), np.asarray(t_ref), rtol=1e-5
        )
        got = np.where(
            np.asarray(hit_pl)[:, None], np.asarray(n_pl), np.asarray(n_ref)
        )
        np.testing.assert_allclose(got, np.asarray(n_ref), rtol=1e-5)

        occ_ref = ray_leaves_occluded(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max), leaves
        )
        occ_pl = ray_leaves_occluded_pallas(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(centers), jnp.asarray(normals), jnp.asarray(radii),
            block_b=32, block_n=64, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(occ_pl), np.asarray(occ_ref)
        )

    def test_all_miss(self):
        p, d, t_max, centers, normals, radii = make_problem(B=16, N=32)
        d = np.zeros_like(d)
        d[:, 2] = 1.0  # upward: nothing above
        t_pl, _, hit_pl = ray_leaves_nearest_pallas(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(centers), jnp.asarray(normals), jnp.asarray(radii),
            block_b=8, block_n=16, interpret=True,
        )
        assert not np.any(np.asarray(hit_pl))
        np.testing.assert_allclose(np.asarray(t_pl), t_max)

    def test_nonmultiple_sizes(self):
        p, d, t_max, centers, normals, radii = make_problem(B=37, N=53)
        leaves = LeafCloudArrays(
            centers=jnp.asarray(centers),
            normals=jnp.asarray(normals),
            radii=jnp.asarray(radii),
        )
        t_ref, _, hit_ref = ray_leaves_nearest(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max), leaves
        )
        t_pl, _, hit_pl = ray_leaves_nearest_pallas(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max),
            jnp.asarray(centers), jnp.asarray(normals), jnp.asarray(radii),
            block_b=16, block_n=32, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(hit_pl), np.asarray(hit_ref))
        np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_ref), rtol=1e-5)


class TestCollisionFetchPallas:
    """Experimental fused search+fetch kernel (interpret mode on CPU)."""

    def test_matches_searchsorted_gather(self):
        from eradiate_tpu.ops.pallas.collision_fetch import (
            collision_fetch_pallas,
        )

        L = 300
        key = jax.random.key(0)
        tau = jnp.concatenate(
            [jnp.zeros(1),
             jnp.cumsum(jnp.abs(jax.random.normal(key, (L,))) * 1e-3)]
        )
        stacked = jax.random.normal(jax.random.key(1), (L + 1, 6))
        q = jax.random.uniform(jax.random.key(2), (1000,)) * float(tau[-1])
        out, idx = collision_fetch_pallas(
            q, tau, stacked, block_b=256, interpret=True
        )
        idx_ref = np.clip(
            np.searchsorted(np.asarray(tau), np.asarray(q), side="right") - 1,
            0, L - 1,
        )
        np.testing.assert_array_equal(np.asarray(idx), idx_ref)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(stacked)[idx_ref], rtol=2e-4, atol=1e-5
        )
