"""Triangle-mesh Pallas kernels vs the XLA Moller-Trumbore sweeps
(interpret mode on CPU; the production dispatch in ops/mesh.py routes to
them on TPU/f32)."""

import jax.numpy as jnp
import numpy as np

from eradiate_tpu.ops.mesh import (
    TriangleMeshArrays,
    ray_tris_nearest,
    ray_tris_occluded,
    tri_nearest,
    tri_occluded,
)
from eradiate_tpu.ops.pallas.tri_intersect import (
    ray_tris_nearest_pallas,
    ray_tris_occluded_pallas,
)


def make_problem(B=700, N=900, seed=2):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-0.02, 0.02, (N, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.001, (N, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.001, (N, 3)).astype(np.float32)
    tris = TriangleMeshArrays(
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
    )
    p = rng.uniform(-0.03, 0.03, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full(B, 0.1, dtype=np.float32)
    return tris, jnp.asarray(p), jnp.asarray(d), jnp.asarray(t_max)


class TestTriIntersectPallas:
    def test_matches_xla_reference(self):
        tris, p, d, t_max = make_problem()
        t_ref, n_ref, hit_ref = ray_tris_nearest(p, d, t_max, tris)
        t_pl, n_pl, hit_pl = ray_tris_nearest_pallas(
            p, d, t_max, tris.v0, tris.e1, tris.e2,
            block_b=256, block_n=256, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(hit_pl), np.asarray(hit_ref))
        both = np.asarray(hit_pl) & np.asarray(hit_ref)
        np.testing.assert_allclose(
            np.asarray(t_pl)[both], np.asarray(t_ref)[both], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(n_pl)[both], np.asarray(n_ref)[both], atol=1e-5
        )

        occ_ref = ray_tris_occluded(p, d, t_max, tris)
        occ_pl = ray_tris_occluded_pallas(
            p, d, t_max, tris.v0, tris.e1, tris.e2,
            block_b=256, block_n=256, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(occ_pl), np.asarray(occ_ref))

    def test_dispatch_cpu_advance_consistent(self):
        # the public dispatchers apply the AABB origin advance; on CPU they
        # must agree with the raw sweeps (distances re-offset by t0)
        tris, p, d, t_max = make_problem(B=300, N=200, seed=5)
        t_ref, _, hit_ref = ray_tris_nearest(p, d, t_max, tris)
        t_dsp, _, hit_dsp = tri_nearest(p, d, t_max, tris)
        np.testing.assert_array_equal(np.asarray(hit_dsp), np.asarray(hit_ref))
        both = np.asarray(hit_dsp) & np.asarray(hit_ref)
        np.testing.assert_allclose(
            np.asarray(t_dsp)[both], np.asarray(t_ref)[both],
            rtol=1e-4, atol=1e-6,
        )
        occ_ref = ray_tris_occluded(p, d, t_max, tris)
        occ_dsp = tri_occluded(p, d, t_max, tris)
        np.testing.assert_array_equal(np.asarray(occ_dsp), np.asarray(occ_ref))
