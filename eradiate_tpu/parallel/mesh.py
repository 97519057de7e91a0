"""Multi-device sharded rendering.

The reference has **no distributed backend** (SURVEY §2.1: C++ thread pool
over image blocks only; the spectral loop is serial Python). The TPU build
creates the distributed layer from scratch: the {spectral index x sample}
workload is laid out on a 2D device mesh

    ("spectral", "sample")

- the **spectral axis** shards the per-(bin, g) medium tables and
  accumulators — embarrassingly parallel, no collectives beyond the final
  gather implied by the output sharding;
- the **sample axis** replicates the scene and splits the sample budget;
  per-device sample streams derive from ``axis_index`` folds of the
  deterministic threefry root (results are invariant to device count only
  in distribution, and bit-exact for a fixed mesh shape + seed);
  radiance/m2 accumulators reduce with ``psum`` over ICI.

``jax.shard_map`` + ``NamedSharding`` let XLA insert the collectives
(scaling-book recipe); the tracer body is the same single-chip function.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.scene_state import IlluminationArrays, MediumArrays, SurfaceArrays
from ..ops.tracer import render_batch_impl

__all__ = ["make_render_mesh", "render_sharded", "render_spherical_sharded"]


def make_render_mesh(n_spectral: int = 1, n_sample: int | None = None, devices=None):
    """Create a ("spectral", "sample") mesh over available devices."""
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_sample is None:
        n_sample = n_dev // n_spectral
    if n_spectral * n_sample != n_dev:
        raise ValueError(
            f"mesh {n_spectral}x{n_sample} does not cover {n_dev} devices"
        )
    import numpy as np

    dev_array = np.asarray(devices).reshape(n_spectral, n_sample)
    return Mesh(dev_array, ("spectral", "sample"))


def _scene_specs(scene):
    """PartitionSpecs: spectral-leading arrays shard over 'spectral'."""
    med = MediumArrays(
        z_levels=P(),
        tau_levels=P("spectral"),
        albedo=P("spectral"),
        phase_weights=P("spectral"),
        phase_params=jax.tree_util.tree_map(
            lambda _: P("spectral"), scene.medium.phase_params
        ),
    )
    surf = SurfaceArrays(
        params=jax.tree_util.tree_map(lambda _: P("spectral"), scene.surface.params)
    )
    illum = IlluminationArrays(
        direction=P(),
        irradiance=P("spectral"),
        cos_cutoff=P(),
        sky_radiance=P("spectral")
        if getattr(scene.illumination.sky_radiance, "ndim", 0)
        else P(),
    )
    return med, surf, illum


def render_sharded(
    scene,
    sensor,
    config,
    spp: int,
    seed: int = 0,
    mesh: Mesh | None = None,
):
    """Render with the {spectral x sample} workload sharded over ``mesh``.

    ``spp`` is the *total* sample budget; each device on the sample axis
    traces ``spp / n_sample`` samples. The spectral axis size must divide S.
    Returns the same result dict as :func:`eradiate_tpu.ops.tracer.render`.
    """
    if mesh is None:
        mesh = make_render_mesh(1, len(jax.devices()))
    n_sample = mesh.shape["sample"]
    n_spectral = mesh.shape["spectral"]
    S = scene.medium.tau_levels.shape[0]
    if S % n_spectral != 0:
        raise ValueError(f"spectral batch {S} not divisible by mesh axis {n_spectral}")
    if spp % n_sample != 0:
        raise ValueError(f"spp {spp} not divisible by sample axis {n_sample}")
    spp_local = spp // n_sample

    directions = jnp.asarray(sensor.directions)
    n_pix = directions.shape[0]
    target = jnp.asarray(sensor.target)
    ray_offset = jnp.asarray(sensor.ray_offset)
    target_extent = (
        None if sensor.target_extent is None else jnp.asarray(sensor.target_extent)
    )

    base_key = jax.random.key(seed)
    row_keys = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(base_key, (S,)), jnp.arange(S)
    )

    med_specs, surf_specs, illum_specs = _scene_specs(scene)
    sensor_specs = jax.tree_util.tree_map(
        lambda _: P(), (target, ray_offset, target_extent)
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(med_specs, surf_specs, illum_specs, P(), P("spectral"))
        + (sensor_specs,),
        out_specs=(P("spectral"), P("spectral")),
        check_vma=False,
    )
    def shard_fn(medium, surface, illum, dirs, keys, sensor_args):
        tgt, roff, ext = sensor_args
        # per-sample-shard key stream
        sample_idx = jax.lax.axis_index("sample")
        local_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, sample_idx)
        )(keys)
        rad, m2 = render_batch_impl(
            config, n_pix, spp_local, medium, surface, illum, dirs, local_keys,
            tgt, roff, ext,
        )
        # average the per-device estimates over the sample axis (each traced
        # spp_local samples -> equal weights)
        rad = jax.lax.pmean(rad, "sample")
        m2 = jax.lax.pmean(m2, "sample")
        return rad, m2

    fn = jax.jit(shard_fn)
    rad, m2 = fn(
        scene.medium, scene.surface, scene.illumination, directions, row_keys,
        (target, ray_offset, target_extent),
    )
    return {"radiance": rad, "m2": m2, "spp": spp}


def render_spherical_sharded(
    medium,
    surface,
    illum,
    sensor,
    config,
    spp: int,
    seed: int = 0,
    max_iterations: int = 512,
    mesh: Mesh | None = None,
):
    """Spherical-shell analog of :func:`render_sharded`: the {spectral x
    sample} workload of :func:`eradiate_tpu.ops.tracer_spherical.render_spherical`
    laid out on the same 2D device mesh (shell tables shard over
    'spectral'; the sample axis splits the budget with ``axis_index``-folded
    key streams and ``pmean``-reduced accumulators)."""
    from ..ops.tracer_spherical import (
        SphericalMediumArrays,
        render_batch_spherical_impl,
    )

    if mesh is None:
        mesh = make_render_mesh(1, len(jax.devices()))
    n_sample = mesh.shape["sample"]
    n_spectral = mesh.shape["spectral"]
    S = medium.sigma_t.shape[0]
    if S % n_spectral != 0:
        raise ValueError(
            f"spectral batch {S} not divisible by mesh axis {n_spectral}"
        )
    if spp % n_sample != 0:
        raise ValueError(f"spp {spp} not divisible by sample axis {n_sample}")
    spp_local = spp // n_sample

    directions = jnp.asarray(sensor.directions)
    n_pix = directions.shape[0]
    target = jnp.asarray(sensor.target)

    base_key = jax.random.key(seed)
    row_keys = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(base_key, (S,)), jnp.arange(S)
    )

    med_specs = SphericalMediumArrays(
        radii=P(),
        sigma_t=P("spectral"),
        sigma_majorant=P("spectral"),
        albedo=P("spectral"),
        phase_weights=P("spectral"),
        phase_params=jax.tree_util.tree_map(
            lambda _: P("spectral"), medium.phase_params
        ),
    )
    surf_specs = SurfaceArrays(
        params=jax.tree_util.tree_map(lambda _: P("spectral"), surface.params)
    )
    illum_specs = IlluminationArrays(
        direction=P(),
        irradiance=P("spectral"),
        cos_cutoff=P(),
        sky_radiance=P("spectral")
        if getattr(illum.sky_radiance, "ndim", 0)
        else P(),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(med_specs, surf_specs, illum_specs, P(), P("spectral"), P()),
        out_specs=(P("spectral"), P("spectral")),
        check_vma=False,
    )
    def shard_fn(med, surf, ill, dirs, keys, tgt):
        sample_idx = jax.lax.axis_index("sample")
        local_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, sample_idx)
        )(keys)
        rad, m2 = render_batch_spherical_impl(
            config, n_pix, spp_local, max_iterations, med, surf, ill, dirs,
            tgt, local_keys,
        )
        rad = jax.lax.pmean(rad, "sample")
        m2 = jax.lax.pmean(m2, "sample")
        return rad, m2

    rad, m2 = jax.jit(shard_fn)(
        medium, surface, illum, directions, row_keys, target
    )
    return {"radiance": rad, "m2": m2, "spp": spp}
