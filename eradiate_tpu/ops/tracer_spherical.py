"""Wavefront path tracer — spherical-shell geometry.

Curved-shell counterpart of :mod:`eradiate_tpu.ops.tracer` (BASELINE
config 4; reference: ``sphericalcoordsvolume`` + ``heterogeneous`` medium,
SURVEY §2.1). Free flight uses **null-collision delta tracking** against a
per-spectral-row majorant (the radial sigma profile is strongly
stratified, so tentative events are cheap constant-time radius lookups),
and next-event estimation uses the precomputed Chapman-style slant
optical-depth table (:func:`eradiate_tpu.ops.spherical.sun_tau_table`) —
deterministic sun transmittance without per-event shell marching.

Null collisions are folded into the main while-loop: an iteration is one
tentative event; only accepted collisions advance the scatter depth. The
loop is bounded by ``config.max_depth`` real scatters times an expected
null-event budget.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from .bsdf_ops import bsdf_eval, bsdf_sample
from .medium import fetch_at_index, searchsorted_leq
from .phase_ops import (
    layer_param_slots,
    ortho_frame,
    phase_eval_at,
    phase_sample_at,
    rebuild_fetched,
)
from .scene_state import SensorArrays, SurfaceArrays, IlluminationArrays, SceneConfig, _pytree_dataclass
from .spherical import lookup_sun_tau, ray_sphere_intersect

__all__ = ["SphericalMediumArrays", "render_spherical"]


@_pytree_dataclass
class SphericalMediumArrays:
    """Radially-stratified medium, spectrally batched."""

    radii: Any  # [L+1] shell boundary radii (ascending, from planet center)
    sigma_t: Any  # [S, L]
    sigma_majorant: Any  # [S]
    albedo: Any  # [S, L]
    phase_weights: Any  # [S, C, L]
    phase_params: Any
    sun_tau: Any  # [S, L+1, M] slant optical depth to the sun
    mu_grid: Any  # [M]


def _to_local(n, v):
    """World vector -> local frame with +z = n."""
    t1, t2 = ortho_frame(n)
    return jnp.stack(
        [
            jnp.sum(t1 * v, axis=-1),
            jnp.sum(t2 * v, axis=-1),
            jnp.sum(n * v, axis=-1),
        ],
        axis=-1,
    )


def _to_world(n, v):
    t1, t2 = ortho_frame(n)
    return (
        t1 * v[..., 0:1] + t2 * v[..., 1:2] + n * v[..., 2:3]
    )


def trace_paths_spherical(
    config: SceneConfig,
    medium_row,
    surface_row,
    illum_row,
    init_p,
    init_d,
    keys,
    max_iterations: int,
):
    radii = medium_row.radii
    r_ground = radii[0]
    r_top = radii[-1]
    sigma_maj = jnp.maximum(medium_row.sigma_majorant, 1e-12)

    d_sun = illum_row.direction
    w_sun = -d_sun
    E_sun = illum_row.irradiance

    B = init_p.shape[0]
    eps_t = 1e-4  # km; surface offset to avoid self-intersection

    def sun_T(p):
        r = jnp.linalg.norm(p, axis=-1)
        n = p / jnp.maximum(r[..., None], 1e-12)
        mu = jnp.sum(n * w_sun, axis=-1)
        tau = lookup_sun_tau(
            medium_row.sun_tau, radii, medium_row.mu_grid, r, mu
        )
        return jnp.exp(-jnp.minimum(tau, 80.0))

    def body(carry):
        it, p, d, beta, L, alive, depth, keys = carry

        k_iter = jax.vmap(jax.random.fold_in)(keys, jnp.full(B, it))
        ks = jax.vmap(lambda k: jax.random.split(k, 5))(k_iter)
        k_dist, k_acc, k_scat, k_srf, k_rr = (
            ks[:, 0],
            ks[:, 1],
            ks[:, 2],
            ks[:, 3],
            ks[:, 4],
        )

        # distance to boundaries
        tgn, tgf, hit_g = ray_sphere_intersect(p, d, r_ground)
        t_ground = jnp.where(
            hit_g & (tgn > eps_t),
            tgn,
            jnp.where(hit_g & (tgf > eps_t) & (tgn <= eps_t) & (jnp.sum(p * p, -1) < r_ground**2), tgf, jnp.inf),
        )
        _, ttf, _ = ray_sphere_intersect(p, d, r_top)
        t_exit = jnp.maximum(ttf, eps_t)
        t_max = jnp.minimum(t_ground, t_exit)

        u = jax.vmap(jax.random.uniform)(k_dist)
        dt = -jnp.log1p(-u) / sigma_maj
        boundary = dt >= t_max
        t_step = jnp.minimum(dt, t_max)
        p_new = p + d * t_step[:, None]

        hit_surface = boundary & (t_ground <= t_exit) & config.has_surface

        # ---- tentative collision ---------------------------------------
        # dense layer search + ONE fused one-hot fetch for all per-layer
        # data (sigma, albedo, blend weights, layer-indexed phase params)
        # — see ops/medium.fetch_at_index
        r_new = jnp.linalg.norm(p_new, axis=-1)
        layer = searchsorted_leq(radii, r_new)
        C = len(config.phase_kinds)
        param_tables, param_slots = layer_param_slots(
            config.phase_kinds, medium_row.phase_params
        )
        fetched = fetch_at_index(
            layer,
            [medium_row.sigma_t, medium_row.albedo]
            + [medium_row.phase_weights[c] for c in range(C)]
            + param_tables,
        )
        sigma_here, albedo_col = fetched[0], fetched[1]
        weights_at = jnp.stack(fetched[2 : 2 + C], axis=-1)
        params_at = rebuild_fetched(
            config.phase_kinds, param_slots, fetched[2 + C :]
        )
        u_acc = jax.vmap(jax.random.uniform)(k_acc)
        accept = (~boundary) & (u_acc < sigma_here / sigma_maj)

        cos_nee = jnp.einsum("j,ij->i", d_sun, -d)
        p_nee = jax.vmap(
            lambda w_at, p_at, c: phase_eval_at(
                config.phase_kinds, medium_row.phase_params, w_at, p_at, c
            )
        )(weights_at, params_at, cos_nee)
        L_col = beta * albedo_col * p_nee * sun_T(p_new) * E_sun

        def _sample_one(w_at, p_at, dd, kk):
            k_sel, k_cos, k_phi = jax.random.split(kk, 3)
            return phase_sample_at(
                config.phase_kinds,
                medium_row.phase_params,
                w_at,
                p_at,
                dd,
                jax.random.uniform(k_sel),
                jax.random.uniform(k_cos, (2,)),
                jax.random.uniform(k_phi),
            )

        d_col = jax.vmap(_sample_one)(weights_at, params_at, d, k_scat)
        beta_col = beta * albedo_col

        # ---- surface interaction ---------------------------------------
        n_srf = p_new / jnp.maximum(r_new[:, None], 1e-12)
        mu_sun_srf = jnp.sum(n_srf * w_sun, axis=-1)
        wo_local = _to_local(n_srf, -d)
        wi_sun_local = _to_local(n_srf, jnp.broadcast_to(w_sun, p_new.shape))
        # positional argument: local tangent coordinates (textures)
        f_nee = bsdf_eval(
            config.surface_kind, surface_row.params, wi_sun_local, wo_local, None
        )
        L_srf = (
            beta
            * f_nee
            * jnp.maximum(mu_sun_srf, 0.0)
            * sun_T(p_new)
            * E_sun
        )
        d_srf_local, w_srf = jax.vmap(
            lambda w, k: bsdf_sample(config.surface_kind, surface_row.params, w, k)
        )(wo_local, k_srf)
        d_srf = _to_world(n_srf, d_srf_local)
        beta_srf = beta * w_srf
        # lift off the surface to avoid re-intersection
        p_srf = p_new + n_srf * eps_t

        # ---- combine ----------------------------------------------------
        L = L + jnp.where(
            alive,
            jnp.where(accept, L_col, jnp.where(hit_surface, L_srf, 0.0)),
            0.0,
        )
        p = jnp.where(hit_surface[:, None], p_srf, p_new)
        d = jnp.where(
            accept[:, None], d_col, jnp.where(hit_surface[:, None], d_srf, d)
        )
        beta = jnp.where(
            accept, beta_col, jnp.where(hit_surface, beta_srf, beta)
        )
        interacted = accept | hit_surface
        escaped = boundary & ~hit_surface
        alive = alive & ~escaped & (beta > 0.0)
        depth = depth + jnp.where(interacted & alive, 1, 0)

        # ---- Russian roulette (on real interactions past rr_depth) ------
        do_rr = interacted & (depth >= config.rr_depth)
        q = jnp.clip(beta, 0.0, 0.95)
        u_rr = jax.vmap(jax.random.uniform)(k_rr)
        survive = u_rr < q
        beta = jnp.where(do_rr & alive & survive, beta / q, beta)
        alive = alive & jnp.where(do_rr, survive, True)
        alive = alive & (depth < config.max_depth)

        return (it + 1, p, d, beta, L, alive, depth, keys)

    def cond(carry):
        it = carry[0]
        alive = carry[5]
        return (it < max_iterations) & jnp.any(alive)

    init = (
        jnp.asarray(0),
        init_p,
        init_d,
        jnp.ones(B, init_p.dtype),
        jnp.zeros(B, init_p.dtype),
        jnp.ones(B, dtype=bool),
        jnp.zeros(B, dtype=jnp.int32),
        keys,
    )
    final = jax.lax.while_loop(cond, body, init)
    return final[4]


def _render_row_spherical(
    config, n_pix, spp, max_iterations, medium_row, surface_row, illum_row,
    directions, target, key
):
    B = n_pix * spp
    r_top = medium_row.radii[-1]

    pix = jnp.repeat(jnp.arange(n_pix), spp)
    w_v = directions[pix]  # toward the sensor
    # start at TOA along the viewing ray through the target
    _, t_far, _ = ray_sphere_intersect(
        jnp.broadcast_to(target, (B, 3)), w_v, r_top
    )
    init_p = target[None, :] + w_v * t_far[:, None]
    init_d = -w_v

    keys = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(key, (B,)), jnp.arange(B)
    )
    L = trace_paths_spherical(
        config, medium_row, surface_row, illum_row, init_p, init_d, keys,
        max_iterations,
    )
    L = L.reshape(n_pix, spp)
    return jnp.mean(L, axis=1), jnp.mean(L * L, axis=1)


def render_batch_spherical_impl(
    config, n_pix, spp, max_iterations, medium, surface, illum, directions,
    target, keys
):
    # lax.map, not vmap: vmapping the while_loop defeats XLA's fusion of
    # the masked table lookups (see ops/tracer.render_batch_impl)
    radii, mu_grid = medium.radii, medium.mu_grid

    def one_row(args):
        mr_part, sr, irr, sky, k = args
        mr = SphericalMediumArrays(
            radii=radii,
            sigma_t=mr_part[0],
            sigma_majorant=mr_part[1],
            albedo=mr_part[2],
            phase_weights=mr_part[3],
            phase_params=mr_part[4],
            sun_tau=mr_part[5],
            mu_grid=mu_grid,
        )
        ir = IlluminationArrays(
            direction=illum.direction,
            irradiance=irr,
            cos_cutoff=illum.cos_cutoff,
            sky_radiance=sky,
        )
        return _render_row_spherical(
            config, n_pix, spp, max_iterations, mr, sr, ir, directions, target, k
        )

    med_part = (
        medium.sigma_t,
        medium.sigma_majorant,
        medium.albedo,
        medium.phase_weights,
        medium.phase_params,
        medium.sun_tau,
    )
    return jax.lax.map(
        one_row, (med_part, surface, illum.irradiance, illum.sky_radiance, keys)
    )


_render_batch_spherical = jax.jit(
    render_batch_spherical_impl, static_argnums=(0, 1, 2, 3)
)


def render_spherical(
    scene_medium: SphericalMediumArrays,
    surface: SurfaceArrays,
    illum: IlluminationArrays,
    sensor: SensorArrays,
    config: SceneConfig,
    spp: int,
    seed: int = 0,
    max_iterations: int = 512,
    spp_chunk: int | None = None,
):
    """Render the spectral batch through a spherical-shell atmosphere."""
    from .tracer import MAX_PATHS_PER_DISPATCH

    directions = jnp.asarray(sensor.directions)
    target = jnp.asarray(sensor.target)
    n_pix = directions.shape[0]
    S = scene_medium.sigma_t.shape[0]

    if spp_chunk is None:
        max_spp = max(1, MAX_PATHS_PER_DISPATCH // max(S * n_pix, 1))
        if spp > max_spp:
            spp_chunk = max_spp

    base_key = jax.random.key(seed)
    row_keys = jax.vmap(jax.random.fold_in)(
        jnp.broadcast_to(base_key, (S,)), jnp.arange(S)
    )

    chunks = []
    start = 0
    step = spp_chunk or spp
    while start < spp:
        chunks.append(min(step, spp - start))
        start += step

    rad_sum = jnp.zeros((S, n_pix))
    m2_sum = jnp.zeros((S, n_pix))
    traced = 0
    for chunk_id, n in enumerate(chunks):
        chunk_keys = jax.vmap(jax.random.fold_in)(row_keys, jnp.full(S, chunk_id))
        rad, m2 = _render_batch_spherical(
            config, n_pix, n, max_iterations, scene_medium, surface, illum,
            directions, target, chunk_keys,
        )
        rad_sum = rad_sum + rad * n
        m2_sum = m2_sum + m2 * n
        traced += n

    return {"radiance": rad_sum / traced, "m2": m2_sum / traced, "spp": traced}
