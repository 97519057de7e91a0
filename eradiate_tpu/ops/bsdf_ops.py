"""Surface BSDF evaluation and sampling (pure JAX, path-batched).

TPU-native equivalents of the reference's C++ BSDF plugins (SURVEY §2.1:
``diffuse``/lambertian, ``rpv``, ``hapke``, ``rtls``, ``bilambertian``,
ocean family, ...). Formulas are re-derived from the published models, not
ported from Mitsuba.

Conventions
-----------
``wi`` and ``wo`` are unit vectors pointing *away from the surface point*
(+z up): ``wi`` toward the light, ``wo`` toward the viewer. ``eval``
returns the BRDF value f [1/sr] such that dL_o = f * cos(theta_i) * dE_i.
``sample`` draws a continuation direction for backward tracing and returns
``(w_new, weight)`` with ``weight = f * cos / pdf``.

Parameters are per-spectral-index scalars (the tracer vmaps over the
spectral axis); positional texture lookups receive the surface hit point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.warp import square_to_cosine_hemisphere

__all__ = ["bsdf_eval", "bsdf_sample", "SUPPORTED_BSDFS"]


def _mu(w):
    return jnp.maximum(w[..., 2], 0.0)


# ---------------------------------------------------------------------------
# Lambertian (reference kernel plugin `diffuse`, `scenes/bsdfs/_lambertian.py:44`)
# ---------------------------------------------------------------------------


def lambertian_eval(params, wi, wo, p=None):
    rho = params["reflectance"]
    return jnp.where(
        (_mu(wi) > 0) & (_mu(wo) > 0), rho / jnp.pi, 0.0
    )


# ---------------------------------------------------------------------------
# RPV (reference kernel plugin `rpv`, `scenes/bsdfs/_rpv.py:15-110`)
# Rahman, Pinty & Verstraete (1993); hot spot at wi == wo.
# ---------------------------------------------------------------------------


def rpv_eval(params, wi, wo, p=None):
    rho_0 = params["rho_0"]
    k = params["k"]
    g = params["g"]
    rho_c = params.get("rho_c", rho_0)

    mu_i = _mu(wi)
    mu_o = _mu(wo)
    valid = (mu_i > 1e-7) & (mu_o > 1e-7)
    mu_i = jnp.maximum(mu_i, 1e-7)
    mu_o = jnp.maximum(mu_o, 1e-7)

    # Minnaert-like bowl term
    M = (mu_i * mu_o * (mu_i + mu_o)) ** (k - 1.0)

    # Henyey-Greenstein term on the hot-spot-aligned angle:
    # cos(Theta) = wi . wo (= +1 at exact backscattering)
    cos_T = jnp.sum(wi * wo, axis=-1)
    F = (1.0 - g * g) / jnp.maximum(
        (1.0 + g * g + 2.0 * g * cos_T) ** 1.5, 1e-12
    )

    # Hot-spot factor: G = sqrt(tan^2 i + tan^2 o - 2 tan i tan o cos dphi)
    ti = jnp.sqrt(jnp.maximum(1.0 - mu_i * mu_i, 0.0)) / mu_i
    to = jnp.sqrt(jnp.maximum(1.0 - mu_o * mu_o, 0.0)) / mu_o
    # cos of azimuth difference between wi and wo
    sin_i = jnp.sqrt(jnp.maximum(1.0 - mu_i * mu_i, 1e-30))
    sin_o = jnp.sqrt(jnp.maximum(1.0 - mu_o * mu_o, 1e-30))
    cos_dphi = (cos_T - mu_i * mu_o) / (sin_i * sin_o)
    cos_dphi = jnp.clip(cos_dphi, -1.0, 1.0)
    G = jnp.sqrt(jnp.maximum(ti * ti + to * to - 2.0 * ti * to * cos_dphi, 0.0))
    H = 1.0 + (1.0 - rho_c) / (1.0 + G)

    # Rahman's rho is a BRF; BRDF = BRF / pi
    return jnp.where(valid, rho_0 * M * F * H / jnp.pi, 0.0)


# ---------------------------------------------------------------------------
# Black (absorber), `scenes/bsdfs/_black.py`
# ---------------------------------------------------------------------------


def black_eval(params, wi, wo, p=None):
    return jnp.zeros(jnp.broadcast_shapes(wi[..., 0].shape, wo[..., 0].shape))


# ---------------------------------------------------------------------------
# Checkerboard (two-reflectance lambertian texture),
# `scenes/bsdfs/_checkerboard.py:71`
# ---------------------------------------------------------------------------


def checkerboard_eval(params, wi, wo, p=None):
    rho_a = params["reflectance_a"]
    rho_b = params["reflectance_b"]
    scale = params.get("scale_pattern", 2.0)
    extent = params.get("extent", 1.0)
    if p is None:
        rho = rho_a
    else:
        # uv in [0,1) over the surface extent, Mitsuba checkerboard parity
        u = (p[..., 0] / extent + 0.5) * scale
        v = (p[..., 1] / extent + 0.5) * scale
        parity = (jnp.floor(u) + jnp.floor(v)) % 2.0
        rho = jnp.where(parity < 1.0, rho_a, rho_b)
    return jnp.where((_mu(wi) > 0) & (_mu(wo) > 0), rho / jnp.pi, 0.0)


_EVAL = {
    "lambertian": lambertian_eval,
    "rpv": rpv_eval,
    "black": black_eval,
    "checkerboard": checkerboard_eval,
}

SUPPORTED_BSDFS = tuple(sorted(_EVAL))


def bsdf_eval(kind, params, wi, wo, p=None):
    """BRDF value f(wi, wo) [1/sr]; static dispatch on ``kind``."""
    try:
        fn = _EVAL[kind]
    except KeyError:
        raise ValueError(f"unsupported BSDF kind '{kind}'") from None
    return fn(params, wi, wo, p)


def bsdf_sample(kind, params, wo, key, p=None):
    """Sample continuation direction for backward tracing.

    Cosine-hemisphere importance sampling (pdf = cos/pi) with exact
    ``f cos / pdf`` weighting — optimal for lambertian, robust for the
    smooth hemispherical models (RPV/Hapke/RTLS). Specular ocean surfaces
    override this with their own strategy.

    Returns (w_new, weight).
    """
    u = jax.random.uniform(key, wo.shape[:-1] + (2,))
    w_new = square_to_cosine_hemisphere(u)
    if kind in ("lambertian", "checkerboard"):
        # f = rho/pi, pdf = cos/pi -> weight = rho
        f = bsdf_eval(kind, params, w_new, wo, p)
        weight = f * jnp.pi
    elif kind == "black":
        weight = jnp.zeros(wo.shape[:-1])
    else:
        f = bsdf_eval(kind, params, w_new, wo, p)
        weight = f * jnp.pi  # cos cancels against the cosine pdf
    return w_new, weight
