"""Pallas kernels: spherical-shell free flight and slant optical depth.

The spherical tracer's per-bounce cost is dominated by ~25 [B, L]-shaped
HBM passes (L = shell count, ~1200): building the per-leg tau prefix
(:func:`eradiate_tpu.ops.spherical.shell_flight` uses a triangular one-hot
MXU matmul to avoid a 12-pass XLA cumsum) plus masked table searches, and
the NEE slant-depth evaluation (:func:`...slant_tau_exact`, ~10 passes).
These kernels run the whole computation VMEM-resident per ray tile: HBM
traffic drops from ~60 kB/lane/bounce to ~40 B/lane/bounce, and the
per-element VPU work is minimized by sharing ONE sqrt pass per kernel
(X_l = sqrt(r_l² - b²); level l+1 via a circular ``pltpu.roll``) with all
shell lengths in cancellation-stable difference-of-squares quotients. The
tau prefix runs as per-128-chunk triangular matmuls on the otherwise-idle
MXU with an f32 carry (:func:`_prefix_blocked`) — measured faster than
both the O(L²) full triangular matmul and a log-step roll cumsum at
L ~ 1200.

Mosaic restrictions shape the data layout: no 1D slices/concats at offset
1 (``radii[1:]`` fails "input offsets outside of the first tile"), so the
shell table arrives pre-shifted — ``lo`` and ``hi`` level vectors padded
to a lane multiple, built once host-side in :func:`_prep`.

Inputs are per-lane scalars (x0 = p·dir, b2 = |p x dir|², caps, draws) as
[B] vectors plus the shared shell vectors. BOTH kernels work in squared
level space (monotone, so interval clamps commute with squaring) with the
same shared-X quotient forms and the same clamped-accumulation g
machinery; b² arrives from the cross-product form, which stays
cancellation-free at planet-scale radii where |p|² - x0² loses all
precision for near-radial rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["shell_event_pallas", "shell_flight_pallas", "slant_tau_pallas"]

_BLOCK_B = 1024
#: Sentinel for ground-blocked slant paths; matches ops.spherical.TAU_BLOCKED
_TAU_BLOCKED = 1.0e10


def _pad_to(x, width, fill):
    return jnp.pad(x, (0, width - x.shape[0]), constant_values=fill)


def _recip(x):
    """Fast reciprocal: hardware approximate reciprocal + one Newton step
    (~1e-6 relative).  Used where the quotient feeds the tau PREFIX,
    whose value decides collide bits and bracketing layer indices that
    the XLA-parity tests compare with exact equality."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _recip_fast(x):
    """Hardware approximate reciprocal, ~1.2e-4 relative, no Newton.
    Measured (round 3): the kernels are bound purely by VPU op count
    (~1e12 scalar-op/s across any mix of arithmetic, transcendentals,
    broadcasts and reductions), so dropping the 3-op Newton refinement
    on a [TB, W] quotient saves real time.  Safe ONLY where the result
    moves a continuous quantity (slant tau at 5e-2 test tolerance, the
    within-shell collision fraction at 1e-2) — NOT for the flight
    prefix, where a 1e-4 shift flips exact-equality layer brackets."""
    return pl.reciprocal(x, approx=True)


def _prefix_blocked(c):
    """Exclusive prefix sum along the minor axis via per-chunk triangular
    matmuls on the MXU (hi/lo bf16 split recovers ~f32; the 0/1 triangle
    is exact in bf16) plus an f32 running carry. O(L·128) MXU work —
    measured ~2.3x faster end-to-end than the log-step ``pltpu.roll``
    cumsum (:func:`_prefix_roll`) at L ~ 1200, because the roll form costs
    ~3·log2(L) full-width VPU passes while the chunked matmuls ride the
    otherwise-idle MXU."""
    TB, W = c.shape
    CH = 128
    il = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    tri = (il < ik).astype(jnp.bfloat16)  # exclusive
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=c.dtype,
    )
    parts = []
    carry = jnp.zeros((TB, 1), c.dtype)
    for j in range(W // CH):
        cj = c[:, j * CH : (j + 1) * CH]
        cj_hi = cj.astype(jnp.bfloat16)
        cj_lo = (cj - cj_hi.astype(c.dtype)).astype(jnp.bfloat16)
        pj = dot(cj_hi, tri) + dot(cj_lo, tri)
        parts.append(pj + carry)
        carry = carry + jnp.sum(cj, axis=1, keepdims=True)
    return jnp.concatenate(parts, axis=1)


def _colr(ref):
    """Lane-scalar ref -> [TB, 1] column array. 1D T(1024)-laid-out
    operands need a relayout here (the round-4 measured W-independent
    per-call cost); 2D (block_b, 1) operands arrive in column layout and
    broadcast against [TB, W] natively."""
    v = ref[:]
    return v if v.ndim == 2 else v[:, None]


def _store(ref, col_val):
    """Store a [TB, 1] column into a lane-scalar output ref."""
    ref[:] = col_val if len(ref.shape) == 2 else col_val[:, 0]


def _flight_core(
    x0c, b2c, tmaxc, tausc, lo, hi, sig, *, n_levels, exit_clipped
):
    """Exact shell free flight on [TB, 1] lane columns.

    Returns (collide, t_col, layer) as [TB, 1] columns. All lane-scalar
    intermediates stay in column layout end to end — reductions use
    ``keepdims`` — so no 1D<->column relayouts occur inside the body.
    """
    Lp1 = n_levels  # real levels (<= padded width)
    L = Lp1 - 1
    # ONE sqrt pass [TB, W], as x*rsqrt(x) (hardware rsqrt is cheaper than
    # sqrt; the 1e-30 floor maps x = 0 to ~1e-15, well under level spacing)
    arg = jnp.maximum(lo - b2c, 1e-30)
    X = arg * jax.lax.rsqrt(arg)
    # X_{k+1} by circular left-shift (shift W-1 == -1); the wrapped last
    # column only ever multiplies sigma = 0 (sigma has <= W-1 real shells)
    X_hi = pltpu.roll(X, X.shape[1] - 1, axis=1)
    # c_k = sigma_k * (X_{k+1} - X_k) in the cancellation-stable
    # difference-of-squares form (tangent-clipped numerator)
    num = jnp.maximum(hi - jnp.maximum(lo, b2c), 0.0)
    dX = num * _recip(jnp.maximum(X + X_hi, 1e-30))
    c = sig * dX
    G = _prefix_blocked(c)  # [TB, Lpad]; G_0 = 0

    def g_at(y):
        # tau at axial coordinate y without locating the bracketing shell:
        # each shell contributes its slant depth clamped to the portion
        # below y — ONE clamped accumulation instead of a count reduction
        # plus three masked selects (callers never use the index).
        # Intentional divergence from the XLA G_at at the float boundary:
        # this form SATURATES at the total column depth for y a few ulps
        # past the top level, where G_at extrapolates with the top
        # shell's sigma — benign because callers clip t_max at the
        # atmosphere exit, so y never meaningfully exceeds X_top.
        frac = jnp.minimum(jnp.maximum(y - X, 0.0), dX)
        return jnp.sum(sig * frac, axis=1, keepdims=True)

    def g_inv(v):
        # inverse of g_at in the same closed accumulation form: shell l
        # contributes its axial length clamped to the fraction of its
        # slant depth c_l below v (vacuum shells have c = 0 and pass
        # through fully via the dX clamp, matching the reference's
        # "collisions never land in zero-extinction layers" semantics);
        # the bracketing index still needs one count reduction (padded
        # columns hold G = S > v, so they never count)
        below = G <= v
        k = jnp.clip(
            jnp.sum(below.astype(jnp.int32), axis=1, keepdims=True) - 1,
            0,
            L - 1,
        )
        frac = jnp.minimum(
            jnp.maximum((v - G) * _recip(jnp.maximum(c, 1e-30)), 0.0),
            1.0,
        )
        # anchor at the axial coordinate of level 0: the clamped dX sum
        # telescopes from the tangent point (X = 0) OR from ground level
        # when the tangent lies below ground (X[:, 0] > 0)
        y = X[:, 0:1] + jnp.sum(dX * frac, axis=1, keepdims=True)
        return y, k

    desc = x0c < 0.0
    A = g_at(jnp.abs(x0c))
    x_max = x0c + tmaxc
    if exit_clipped:
        # tracer contract: t_max is the boundary exit (ground or TOA), so
        # the endpoint's g value is either 0 (ground hit: |x_max| =
        # X[:, 0]) or the full column depth S (TOA exit: |x_max| = X_top)
        # — no second g_at sweep needed.
        S = jnp.sum(c, axis=1, keepdims=True)
        Gm = jnp.where(x_max < 0.0, 0.0, S)
    else:
        Gm = g_at(jnp.abs(x_max))
    tau_max = jnp.where(
        desc, jnp.where(x_max < 0.0, A - Gm, A + Gm), Gm - A
    )
    col = tausc < jnp.maximum(tau_max, 0.0)

    on_desc = desc & (tausc < A)
    v = jnp.where(on_desc, A - tausc, jnp.where(desc, tausc - A, A + tausc))
    y, k = g_inv(v)
    x_c = jnp.where(on_desc, -y, y)
    t = jnp.clip(x_c - x0c, 0.0, tmaxc)
    return col, t, k


def _kernel_flight(
    x0, b2, tmax, tau_s,
    r2_lo, r2_hi, sigma,
    collide, t_col, layer,
    *, n_levels: int, exit_clipped: bool,
):
    lo = r2_lo[:][None, :]
    hi = r2_hi[:][None, :]
    sig = sigma[:][None, :]
    col, t, k = _flight_core(
        _colr(x0), _colr(b2), _colr(tmax), _colr(tau_s), lo, hi, sig,
        n_levels=n_levels, exit_clipped=exit_clipped,
    )
    _store(collide, col.astype(collide.dtype))
    _store(t_col, t)
    _store(layer, k)


def _kernel_slant(
    x0, b2in, r2_lo, r2_hi, sigma, tau, *, n_levels: int,
):
    """Slant tau from points with axial coordinate x0 = p·w and squared
    impact parameter b2 (computed cancellation-free from |p x w|^2 by the
    caller), through shells (r2_lo, r2_hi)/sigma — the VMEM-resident
    mirror of ops.spherical.slant_tau_exact.

    Same g-machinery as :func:`_kernel_flight`: with S the full-column
    slant depth from the tangent point and g(y) the clamped-accumulation
    prefix, an ascending ray sees ``S - g(|x0|)`` and a descending ray
    ``S + g(|x0|)`` (down leg to the tangent plus the full ascent).
    This replaces the round-2 per-shell quotient/partial-shell selects at
    roughly half the VPU passes; the only subtraction it adds,
    ``|x0| - X_l`` inside the clamp, is exact everywhere but the single
    partial shell, where its absolute error is bounded by f32 rounding
    of the axial coordinate — a per-ray tau error of order
    ``sigma_shell * eps * |x0|``, negligible against the column total."""
    x0v = x0[:]
    b2 = b2in[:]
    desc = x0v < 0.0
    blocked = desc & (b2 <= r2_lo[0])
    b2e = b2[:, None]

    lo = r2_lo[:][None, :]  # [1, Lpad] squared level k = shell floor
    hi = r2_hi[:][None, :]
    # ONE sqrt pass [TB, W] as x*rsqrt(x) (see _kernel_flight)
    arg = jnp.maximum(lo - b2e, 1e-30)
    X = arg * jax.lax.rsqrt(arg)
    X_hi = pltpu.roll(X, X.shape[1] - 1, axis=1)  # X at level k+1

    # full (tangent-clipped) shell lengths; padded shells -> num = 0
    num = jnp.maximum(hi - jnp.maximum(lo, b2e), 0.0)
    dX = num * _recip_fast(jnp.maximum(X + X_hi, 1e-30))

    # tau = S +/- g in ONE fused reduction: sum sigma * (dX + sign*frac)
    frac = jnp.minimum(jnp.maximum(jnp.abs(x0v)[:, None] - X, 0.0), dX)
    sign = jnp.where(desc, 1.0, -1.0)[:, None]
    t = jnp.sum(sigma[:][None, :] * (dX + sign * frac), axis=1)
    tau[:] = jnp.where(blocked, _TAU_BLOCKED, t)


def _kernel_event(
    x0, b2, tmax, tau_s, pw, dw, b2w0,
    r2_lo, r2_hi, sigma,
    collide, t_col, layer, tau_sun,
    *, n_levels: int,
):
    """Fused per-event kernel: exact shell free flight PLUS the sun
    slant optical depth at the resulting event point, in ONE launch.

    Round-4 measurement: a [B, W] shell kernel carries a large FIXED
    per-call cost inside device loops on this backend (~0.45 ms at
    B=16k, W=256 — the round-3 "no fixed in-loop cost" note was measured
    on a trivial [B]-only kernel and does not transfer), so once the
    adaptive shell merge shrinks W the per-event cost is launch-bound,
    not compute-bound. Fusing the two launches halves it.

    The slant geometry at the unknown event point p' = p + t d is
    closed-form in per-lane scalars the caller can supply without
    knowing t: with w the (unit) sunward direction,

        x0' = p·w + t (d·w)
        |p' x w|^2 = |p x w|^2 + 2 t [(p·d) - (p·w)(d·w)] + t^2 (1 - (d·w)^2)

    (Lagrange identity for (p x w)·(d x w)). The f32 rounding of the
    quadratic form is the same order as crossing p' outside the kernel
    (~|p| eps on each term), which the R=1e5 km cross-gates already
    bound; planet-scale f64 runs keep the two-kernel XLA path.
    """
    lo = r2_lo[:][None, :]
    hi = r2_hi[:][None, :]
    sig = sigma[:][None, :]
    tmaxc = _colr(tmax)
    col, t_c, k = _flight_core(
        _colr(x0), _colr(b2), tmaxc, _colr(tau_s), lo, hi, sig,
        n_levels=n_levels, exit_clipped=True,
    )
    _store(collide, col.astype(collide.dtype))
    _store(t_col, t_c)
    _store(layer, k)

    t_step = jnp.where(col, t_c, tmaxc)
    pwc = _colr(pw)
    dwc = _colr(dw)
    x0s = pwc + t_step * dwc
    c1 = _colr(x0) - pwc * dwc
    c2 = jnp.maximum(1.0 - dwc * dwc, 0.0)
    b2s = jnp.maximum(_colr(b2w0) + t_step * (2.0 * c1 + t_step * c2), 0.0)

    # slant tau from (x0s, b2s) columns — same g-machinery as _kernel_slant
    desc = x0s < 0.0
    blocked = desc & (b2s <= r2_lo[0])
    arg = jnp.maximum(lo - b2s, 1e-30)
    X = arg * jax.lax.rsqrt(arg)
    X_hi = pltpu.roll(X, X.shape[1] - 1, axis=1)
    num = jnp.maximum(hi - jnp.maximum(lo, b2s), 0.0)
    dX = num * _recip_fast(jnp.maximum(X + X_hi, 1e-30))
    frac = jnp.minimum(jnp.maximum(jnp.abs(x0s) - X, 0.0), dX)
    sign = jnp.where(desc, 1.0, -1.0)
    t = jnp.sum(sig * (dX + sign * frac), axis=1, keepdims=True)
    _store(tau_sun, jnp.where(blocked, _TAU_BLOCKED, t))


def shell_event_pallas(
    x0, b2, t_max, tau_s, pw, dw, b2w0, radii2, sigma,
    block_b: int = _BLOCK_B,
    interpret: bool = False,
    lanes_2d: bool = True,
):
    """Fused flight + event-point sun slant tau (see :func:`_kernel_event`).

    Per-lane scalars: x0 = p·d, b2 = |p x d|², t_max (exact boundary-exit
    distance — the exit-clipped tracer contract), tau_s sampled depths,
    pw = p·w, dw = d·w, b2w0 = |p x w|² for sunward unit w.
    Returns (collide bool [B], t_col [B], layer int32 [B], tau_sun [B]).

    ``lanes_2d`` ships the lane scalars as [B, 1] columns instead of 1D
    vectors: 1D f32 operands get the T(1024) layout, and every broadcast
    against a [TB, W] intermediate then pays a Mosaic relayout whose cost
    is independent of W — the dominant per-call cost once the shell
    merge shrinks W (round-4 measurement). Column operands broadcast
    natively.
    """
    B = x0.shape[0]
    nb = -(-B // block_b)
    Bp = nb * block_b
    r2_lo, r2_hi, sigma_p, Lp1 = _prep_levels(radii2, sigma)

    if lanes_2d:
        def padb(x, fill=0.0):
            return jnp.pad(x, (0, Bp - B), constant_values=fill)[:, None]

        lane_spec = pl.BlockSpec((block_b, 1), lambda i: (i, 0))
        out_dim = (Bp, 1)
    else:
        def padb(x, fill=0.0):
            return jnp.pad(x, (0, Bp - B), constant_values=fill)

        lane_spec = pl.BlockSpec((block_b,), lambda i: (i,))
        out_dim = (Bp,)
    full_spec = pl.BlockSpec((r2_lo.shape[0],), lambda i: (0,))

    col, t_col, layer, tau_sun = pl.pallas_call(
        functools.partial(_kernel_event, n_levels=Lp1),
        grid=(nb,),
        in_specs=[lane_spec] * 7 + [full_spec] * 3,
        out_specs=(lane_spec,) * 4,
        out_shape=(
            jax.ShapeDtypeStruct(out_dim, x0.dtype),
            jax.ShapeDtypeStruct(out_dim, x0.dtype),
            jax.ShapeDtypeStruct(out_dim, jnp.int32),
            jax.ShapeDtypeStruct(out_dim, x0.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(
        padb(x0), padb(b2), padb(t_max), padb(tau_s, 1e30),
        padb(pw), padb(dw, 1.0), padb(b2w0),
        r2_lo, r2_hi, sigma_p,
    )
    if lanes_2d:
        col, t_col, layer, tau_sun = (
            col[:, 0], t_col[:, 0], layer[:, 0], tau_sun[:, 0]
        )
    return col[:B] > 0.5, t_col[:B], layer[:B], tau_sun[:B]


def _prep_levels(levels, sigma):
    """(lo, hi, sigma) level vectors padded to a 128 multiple; ``hi`` is
    ``levels`` shifted by one (both padded with the top value so padded
    shells are empty), ``sigma`` padded with zeros."""
    Lp1 = levels.shape[0]
    width = max(-(-Lp1 // 128) * 128, 128)
    lo = _pad_to(levels, width, 0.0)
    if width > Lp1:
        lo = lo.at[Lp1:].set(levels[-1])
    hi = _pad_to(levels[1:], width, 0.0)
    hi = hi.at[Lp1 - 1:].set(levels[-1])
    sig = _pad_to(sigma, width, 0.0)
    return lo, hi, sig, Lp1


def shell_flight_pallas(
    x0, b2, t_max, tau_s, radii2, sigma,
    block_b: int = _BLOCK_B,
    interpret: bool = False,
    exit_clipped: bool = False,
    lanes_2d: bool = False,
):
    """Fused exact shell free flight (see ops.spherical.shell_flight).

    x0 = p·d, b2 = |p x d|² per lane; radii2 = radii² [L+1]; sigma [L].
    ``exit_clipped=True`` asserts the tracer contract that ``t_max`` is
    the exact boundary-exit distance (ground or TOA), which replaces the
    endpoint g_at sweep with a select on the total column depth.
    ``lanes_2d`` ships lane scalars as [B, 1] columns like the fused
    event kernel. Default FALSE here (round-5 measurement): standalone-
    chained the column form wins ~10% (no in-kernel relayouts), but
    inside the real regenerative loop XLA inserts per-iteration
    broadcast_in_dim copies to build the [B, 1] operands from the loop's
    1D lane state ("data formatting" at ~22% of device time in the c4
    xprof) — a net ~25% end-to-end LOSS. The fused event kernel keeps
    columns because its x0/b2/pw/dw/b2w0 operands are fresh products
    there, not loop state.
    Returns (collide bool [B], t_col [B], layer int32 [B]).
    """
    B = x0.shape[0]
    nb = -(-B // block_b)
    Bp = nb * block_b
    r2_lo, r2_hi, sigma_p, Lp1 = _prep_levels(radii2, sigma)

    if lanes_2d:
        def padb(x, fill=0.0):
            return jnp.pad(x, (0, Bp - B), constant_values=fill)[:, None]

        lane_spec = pl.BlockSpec((block_b, 1), lambda i: (i, 0))
        out_dim = (Bp, 1)
    else:
        def padb(x, fill=0.0):
            return jnp.pad(x, (0, Bp - B), constant_values=fill)

        lane_spec = pl.BlockSpec((block_b,), lambda i: (i,))
        out_dim = (Bp,)
    full_spec = pl.BlockSpec((r2_lo.shape[0],), lambda i: (0,))

    col, t_col, layer = pl.pallas_call(
        functools.partial(
            _kernel_flight, n_levels=Lp1, exit_clipped=exit_clipped
        ),
        grid=(nb,),
        in_specs=[lane_spec] * 4 + [full_spec] * 3,
        out_specs=(lane_spec,) * 3,
        out_shape=(
            jax.ShapeDtypeStruct(out_dim, x0.dtype),
            jax.ShapeDtypeStruct(out_dim, x0.dtype),
            jax.ShapeDtypeStruct(out_dim, jnp.int32),
        ),
        # the [TB, Lpad] working set (~25 MB at TB=1024, L=1200) exceeds
        # the default 16 MB scoped-VMEM budget; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(
        padb(x0), padb(b2), padb(t_max), padb(tau_s, 1e30),
        r2_lo, r2_hi, sigma_p,
    )
    if lanes_2d:
        col, t_col, layer = col[:, 0], t_col[:, 0], layer[:, 0]
    return col[:B] > 0.5, t_col[:B], layer[:B]


def slant_tau_pallas(
    x0, b2, radii, sigma,
    block_b: int = _BLOCK_B,
    interpret: bool = False,
):
    """Fused exact slant optical depth (see ops.spherical.slant_tau_exact).

    x0 = p·w, b2 = |p x w|² per lane (the cross-product form keeps b²
    cancellation-free at planet-scale radii); ``radii`` UNSQUARED [L+1]
    (the kernel works in squared level space with shared-X quotient
    forms). Returns tau [B] (TAU_BLOCKED for ground-blocked descending
    rays).
    """
    B = x0.shape[0]
    nb = -(-B // block_b)
    Bp = nb * block_b
    r_lo, r_hi, sigma_p, Lp1 = _prep_levels(radii * radii, sigma)

    def padb(x, fill=0.0):
        return jnp.pad(x, (0, Bp - B), constant_values=fill)

    lane_spec = pl.BlockSpec((block_b,), lambda i: (i,))
    full_spec = pl.BlockSpec((r_lo.shape[0],), lambda i: (0,))

    tau = pl.pallas_call(
        functools.partial(_kernel_slant, n_levels=Lp1),
        grid=(nb,),
        in_specs=[lane_spec] * 2 + [full_spec] * 3,
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((Bp,), x0.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(padb(x0), padb(b2, 1.0), r_lo, r_hi, sigma_p)
    return tau[:B]
