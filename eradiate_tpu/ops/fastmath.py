"""VPU-lean transcendental kernels for the transport hot path.

The c1 xprof breakdown (round 5) put ``jnp.cos``/``jnp.sin`` of the
sampling azimuth at **40% of device time**: XLA's libm-accurate f32
sin/cos carry a heavyweight argument-reduction path (double-word Payne-
Hanek style) that the VPU executes as a long multi-slot chain — yet every
transport call site evaluates them at ``phi = 2*pi*u`` with ``u`` a unit
uniform, where the reduction is a single floor.

:func:`cos_sin_2pi` computes BOTH ``cos(2*pi*u)`` and ``sin(2*pi*u)`` in
~20 fused VPU ops: quadrant reduction (``q = floor(4u)``), one shared
``x**2``, two degree-4 polynomials (least-squares fits on [0, pi/2],
max error 5.3e-8 / 7.7e-9 — below f32 eps), and the quadrant swap/sign
selects. Exact trig identities make the quadrant mapping error-free:
(c, s) -> (-s, c) per quarter turn.

Accuracy contract: absolute error < 5e-7 (~3 ulp; f32 rounding of the
polynomial chain dominates the fit error) against f64 references over
u in [-8, 8] (arguments outside [0, 1) reduce via the same floor),
pinned by ``tests/unit/test_fastmath.py``. The sampled-direction
perturbation this introduces (~1e-7 radians) is far below MC noise;
regression pins are statistical, and sharded == single-device bitwise
gates hold because both sides evaluate the same polynomials.

Works on jnp and np arrays (the warp module serves both).
"""

from __future__ import annotations

import numpy as np

__all__ = ["cos_sin_2pi"]

# degree-4 least-squares fits of cos(x) and sin(x)/x in y = x**2 over
# x in [0, pi/2] (Chebyshev-node LSQ, max |err| 5.3e-8 / 7.7e-9; see
# module docstring). Order: highest power first.
_COS_Y = (2.31883391e-05, -1.38555251e-03, 4.16638976e-02,
          -4.99999242e-01, 9.99999979e-01)
_SIN_Y = (2.60838923e-06, -1.98107494e-04, 8.33307983e-03,
          -1.66666597e-01, 9.99999998e-01)

_HALF_PI = float(np.pi / 2.0)


def _np_of(x):
    import jax.numpy as jnp

    return np if isinstance(x, np.ndarray) else jnp


def cos_sin_2pi(u):
    """(cos(2*pi*u), sin(2*pi*u)) via quadrant reduction + degree-4 polys.

    ``u`` in turns (full circle = 1). Any real ``u`` is accepted; the
    fractional part is used. ~2.5x cheaper than the libm pair on the VPU
    (measured on the c1 transport loop, round 5).
    """
    xp = _np_of(u)
    if xp.result_type(u) == xp.float64:
        # double modes keep libm accuracy (the polys are f32-grade)
        phi = (2.0 * np.pi) * u
        return xp.cos(phi), xp.sin(phi)
    w = u * 4.0
    q = xp.floor(w)
    v = w - q  # [0, 1)
    x = v * _HALF_PI
    y = x * x
    c = _COS_Y[0]
    for a in _COS_Y[1:]:
        c = c * y + a
    s = _SIN_Y[0]
    for a in _SIN_Y[1:]:
        s = s * y + a
    s = s * x
    qi = xp.asarray(q - 4.0 * xp.floor(q * 0.25))  # q mod 4, exact for f32
    swap = (qi == 1.0) | (qi == 3.0)
    cos_out = xp.where(swap, s, c)
    sin_out = xp.where(swap, c, s)
    neg_c = (qi == 1.0) | (qi == 2.0)
    neg_s = qi >= 2.0
    return (
        xp.where(neg_c, -cos_out, cos_out),
        xp.where(neg_s, -sin_out, sin_out),
    )
