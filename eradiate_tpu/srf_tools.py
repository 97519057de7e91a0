"""Spectral response function manipulation tools.

Mirror of ``src/eradiate/srf_tools.py`` (trimming by threshold / kept
integral / spectral window, padding, Gaussian synthesis at ``:1003``).
Operates on plain (w [nm], srf) array pairs.
"""

from __future__ import annotations

import numpy as np

from .spectral.response import BandSRF, make_gaussian_srf  # noqa: F401

__all__ = ["trim_srf", "pad_srf", "spectral_filter", "make_gaussian_srf"]


def trim_srf(w, srf, threshold: float | None = 1e-3, keep_integral: float | None = None):
    """Trim leading/trailing low-response regions.

    ``threshold``: drop edges where srf < threshold * max (mirror of
    ``srf_tools.py:467``); ``keep_integral``: instead keep the minimal
    central window containing this fraction of the integral
    (``srf_tools.py:567``).
    """
    w = np.asarray(w, dtype=np.float64)
    v = np.asarray(srf, dtype=np.float64)
    if keep_integral is not None:
        cum = np.concatenate(
            [[0.0], np.cumsum(0.5 * (v[1:] + v[:-1]) * np.diff(w))]
        )
        total = cum[-1]
        half_drop = (1.0 - keep_integral) / 2.0 * total
        lo = int(np.searchsorted(cum, half_drop))
        hi = int(np.searchsorted(cum, total - half_drop))
        lo = max(lo - 1, 0)
        hi = min(hi + 1, w.size - 1)
    else:
        mask = v >= threshold * v.max()
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            return w, v
        lo = max(int(idx[0]) - 1, 0)
        hi = min(int(idx[-1]) + 1, w.size - 1)
    return w[lo : hi + 1], v[lo : hi + 1]


def pad_srf(w, srf, n: int = 1):
    """Pad with n zero samples on each side (uniform extrapolated steps)."""
    w = np.asarray(w, dtype=np.float64)
    v = np.asarray(srf, dtype=np.float64)
    dw_lo = w[1] - w[0]
    dw_hi = w[-1] - w[-2]
    w_lo = w[0] - dw_lo * np.arange(n, 0, -1)
    w_hi = w[-1] + dw_hi * np.arange(1, n + 1)
    return (
        np.concatenate([w_lo, w, w_hi]),
        np.concatenate([np.zeros(n), v, np.zeros(n)]),
    )


def spectral_filter(w, srf, wmin=None, wmax=None):
    """Restrict to a spectral window (``srf_tools.py:403``)."""
    w = np.asarray(w, dtype=np.float64)
    v = np.asarray(srf, dtype=np.float64)
    m = np.ones(w.shape, dtype=bool)
    if wmin is not None:
        m &= w >= wmin
    if wmax is not None:
        m &= w <= wmax
    return w[m], v[m]
