"""BSDF angular probe utility.

Mirror of the reference's ``eval_bsdf`` test helper
(``src/eradiate/kernel/_bsdf.py:25-52``): evaluate a BSDF kind over
outgoing/incident angular grids and return a dataset with dims
``(theta_o, phi_o, theta_i, phi_i)`` — used to validate BSDF
implementations against published scattering-law plots and reference
datasets.
"""

from __future__ import annotations

import numpy as np

from .. import xr

__all__ = ["eval_bsdf"]


def _sph_to_dir(theta, phi):
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    return np.stack(
        np.broadcast_arrays(cp * st, sp * st, ct), axis=-1
    )


def eval_bsdf(kind, params, theta_os, phi_os, theta_is, phi_is) -> "xr.Dataset":
    """Probe ``f(wi, wo)`` [1/sr] over angular grids.

    ``kind``/``params`` as accepted by
    :func:`eradiate_tpu.ops.bsdf_ops.bsdf_eval`; angles in radians.
    Convention note: like the reference helper, directions here point
    AWAY from the surface on the upper hemisphere (``theta`` measured
    from +z), and ``theta_i``/``phi_i`` give the incident (sun-side)
    direction.
    """
    import jax.numpy as jnp

    from ..ops.bsdf_ops import bsdf_eval

    theta_os = np.atleast_1d(np.asarray(theta_os, np.float64))
    phi_os = np.atleast_1d(np.asarray(phi_os, np.float64))
    theta_is = np.atleast_1d(np.asarray(theta_is, np.float64))
    phi_is = np.atleast_1d(np.asarray(phi_is, np.float64))

    to, po, ti, pi_ = np.meshgrid(
        theta_os, phi_os, theta_is, phi_is, indexing="ij"
    )
    wo = _sph_to_dir(to.ravel(), po.ravel())
    wi = _sph_to_dir(ti.ravel(), pi_.ravel())
    vals = np.asarray(
        bsdf_eval(kind, params, jnp.asarray(wi), jnp.asarray(wo))
    ).reshape(to.shape)

    return xr.Dataset(
        {
            "bsdf": xr.DataArray(
                vals,
                dims=("theta_o", "phi_o", "theta_i", "phi_i"),
                attrs={"units": "sr^-1"},
                name="bsdf",
            )
        },
        coords={
            "theta_o": theta_os,
            "phi_o": phi_os,
            "theta_i": theta_is,
            "phi_i": phi_is,
        },
    )
