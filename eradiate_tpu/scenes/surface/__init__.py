"""Surface scene elements.

Mirror of ``src/eradiate/scenes/surface/`` (factory at ``_core.py:12-18``:
basic, central_patch, dem). A surface couples a shape with a BSDF; in the
engine the 1D geometries carry an analytic ground plane/sphere, so the
surface compiles to (bsdf kind, spectral params).
"""

from __future__ import annotations

import attrs
import numpy as np

from ..bsdfs import BSDF, LambertianBSDF, bsdf_factory
from ..core import Factory, SceneElement

__all__ = ["Surface", "BasicSurface", "CentralPatchSurface", "surface_factory"]

surface_factory = Factory("surface")


def _bsdf_converter(value):
    if isinstance(value, BSDF):
        return value
    if isinstance(value, dict):
        return bsdf_factory.convert(value)
    raise TypeError(f"cannot convert {type(value)} to BSDF")


@attrs.define(eq=False, slots=False)
class Surface(SceneElement):
    """Base surface element."""

    @property
    def bsdf_kind(self) -> str:
        raise NotImplementedError

    def eval_bsdf_params(self, w_nm) -> dict:
        raise NotImplementedError


@surface_factory.register("basic")
@attrs.define(eq=False, slots=False)
class BasicSurface(Surface):
    """Shape + BSDF composite (``scenes/surface/_basic.py:18``)."""

    bsdf: BSDF = attrs.field(factory=LambertianBSDF, converter=_bsdf_converter)
    altitude: float = 0.0  # km

    @property
    def bsdf_kind(self) -> str:
        return self.bsdf.kind

    def eval_bsdf_params(self, w_nm) -> dict:
        return self.bsdf.eval_params(w_nm)


@surface_factory.register("central_patch")
@attrs.define(eq=False, slots=False)
class CentralPatchSurface(Surface):
    """Dual-BSDF surface: a central rectangular patch with its own BSDF on
    a background (``scenes/surface/_central_patch.py:37``)."""

    bsdf: BSDF = attrs.field(factory=LambertianBSDF, converter=_bsdf_converter)
    patch_bsdf: BSDF = attrs.field(factory=LambertianBSDF, converter=_bsdf_converter)
    patch_edges: float = 1.0  # km, square half-extent

    @property
    def bsdf_kind(self) -> str:
        return "central_patch"

    def eval_bsdf_params(self, w_nm) -> dict:
        w = np.atleast_1d(np.asarray(w_nm))
        out = {f"bg_{k}": v for k, v in self.bsdf.eval_params(w).items()}
        out.update(
            {f"patch_{k}": v for k, v in self.patch_bsdf.eval_params(w).items()}
        )
        out["patch_edges"] = np.full(w.shape, self.patch_edges)
        out["_bg_kind"] = self.bsdf.kind
        out["_patch_kind"] = self.patch_bsdf.kind
        return out


def surface_converter(value):
    """Convert surfaces OR bare BSDFs (the reference accepts both,
    ``experiments/_helpers.py:62``)."""
    if isinstance(value, Surface):
        return value
    if isinstance(value, BSDF):
        return BasicSurface(bsdf=value)
    if isinstance(value, dict):
        d = dict(value)
        t = d.get("type")
        if t in surface_factory.registry:
            return surface_factory.convert(d)
        # assume it's a BSDF dict
        return BasicSurface(bsdf=bsdf_factory.convert(d))
    raise TypeError(f"cannot convert {type(value)} to Surface")
