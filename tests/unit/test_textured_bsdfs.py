"""Unit tests: textured/composite BSDFs (bitmap, opacity_mask, selectbsdf,
central_patch engine dispatch).

Reference components: stock ``bitmap`` texture, ``mask`` plugin
(``scenes/bsdfs/_opacity_mask.py:88``), ``selectbsdf`` expert plugin,
``CentralPatchSurface`` (``scenes/surface/_central_patch.py:37``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eradiate_tpu.ops.bsdf_ops import bsdf_eval
from eradiate_tpu.scenes.bsdfs import (
    BitmapBSDF,
    LambertianBSDF,
    OpacityMaskBSDF,
    RPVBSDF,
    SelectBSDF,
    bsdf_factory,
)
from eradiate_tpu.scenes.surface import CentralPatchSurface

WI = jnp.asarray([[0.0, 0.0, 1.0]])
WO = jnp.asarray([[0.5, 0.0, np.sqrt(0.75)]])


def _row(params):
    """Strip the leading spectral axis (engine rows are per-spectral)."""
    return {k: jnp.asarray(v)[0] for k, v in params.items()}


def test_bitmap_eval_constant_map():
    b = BitmapBSDF(data=np.full((4, 4), 0.3), extent=2.0)
    params = _row(b.eval_params(np.array([550.0])))
    p = jnp.asarray([[0.1, -0.4], [5.0, 5.0]])  # second point wraps
    f = bsdf_eval("bitmap", params, WI, WO, p)
    np.testing.assert_allclose(np.asarray(f), 0.3 / np.pi, rtol=1e-6)


def test_bitmap_eval_spatial_variation():
    # left half 0.2, right half 0.8; extent 2 km -> x<0 maps to u<0.5
    data = np.concatenate(
        [np.full((8, 4), 0.2), np.full((8, 4), 0.8)], axis=1
    )
    b = BitmapBSDF(data=data, extent=2.0)
    params = _row(b.eval_params(np.array([550.0])))
    p = jnp.asarray([[-0.5, 0.0], [0.5, 0.0]])
    f = np.asarray(bsdf_eval("bitmap", params, WI, WO, p))
    np.testing.assert_allclose(f[0], 0.2 / np.pi, rtol=1e-3)
    np.testing.assert_allclose(f[1], 0.8 / np.pi, rtol=1e-3)


def test_bitmap_spectral_scale():
    b = BitmapBSDF(
        data=np.full((2, 2), 0.5),
        extent=1.0,
        scale={"type": "interpolated", "wavelengths": [400.0, 600.0], "values": [1.0, 0.5]},
    )
    params = b.eval_params(np.array([400.0, 600.0]))
    np.testing.assert_allclose(params["data"][0], 0.5)
    np.testing.assert_allclose(params["data"][1], 0.25)


def test_opacity_mask_scales_nested():
    m = OpacityMaskBSDF(
        nested_bsdf=LambertianBSDF(reflectance=0.6),
        opacity=np.full((4, 4), 0.5),
        extent=2.0,
    )
    assert m.kind == "opacity_mask:lambertian"
    params = _row(m.eval_params(np.array([550.0])))
    p = jnp.asarray([[0.0, 0.0]])
    f = bsdf_eval(m.kind, params, WI, WO, p)
    np.testing.assert_allclose(np.asarray(f), 0.5 * 0.6 / np.pi, rtol=1e-6)


def test_selectbsdf_picks_by_index_map():
    s = SelectBSDF(
        bsdfs=[LambertianBSDF(reflectance=0.1), LambertianBSDF(reflectance=0.9)],
        index_map=np.array([[0, 1], [0, 1]]),  # right half -> child 1
        extent=2.0,
    )
    assert s.kind == "select:lambertian:lambertian"
    params = _row(s.eval_params(np.array([550.0])))
    p = jnp.asarray([[-0.5, 0.0], [0.5, 0.0]])
    f = np.asarray(bsdf_eval(s.kind, params, WI, WO, p))
    np.testing.assert_allclose(f[0], 0.1 / np.pi, rtol=1e-6)
    np.testing.assert_allclose(f[1], 0.9 / np.pi, rtol=1e-6)


def test_selectbsdf_mixed_children():
    s = SelectBSDF(
        bsdfs=[LambertianBSDF(reflectance=0.5), RPVBSDF()],
        index_map=np.array([[0, 1]]),
        extent=2.0,
    )
    params = _row(s.eval_params(np.array([550.0])))
    p_lam = jnp.asarray([[-0.5, 0.0]])
    p_rpv = jnp.asarray([[0.5, 0.0]])
    f_lam = np.asarray(bsdf_eval(s.kind, params, WI, WO, p_lam))
    f_rpv_sel = np.asarray(bsdf_eval(s.kind, params, WI, WO, p_rpv))
    f_rpv = np.asarray(
        bsdf_eval("rpv", _row(RPVBSDF().eval_params(np.array([550.0]))), WI, WO)
    )
    np.testing.assert_allclose(f_lam, 0.5 / np.pi, rtol=1e-6)
    np.testing.assert_allclose(f_rpv_sel, f_rpv, rtol=1e-6)


def test_central_patch_dispatch():
    s = CentralPatchSurface(
        bsdf=LambertianBSDF(reflectance=0.2),
        patch_bsdf=LambertianBSDF(reflectance=0.8),
        patch_edges=1.0,
    )
    assert s.bsdf_kind == "central_patch:lambertian:lambertian"
    params = _row(s.eval_bsdf_params(np.array([550.0])))
    p = jnp.asarray([[0.0, 0.0], [3.0, 0.0]])
    f = np.asarray(bsdf_eval(s.bsdf_kind, params, WI, WO, p))
    np.testing.assert_allclose(f[0], 0.8 / np.pi, rtol=1e-6)
    np.testing.assert_allclose(f[1], 0.2 / np.pi, rtol=1e-6)


def test_factory_registration():
    b = bsdf_factory.convert({"type": "bitmap", "data": [[0.5]]})
    assert isinstance(b, BitmapBSDF)
    m = bsdf_factory.convert(
        {"type": "opacity_mask", "nested_bsdf": {"type": "lambertian"}}
    )
    assert isinstance(m, OpacityMaskBSDF)
    s = bsdf_factory.convert(
        {
            "type": "selectbsdf",
            "bsdfs": [{"type": "lambertian"}, {"type": "rpv"}],
            "index_map": [[0, 1]],
        }
    )
    assert isinstance(s, SelectBSDF)
    assert s.kind == "select:lambertian:rpv"


def test_selectbsdf_empty_children_raises():
    with pytest.raises(ValueError):
        SelectBSDF(bsdfs=[], index_map=np.array([[0]]))
