"""Unit tests: plotting helpers + labeled-array utilities
(reference ``plot.py``, ``xarray/interp.py``)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import eradiate_tpu
from eradiate_tpu.core.warp import square_to_uniform_hemisphere
from eradiate_tpu.experiments import AtmosphereExperiment
from eradiate_tpu.plot import (
    detect_axes,
    make_ticks,
    plot_brf_hplane,
    remove_xylabels,
    remove_xyticks,
    set_style,
)
from eradiate_tpu.xarray_utils import dataarray_to_rgb, film_to_angular


def test_set_style_and_axes_helpers():
    set_style()
    fig, ax = plt.subplots()
    assert detect_axes(fig) == [ax]
    assert detect_axes(ax) == [ax]
    remove_xylabels(ax)
    remove_xyticks(ax)
    assert ax.get_xlabel() == ""
    plt.close(fig)


def test_make_ticks():
    steps, labels = make_ticks(3, (0.0, np.pi))
    np.testing.assert_allclose(steps, [0.0, np.pi / 2, np.pi])
    assert labels == ["0°", "90°", "180°"]


def test_detect_axes_rejects_junk():
    with pytest.raises(TypeError):
        detect_axes(42)


def test_plot_brf_hplane(mode_mono):
    exp = AtmosphereExperiment(
        measures={
            "type": "mdistant",
            "construct": "hplane",
            "zeniths": np.linspace(-60, 60, 5),
            "azimuth": 0.0,
            "spp": 8,
            "id": "m",
        },
        surface={"type": "lambertian", "reflectance": 0.5},
        atmosphere=None,
    )
    result = eradiate_tpu.run(exp)
    ax = plot_brf_hplane(result, "brf")
    assert ax.get_xlabel().startswith("Viewing zenith")
    assert len(ax.lines) >= 1
    plt.close(ax.figure)


def test_film_to_angular_constant_field():
    data = np.full((16, 16), 3.5)
    out = film_to_angular(data, theta=[0.1, 0.5, 1.0], phi=[0.0, np.pi])
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out, 3.5)


def test_film_to_angular_recovers_gradient():
    """Film painted with the pixel-direction cosine is read back as
    cos(theta) at matching angles (up to bilinear error)."""
    nx = ny = 64
    u = (np.arange(nx) + 0.5) / nx
    v = (np.arange(ny) + 0.5) / ny
    uu, vv = np.meshgrid(u, v, indexing="ij")
    dirs = square_to_uniform_hemisphere(np.stack([uu, vv], axis=-1))
    film = dirs[..., 2]  # cos(theta) per pixel
    theta = np.array([0.2, 0.6, 1.0])
    out = film_to_angular(film, theta=theta, phi=[0.7])
    np.testing.assert_allclose(out[:, 0], np.cos(theta), atol=0.02)


def test_film_to_angular_flat_input():
    data = np.arange(64, dtype=float)
    out = film_to_angular(data, theta=[0.3], phi=[0.1], film_shape=(8, 8))
    assert out.shape == (1, 1)


def test_dataarray_to_rgb():
    spectral = np.stack(
        [np.full((4, 4), 0.2), np.full((4, 4), 0.4), np.full((4, 4), 0.8)]
    )
    rgb = dataarray_to_rgb(spectral, channels=(2, 1, 0))
    assert rgb.shape == (4, 4, 3)
    np.testing.assert_allclose(rgb[..., 0], 1.0)  # normalized peak
    assert (rgb[..., 2] < rgb[..., 1]).all()
    with pytest.raises(ValueError):
        dataarray_to_rgb(spectral, channels=(0, 1))
