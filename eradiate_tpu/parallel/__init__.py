"""Distributed rendering layer (the reference has none — SURVEY §2.1).

``render.py`` holds the product path: sharded twins of every tracer
family over a ("spectral", "sample") device mesh, with global sample-id
slicing making sharded estimates equal single-device ones up to float
summation order. ``multihost.py`` is the ``jax.distributed`` entry.
"""

from .multihost import initialize  # noqa: F401
from .render import (  # noqa: F401
    make_render_mesh,
    render_canopy_polarized_sharded,
    render_canopy_sharded,
    render_dem_sharded,
    render_polarized_sharded,
    render_sharded,
    render_spherical_polarized_sharded,
    render_spherical_sharded,
)
