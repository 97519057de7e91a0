"""DEM experiment.

Mirror of ``DEMExperiment`` (``src/eradiate/experiments/_dem.py:39``): a 1D
atmosphere over a terrain (heightfield) surface.
"""

from __future__ import annotations

import attrs

from ..scenes.surface import DEMSurface
from ._atmosphere import AtmosphereExperiment

__all__ = ["DEMExperiment"]


@attrs.define(eq=False, slots=False)
class DEMExperiment(AtmosphereExperiment):
    """1D atmosphere + DEM surface."""

    def __attrs_post_init__(self):
        super().__attrs_post_init__()
        if self.geometry.kind != "plane_parallel":
            raise ValueError("DEMExperiment requires plane-parallel geometry")

    def process(self, spp=None, seed_state=None, checkpoint_dir=None,
                mesh="auto"):
        if not isinstance(self.surface, DEMSurface):
            return super().process(spp=spp, seed_state=seed_state, mesh=mesh)

        from ..core.modes import mode
        from ..core.rng import root_seed_state
        from ..ops.tracer_dem import render_dem
        from ._core import resolve_mesh

        mesh = resolve_mesh(mesh)
        seed_state = seed_state or root_seed_state
        dtype = mode().device_dtype
        dem = self.surface.dem_arrays(dtype=dtype)
        tris = None
        if getattr(self.surface, "triangulate", False):
            from ..ops.dem import mesh_from_dem

            tris = mesh_from_dem(
                self.surface.elevation, self.surface.x0, self.surface.y0,
                self.surface.dx, self.surface.dy, dtype=dtype,
            )
            if mesh is not None:
                raise NotImplementedError(
                    "triangulated DEM rendering is single-device only "
                    "(pass mesh=None); the marched heightfield path "
                    "shards"
                )
        for measure in self.measures:
            ctx = self.spectral_context(measure)
            scene, sensor, config = self.compile_scene(measure, ctx)
            n = int(spp) if spp is not None else int(measure.spp)
            if mesh is not None:
                from ..parallel import render_dem_sharded

                raw = render_dem_sharded(
                    scene, dem, sensor, config, spp=n,
                    seed=int(seed_state.next()), mesh=mesh,
                )
            else:
                raw = render_dem(
                    scene, dem, sensor, config, spp=n,
                    seed=int(seed_state.next()), tris=tris,
                    n_march=getattr(self.surface, "march_steps", 128),
                    n_bisect=getattr(self.surface, "bisect_steps", 16),
                )
            measure.results = {"raw": raw, "spectral_ctx": ctx}
