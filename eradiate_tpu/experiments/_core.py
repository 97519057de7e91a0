"""Experiment core.

Mirror of ``src/eradiate/experiments/_core.py``: an Experiment owns scene
elements + measures, compiles the scene, runs the engine and post-processes
results. TPU-first restructuring of the hot path (SURVEY §3.4): instead of
the reference's serial {spectral ctx x sensor} Python loop around
``mi.render``, each measure's full spectral grid is compiled into a single
device-resident spectral batch and rendered in one (sharded) engine call.
"""

from __future__ import annotations

import logging

import attrs
import numpy as np

from ..core.modes import mode
from ..core.rng import SeedState, root_seed_state
from ..pipelines.logic import postprocess_measure
from ..scenes.core import SceneElement
from ..scenes.illumination import (
    DirectionalIllumination,
    Illumination,
    illumination_factory,
)
from ..scenes.integrators import Integrator, integrator_factory
from ..scenes.measure import Measure, measure_factory
from ..spectral.ckd_quad import CKDQuadConfig

logger = logging.getLogger(__name__)

__all__ = ["Experiment", "EarthObservationExperiment", "run"]


def _measures_converter(value):
    if isinstance(value, (Measure, dict)):
        value = [value]
    return [measure_factory.convert(m, Measure) for m in value]


def _illumination_converter(value):
    return illumination_factory.convert(value, Illumination)


def _integrator_converter(value):
    if value == "auto" or value is None:
        return None
    return integrator_factory.convert(value, Integrator)


@attrs.define(eq=False, slots=False)
class Experiment(SceneElement):
    """Base experiment (``experiments/_core.py:129``)."""

    measures: list = attrs.field(
        factory=lambda: [measure_factory.convert({"type": "mdistant"})],
        converter=_measures_converter,
    )
    integrator: Integrator | None = attrs.field(
        default=None, converter=_integrator_converter
    )
    ckd_quad_config: CKDQuadConfig = attrs.field(
        factory=CKDQuadConfig, converter=CKDQuadConfig.convert
    )

    #: results per measure id, filled by postprocess()
    results: dict = attrs.field(factory=dict, init=False, repr=False)

    def clear(self):
        """Reset results (mirror of ``Experiment.clear``,
        ``_core.py:300-307``)."""
        self.results = {}
        for m in self.measures:
            m.results = {}

    # -- lifecycle ---------------------------------------------------------
    def init(self):
        raise NotImplementedError

    def process(self, spp=None, seed_state=None):
        raise NotImplementedError

    def postprocess(self):
        raise NotImplementedError


@attrs.define(eq=False, slots=False)
class EarthObservationExperiment(Experiment):
    """Experiment with directional illumination
    (``experiments/_core.py:427``)."""

    illumination: Illumination = attrs.field(
        factory=DirectionalIllumination, converter=_illumination_converter
    )

    # subclasses implement:
    def spectral_context(self, measure) -> dict:
        """Spectral evaluation arrays for one measure: dict with ``w`` [S]
        (+ CKD: ``g``, ``bin_index``, ``g_weights``, ``bin_wcenters``)."""
        raise NotImplementedError

    def compile_scene(self, measure, spectral_ctx):
        """Compile to (SceneArrays, SensorArrays, SceneConfig)."""
        raise NotImplementedError

    def init(self):
        pass

    def process(self, spp=None, seed_state=None):
        from ..ops.tracer import render
        from ..ops.tracer_spherical import render_spherical

        seed_state = seed_state or root_seed_state
        for measure in self.measures:
            ctx = self.spectral_context(measure)
            scene, sensor, config = self.compile_scene(measure, ctx)
            n = int(spp) if spp is not None else int(measure.spp)
            seed = int(seed_state.next())
            if config.geometry == "spherical_shell":
                if config.polarized:
                    raise NotImplementedError(
                        "polarized transport in spherical-shell geometry is "
                        "not implemented yet; use plane_parallel"
                    )
                raw = render_spherical(
                    scene.medium,
                    scene.surface,
                    scene.illumination,
                    sensor,
                    config,
                    spp=n,
                    seed=seed,
                )
            elif config.polarized:
                from ..ops.tracer_polarized import render_polarized

                raw = render_polarized(scene, sensor, config, spp=n, seed=seed)
            else:
                raw = render(scene, sensor, config, spp=n, seed=seed)
            measure.results = {"raw": raw, "spectral_ctx": ctx}

    def postprocess(self):
        for measure in self.measures:
            if not measure.results:
                continue
            mid = measure.id or f"measure_{self.measures.index(measure)}"
            self.results[mid] = postprocess_measure(
                measure,
                self.illumination,
                measure.results["raw"],
                measure.results["spectral_ctx"],
                mode(),
            )
        return self.results


def run(exp: Experiment, spp=None, seed_state=None):
    """Run an experiment end-to-end (mirror of ``eradiate.run()``,
    ``experiments/_core.py:808-865``). Returns the result dataset of the
    first measure (the reference's convenience behavior) while filling
    ``exp.results`` for all measures."""
    exp.init()
    exp.process(spp=spp, seed_state=seed_state)
    exp.postprocess()
    if len(exp.results) == 1:
        return next(iter(exp.results.values()))
    return exp.results
