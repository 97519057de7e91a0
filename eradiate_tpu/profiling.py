"""Profiling & performance counters.

SURVEY §5 flags the reference's tracing story as minimal (tqdm progress
gated by ``ProgressLevel``, ``config/_settings.py:14-61``) and directs the
TPU build to make ``jax.profiler`` traces and per-kernel samples/s counters
first-class. This module provides:

- :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard/XProf trace directory;
- :func:`annotate` — named ``TraceAnnotation`` scope so driver phases show
  up on the trace timeline;
- :class:`RenderStats` + the global :data:`stats` recorder — wall-clock,
  path counts and samples/s for every render dispatch, queryable after a
  run (``eradiate_tpu.profiling.stats.last`` / ``.summary()``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

__all__ = ["trace", "annotate", "RenderStats", "stats", "timed_render"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host profiler trace into ``log_dir`` (view with
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    with jax.profiler.trace(str(log_dir), create_perfetto_link=create_perfetto_link):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible on profiler timelines (host + device)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class RenderRecord:
    label: str
    wall_s: float
    n_paths: int
    spectral_size: int
    n_pixels: int
    spp: int

    @property
    def samples_per_s(self) -> float:
        return self.n_paths / self.wall_s if self.wall_s > 0 else 0.0


class RenderStats:
    """Accumulates per-dispatch render statistics."""

    def __init__(self):
        self.records: list[RenderRecord] = []

    def record(self, label, wall_s, spectral_size, n_pixels, spp):
        rec = RenderRecord(
            label=label,
            wall_s=wall_s,
            n_paths=int(spectral_size) * int(n_pixels) * int(spp),
            spectral_size=int(spectral_size),
            n_pixels=int(n_pixels),
            spp=int(spp),
        )
        self.records.append(rec)
        return rec

    @property
    def last(self) -> RenderRecord | None:
        return self.records[-1] if self.records else None

    def summary(self) -> dict:
        """Aggregate counters: total paths, wall time, mean samples/s."""
        if not self.records:
            return {"n_renders": 0, "total_paths": 0, "total_wall_s": 0.0,
                    "samples_per_s": 0.0}
        total_paths = sum(r.n_paths for r in self.records)
        total_wall = sum(r.wall_s for r in self.records)
        return {
            "n_renders": len(self.records),
            "total_paths": total_paths,
            "total_wall_s": total_wall,
            "samples_per_s": total_paths / total_wall if total_wall > 0 else 0.0,
        }

    def clear(self):
        self.records.clear()


#: global recorder fed by the experiment drivers
stats = RenderStats()


def timed_render(label, fn, *, spectral_size, n_pixels, spp):
    """Run ``fn()`` (a render returning device arrays), block on the
    result, and record wall time + samples/s under ``label``."""
    import jax

    t0 = time.perf_counter()
    out = fn()
    out = jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    stats.record(label, wall, spectral_size, n_pixels, spp)
    return out


# ---------------------------------------------------------------------------
# Roofline accounting (BASELINE: kernels "profiled to speed-of-light")

#: TPU v5e per-chip peaks (public spec: 197 TFLOP/s bf16 MXU, 819 GB/s
#: HBM). The VPU f32 peak is an estimate (8 x 128 x 8 lanes x ~0.94 GHz
#: x 2 FLOP/FMA ~ 3.9 TFLOP/s) — elementwise f32 work can never ride the
#: MXU, so it rooflines against this much lower ceiling.
V5E_PEAKS = {
    "hbm_bytes_per_s": 819e9,
    "mxu_bf16_flop_per_s": 197e12,
    "vpu_f32_flop_per_s": 3.9e12,
}


def kernel_roofline(label, wall_s, flops, bytes_moved, unit="vpu_f32"):
    """Achieved-vs-peak accounting for one kernel invocation.

    ``flops``: analytic FLOP count of the invocation; ``bytes_moved``:
    analytic HBM traffic (reads + writes of non-VMEM-resident operands);
    ``unit``: which compute ceiling applies ("mxu_bf16" for matmul-lowered
    work, "vpu_f32" for elementwise). Returns a dict with achieved rates,
    fractions of peak, arithmetic intensity, and the bound resource
    (whichever fraction is higher — that resource sets the kernel's
    speed-of-light).
    """
    peak_flops = V5E_PEAKS[f"{unit}_flop_per_s"]
    peak_bw = V5E_PEAKS["hbm_bytes_per_s"]
    achieved_flops = flops / wall_s if wall_s > 0 else 0.0
    achieved_bw = bytes_moved / wall_s if wall_s > 0 else 0.0
    frac_compute = achieved_flops / peak_flops
    frac_bw = achieved_bw / peak_bw
    return {
        "label": label,
        "wall_s": wall_s,
        "gflop_per_s": achieved_flops / 1e9,
        "gbytes_per_s": achieved_bw / 1e9,
        "frac_compute_peak": frac_compute,
        "frac_hbm_peak": frac_bw,
        "intensity_flop_per_byte": (
            flops / bytes_moved if bytes_moved else float("inf")
        ),
        "ridge_flop_per_byte": peak_flops / peak_bw,
        "bound": "compute" if frac_compute >= frac_bw else "hbm",
        "speed_of_light_frac": max(frac_compute, frac_bw),
    }
