"""Multi-host initialization for pod-slice runs.

The reference is strictly single-host (its parallelism is the Mitsuba C++
thread pool over image blocks, ``src/eradiate/kernel/_render.py:433-468``);
this module is the TPU build's multi-host entry. On TPU pods
``jax.distributed.initialize()`` discovers coordinator/process topology
from the TPU environment automatically; on CPU/GPU fleets the caller (or
``ERADIATE_TPU_COORDINATOR`` etc.) supplies it explicitly.

Usage (one call at program start, before any jax computation)::

    import eradiate_tpu.parallel as p
    p.initialize()              # no-op if already initialized / single host
    mesh = p.make_render_mesh(n_spectral, n_sample)   # global device mesh
    result = p.render_sharded(scene, sensor, config, spp, mesh=mesh)

Every process calls ``render_*_sharded`` with the same host-side scene;
inputs are placed as global arrays (each process contributes only its
addressable shards) and outputs are gathered to every host — see
``render._put_global`` / ``render._fetch``.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` for a multi-host run.

    Parameters default to the ``ERADIATE_TPU_COORDINATOR`` /
    ``ERADIATE_TPU_NUM_PROCESSES`` / ``ERADIATE_TPU_PROCESS_ID`` env vars;
    on TPU pods all three may be omitted (the TPU runtime supplies the
    topology). Safe to call twice and in single-process runs: returns
    ``True`` when a multi-process backend is (already) up, ``False`` when
    running single-process.
    """
    global _initialized
    # IMPORTANT: do NOT touch backend-initializing jax APIs
    # (jax.process_count(), jax.devices(), ...) before
    # jax.distributed.initialize — on jax 0.9 they initialize the XLA
    # backend, after which distributed init always fails.
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "ERADIATE_TPU_COORDINATOR"
    )
    env_np = os.environ.get("ERADIATE_TPU_NUM_PROCESSES")
    env_pid = os.environ.get("ERADIATE_TPU_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    on_tpu_pod = any(
        v in os.environ for v in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not on_tpu_pod:
        # single host, nothing to initialize
        _initialized = True
        return False

    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as exc:
        # tolerable when the caller (or the TPU runtime) already
        # initialized; fatal when an explicit coordinator was requested
        # and we end up single-process anyway
        logger.warning("jax.distributed.initialize failed: %s", exc)
        if explicit and jax.process_count() <= 1:
            raise RuntimeError(
                "multi-host initialization was requested (coordinator "
                f"{coordinator_address!r}) but failed — call "
                "eradiate_tpu.parallel.initialize() before ANY other jax "
                "API use (jax.devices()/process_count() initialize the "
                "backend and block distributed setup)"
            ) from exc
    _initialized = True
    n = jax.process_count()
    if n > 1:
        logger.info(
            "multi-host up: process %d/%d, %d local / %d global devices",
            jax.process_index(), n,
            jax.local_device_count(), jax.device_count(),
        )
    return n > 1
