"""Multi-host runtime initialization.

The reference is single-process, single-GPU (SURVEY.md §2.3). A multi-host
TPU deployment of this engine launches one process per host; this module
wraps `jax.distributed.initialize` with the conventions the rest of
`parallel/` assumes:

  * every process calls `initialize()` before touching devices;
  * `global_mesh(dp, tp, sp, dcn)` then builds the mesh over ALL processes'
    devices in the same axis order everywhere (jax.devices() is globally
    consistent after initialize), with the `dcn` axis outermost so slices
    map to DCN and the inner axes ride ICI — pq_cache_shardings /
    sharded_decode work unchanged.

On TPU pods the coordinator/process topology is auto-detected from the TPU
environment, so bare `initialize()` suffices; explicit arguments exist for
CPU/GPU clusters and tests.
"""

from __future__ import annotations

from typing import Optional

import jax

from million_tpu.parallel.mesh import make_mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kw,
) -> None:
    """Idempotent jax.distributed.initialize.

    Bare initialize() attempts cluster AUTO-DETECTION (the TPU-pod case:
    jax reads the TPU environment) and quietly degrades to single-process
    when no cluster environment exists — so local scripts and tests need no
    special-casing. Explicit arguments are forwarded verbatim and must be
    passed BEFORE any JAX computation runs (jax requirement; nothing here
    touches the backend first).
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None and process_id is None:
        try:
            jax.distributed.initialize(**kw)  # auto-detect (TPU pod env)
        except Exception:  # noqa: BLE001 — no cluster environment
            pass
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )
    _initialized = True


def global_mesh(dp: int = 1, tp: int = 1, sp: int = 1, dcn: int = 1):
    """Mesh over all processes' devices (axis order ("dcn","dp","tp","sp")).

    Callers shard with the same PartitionSpecs as single-process code;
    jax places each process's addressable shards automatically."""
    initialize()
    return make_mesh(dp=dp, tp=tp, sp=sp, dcn=dcn, devices=jax.devices())
