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

    Single-process runs (num_processes in (None-with-no-cluster, 1)) skip
    the barrier entirely so local scripts and tests need no special-casing.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    if num_processes in (None, 1) and coordinator_address is None:
        # no cluster requested/detectable -> single-process mode
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
