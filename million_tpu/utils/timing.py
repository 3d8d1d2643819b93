"""Benchmark timing that is honest on remote/async TPU runtimes.

Two failure modes of naive `block_until_ready` loops on tunneled devices:
(1) repeated identical dispatches may be elided/cached, reporting impossible
speeds; (2) a device->host readback costs a large fixed RTT that swamps
microsecond kernels. `chained_bench` defeats both: every iteration consumes
the previous iteration's output (a real data dependency, so all iterations
must execute on device) and only the final state is read back; the fixed
RTT is removed by differencing two chain lengths.

This is the role the reference's Timer + torch.cuda.synchronize() protocol
plays (scripts/utils/Timer.py, main_pq.py:50), rebuilt for XLA semantics.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import numpy as np


def _force(x: Any) -> None:
    """Force real completion: read a few bytes back to the host."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def chained_bench(
    step: Callable[[Any], Any],
    init_state: Any,
    iters: int = 30,
    warmup: int = 2,
) -> float:
    """Return seconds per call of `step`, a state -> state function.

    All `iters` calls are chained through the state so the device must run
    every one; the tunnel RTT and dispatch overheads are removed by timing
    chains of length `iters` and length `iters // 4` and differencing.

    `init_state` may be a zero-arg callable producing a fresh state — use
    this when `step` donates its input buffers (each timing run then starts
    from a new state instead of a consumed one).
    """
    factory = init_state if callable(init_state) else (lambda: init_state)

    s = factory()
    for _ in range(warmup):
        s = step(s)
    _force(s)
    del s  # don't hold GBs of warmup state across the timed runs

    def run(n: int) -> float:
        st = factory()
        t0 = time.perf_counter()
        for _ in range(n):
            st = step(st)
        _force(st)
        del st
        return time.perf_counter() - t0

    short = max(1, iters // 4)
    t_long = run(iters)
    t_short = run(short)
    return max((t_long - t_short) / (iters - short), 1e-9)


def chained_bench_stats(
    step: Callable[[Any], Any],
    init_state: Any,
    iters: int = 30,
    warmup: int = 2,
    repeats: int = 5,
) -> dict:
    """chained_bench repeated `repeats` times WITHIN one invocation,
    returning {"p50", "p10", "p90", "samples"} seconds-per-call. The
    tunnel-host variance between sessions is ~25% (BENCH_r01-03 headline
    wobble, VERDICT r3 weak #7); a median-of-N inside the run separates
    that session noise from real regressions."""
    factory = init_state if callable(init_state) else (lambda: init_state)

    s = factory()
    for _ in range(warmup):
        s = step(s)
    _force(s)
    del s

    def run(n: int) -> float:
        st = factory()
        t0 = time.perf_counter()
        for _ in range(n):
            st = step(st)
        _force(st)
        del st
        return time.perf_counter() - t0

    short = max(1, iters // 4)
    samples = []
    for _ in range(repeats):
        t_long = run(iters)
        t_short = run(short)
        samples.append(max((t_long - t_short) / (iters - short), 1e-9))
    arr = np.asarray(samples)
    return {
        "p50": float(np.median(arr)),
        "p10": float(np.percentile(arr, 10)),
        "p90": float(np.percentile(arr, 90)),
        "samples": [float(x) for x in arr],
    }
