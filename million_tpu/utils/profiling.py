"""Tracing / profiling utilities — the reference Timer/Ticker subsystem
(scripts/utils/Timer.py, SURVEY.md §5) rebuilt for XLA semantics.

The reference wraps attention sub-steps in named Timer singletons with
torch.cuda.synchronize() for attribution (modeling_llama.py:378-451) and
timestamps streamed tokens with a Ticker (speedtest.py:36-45). Under jit,
intra-graph host timers are meaningless; the equivalents are:

  * named_scope        — jax.profiler trace annotations (visible in xprof /
                         tensorboard traces), the analogue of the Timer
                         names on CUDA ranges;
  * trace              — context manager around jax.profiler.start_trace /
                         stop_trace writing a tensorboard-loadable trace;
  * StepTimer          — host-side phase timer with explicit forcing, for
                         coarse stage attribution (prefill vs decode loop),
                         reported like Timer.duration;
  * Ticker             — per-token host timestamps for TPOT/TTFT breakdowns
                         (same math as the reference's Ticker.intervals).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


named_scope = jax.named_scope  # re-export: with named_scope("attn.decode"): ...


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/million_tpu_trace"):
    """Capture an xprof trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _force(x: Any) -> None:
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


class StepTimer:
    """Named wall-clock phases with device forcing at the boundaries."""

    def __init__(self):
        self.durations: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            _force(result)
        dt = time.perf_counter() - t0
        self.durations[name] = self.durations.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in self.durations.items()
        }


class Ticker:
    """Per-event host timestamps (reference Ticker, Timer.py:80-98)."""

    def __init__(self):
        self.ticks: List[float] = []

    def tick(self) -> None:
        self.ticks.append(time.perf_counter())

    @property
    def intervals(self) -> np.ndarray:
        return np.diff(np.asarray(self.ticks))

    def tpot_ttft(self) -> Dict[str, float]:
        iv = self.intervals
        if len(iv) == 0:
            return {"ttft_s": float("nan"), "tpot_s": float("nan")}
        return {
            "ttft_s": float(iv[0]),
            "tpot_s": float(iv[1:].mean()) if len(iv) > 1 else float("nan"),
        }


def device_memory_report() -> Optional[Dict[str, float]]:
    """Live/peak HBM bytes (reference MemProfiler.report_cuda_memory,
    MemProfiler.py:12-19). Returns None where the runtime doesn't expose
    memory stats (e.g. tunneled dev devices)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k] = stats[k]
    return out or None


def trace_op_breakdown(
    fn,
    *,
    log_dir: Optional[str] = None,
    top: int = 12,
) -> Dict[str, float]:
    """Run `fn()` under a jax.profiler trace and return total device-op time
    per op-name family (ms) — the role of the reference's `--breakdown`
    Timer harvest (speedtest.py:110-117 + main_pq.py:50), attributed by the
    hardware profile instead of host timers around synchronize().

    Families group XLA op instances by name with fusion counters stripped
    ("iota_reduce_fusion.42" -> "iota_reduce_fusion"); named_scope
    annotations (e.g. "pq_decode_attention") appear inside the op names the
    trace records. Requires the tensorflow-bundled xplane proto; returns {}
    with a "breakdown_error" key when unavailable.
    """
    import glob
    import re
    import tempfile
    from collections import defaultdict

    if log_dir is None:
        # fresh dir per call: a shared path lets concurrent runs clobber
        # each other's in-flight traces
        log_dir = tempfile.mkdtemp(prefix="million_tpu_breakdown_")
    with jax.profiler.trace(log_dir):
        out = fn()
        _force(out)
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError as e:  # pragma: no cover - env without tensorflow
        return {"breakdown_error": f"xplane proto unavailable: {e}"}
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        return {"breakdown_error": "no xplane trace produced"}
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    tot: Dict[str, float] = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name and "CPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md[ev.metadata_id].name
                fam = re.sub(r"[.\d]+$", "", name.split(" = ")[0].lstrip("%"))
                tot[fam] += ev.duration_ps / 1e9  # -> ms
    if not tot:
        return {
            "breakdown_error": "no XLA Ops line in trace "
            "(per-op attribution requires a TPU profile)"
        }
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
    return {name: round(ms, 3) for name, ms in rows}
