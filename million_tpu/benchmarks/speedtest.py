"""End-to-end latency harness (reference scripts/benchmarks/speedtest.py).

Synthetic random prompts (speedtest.py:31-33), greedy decode, TPOT/TTFT per
prefill length (speedtest.py:104-108). Decode lengths and the prefill sweep
default to the reference's values (speedtest.py:11-14).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from million_tpu.models import llama
from million_tpu.runtime.generate import generate
from million_tpu.runtime.sampling import SamplingConfig


def is_oom_error(e: Exception) -> bool:
    msg = str(e)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Out of memory" in msg
        or "OOM" in msg
    )


def oom_guard(fn):
    """Continue a benchmark sweep past device-OOM points: the failing
    configuration yields an {"oom": True} row instead of killing the run
    (the reference's IgnoreOOM decorator, speedtest.py:16-29, which cleared
    the CUDA cache and returned None). XLA frees the failed allocation's
    live buffers when the exception unwinds; a gc pass drops the python
    references that pin them."""
    import functools
    import gc

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as e:  # noqa: BLE001 — classify, re-raise others
            if not is_oom_error(e):
                raise
            gc.collect()
            return {"oom": True, "error": str(e).splitlines()[0][:200]}

    return wrapped


def speedtest(
    params,
    cfg: llama.ModelConfig,
    make_cache,  # (prefill_len) -> fresh cache
    cents,
    *,
    mode: str = "pq_pallas",
    prefill_lengths: List[int] = (1024, 4096),
    decode_length: int = 64,
    seed: int = 0,
    breakdown: bool = False,
) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    rows = []
    for pl in prefill_lengths:
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, pl)), jnp.int32)
        guarded = oom_guard(
            lambda: generate(
                params, cfg, ids, make_cache(pl), cents,
                mode=mode, max_new_tokens=decode_length,
                sampling=SamplingConfig(),
            )
        )()
        if isinstance(guarded, dict) and guarded.get("oom"):
            # sweep continues past the lengths that no longer fit
            rows.append({"prefill_length": pl, **guarded})
            continue
        res, _ = guarded
        row = {
            "prefill_length": pl,
            "decode_length": decode_length,
            "ttft_s": res.ttft_s,
            "tpot_s": res.tpot_s,
            "tokens_per_s": 1.0 / res.tpot_s if res.tpot_s > 0 else None,
        }
        if breakdown:
            # device-op attribution of a SECOND generate over the same
            # shapes (compiled paths warm) — the reference's --breakdown
            # per-substep Timer harvest, via the hardware profile
            from million_tpu.utils.profiling import trace_op_breakdown

            row["breakdown_ms"] = trace_op_breakdown(
                lambda: generate(
                    params, cfg, ids, make_cache(pl), cents,
                    mode=mode, max_new_tokens=decode_length,
                    sampling=SamplingConfig(),
                )[0].tokens
            )
        rows.append(row)
    return {"mode": mode, "results": rows}
