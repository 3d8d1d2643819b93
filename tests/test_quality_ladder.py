"""Pinned end-to-end quality contract (VERDICT round-1 item 2).

Runs the REAL pipeline — KV sampling from the pinned trained byte-LM's own
prefill, production k-means, distorted-prefill teacher-forced ppl — and
asserts Δppl(dense -> PQ, M=d/2, nbits=8) stays under a pinned bound.
Measured at pin time: dense ppl 13.17, PQ ppl 13.64, Δppl +0.47 (+3.5%
relative — the same order as the reference's +0.22 on 5.12, +4.3%
relative, BASELINE.md). The bound leaves ~40% headroom for k-means seed
jitter; a regression in encode/decode/flush/codebook quality blows
through it.

The full ladder (nbits 8..12, degenerate d_m=4, OPQ, asymmetric V) is
benchmarks/quality_ladder.py; its measured table lives in PERF.md.
"""

import numpy as np
import pytest

from million_tpu.benchmarks.tiny_lm import checkpoint_path


pytestmark = pytest.mark.skipif(
    not checkpoint_path().exists(),
    reason="quality checkpoint not trained (python -m million_tpu.benchmarks.tiny_lm)",
)


def test_dppl_nbits8_pinned():
    from million_tpu.benchmarks.quality_ladder import run_ladder

    out = run_ladder(fast=True, max_windows=2)
    dense = out["dense_ppl"]
    row = out["rows"][0]
    assert np.isfinite(dense) and dense < 25, f"dense ppl degenerated: {dense}"
    dppl = row["dppl"]
    # quantization must cost something (sanity that the harness bites) but
    # stay within the pinned envelope
    assert 0.0 < dppl < 0.9, f"Δppl(nbits=8) = {dppl} (dense {dense})"
    assert row["ppl"] / dense < 1.07, "relative ppl regression > 7%"
