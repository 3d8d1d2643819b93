"""Pipeline smoke test: all four stages end-to-end on the tiny config
(the reference's test.sh role, but hermetic and assertion-checked)."""

import json
import os

import numpy as np
import pytest

from million_tpu.cli import main
from million_tpu.utils.ledger import read_results


def test_full_pipeline(tmp_path):
    os.chdir(tmp_path)
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "baseline", "sampling", "training", "evaluation",
        "-o", f"run.results={tmp_path}/results.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
        "-o", "run.prefill_lengths=[64]",
        "-o", "run.decode_length=8",
    ])
    rows = read_results(tmp_path / "results.jsonl")
    stages = [r["stage"] for r in rows]
    assert stages == ["baseline", "evaluation"]
    for r in rows:
        tpot = r["result"]["results"][0]["tpot_s"]
        assert tpot > 0
    # training artifact exists and has the right shapes
    z = np.load(tmp_path / "artifacts/test-tiny/_synthetic/cents_M8_nbits5.npz")
    assert z["key"].shape == (2, 8, 32, 2)  # (L, M, C, d_m)
    assert np.isfinite(z["key"]).all()
    # sampling artifacts exist
    assert (tmp_path / "artifacts/test-tiny/_synthetic/layer0.key.fvecs").exists()


def test_perplexity_pipeline(tmp_path):
    """ppl benchmark path with a synthetic .npy token file and PQ mode."""
    os.chdir(tmp_path)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 256, 512).astype(np.int32)
    np.save(tmp_path / "stream.npy", toks)
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "baseline", "evaluation",
        "-o", f"run.dataset={tmp_path}/stream.npy",
        "-o", "run.max_length=128",
        "-o", "run.max_windows=2",
        "-o", f"run.results={tmp_path}/r.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
    ])
    rows = read_results(tmp_path / "r.jsonl")
    base, ev = rows[0]["result"], rows[1]["result"]
    assert base["ppl"] > 0 and np.isfinite(base["ppl"])
    assert ev["ppl"] > 0 and np.isfinite(ev["ppl"])
    assert ev["windows"] == 2
