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


def test_longbench_pipeline(tmp_path):
    """LongBench harness through the CLI with a local JSONL + byte tokenizer."""
    os.chdir(tmp_path)
    rows = [
        {"context": "The capital of France is Paris.", "input": "What is the capital?",
         "answers": ["Paris"], "all_classes": []},
        {"context": "Two plus two equals four.", "input": "What is 2+2?",
         "answers": ["four"], "all_classes": []},
    ]
    p = tmp_path / "hotpotqa.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "evaluation",
        "-o", "run.dataset=longbench:hotpotqa",
        "-o", f"run.data_path={p}",
        "-o", "run.max_length=192",
        "-o", f"run.results={tmp_path}/lb.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
    ])
    rows = read_results(tmp_path / "lb.jsonl")
    res = rows[0]["result"]
    assert res["dataset"] == "hotpotqa"
    assert res["n"] == 2
    assert 0.0 <= res["score"] <= 1.0


def test_lm_eval_pipeline(tmp_path):
    """Hermetic loglikelihood multiple-choice accuracy through the CLI."""
    os.chdir(tmp_path)
    rows = [
        {"context": "The sky is", "choices": [" blue", " a potato"], "label": 0},
        {"context": "Water is", "choices": [" wet", " dry"], "label": 0},
    ]
    p = tmp_path / "mc.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "evaluation",
        "-o", f"run.dataset=lm_eval:{p}",
        "-o", f"run.results={tmp_path}/mc_res.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
    ])
    res = read_results(tmp_path / "mc_res.jsonl")[0]["result"]
    assert res["n"] == 2
    assert 0.0 <= res["acc"] <= 1.0


def test_asymmetric_geometry_pipeline(tmp_path):
    """pq.M_v / pq.nbits_v opt into the asymmetric kernel geometry through
    the full pipeline (training trains per-side codebooks; evaluation runs
    the v_direct kernel path)."""
    os.chdir(tmp_path)
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "sampling", "training", "evaluation",
        "-o", "pq.M_v=4",
        "-o", "pq.nbits_v=5",
        "-o", f"run.results={tmp_path}/asym.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
        "-o", "run.prefill_lengths=[64]",
        "-o", "run.decode_length=8",
    ])
    rows = read_results(tmp_path / "asym.jsonl")
    assert rows[0]["result"]["results"][0]["tpot_s"] > 0
    z = np.load(tmp_path / "artifacts/test-tiny/_synthetic/cents_M8_nbits5_V4_5.npz")
    assert z["key"].shape == (2, 8, 32, 2)   # K: d_m=2
    assert z["value"].shape == (2, 4, 32, 4)  # V: d_m=4


def test_opq_pipeline(tmp_path):
    """pq.opq=true trains OPQ rotations + codebooks and evaluation runs the
    rotated-cache kernel path (the stage the reference CLI rejects,
    main_pq.py:67-68)."""
    os.chdir(tmp_path)
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "sampling", "training", "evaluation",
        "-o", "pq.opq=true",
        "-o", "pq.train_iters=6",
        "-o", f"run.results={tmp_path}/opq.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
        "-o", "run.prefill_lengths=[64]",
        "-o", "run.decode_length=8",
    ])
    rows = read_results(tmp_path / "opq.jsonl")
    assert rows[0]["result"]["results"][0]["tpot_s"] > 0
    z = np.load(tmp_path / "artifacts/test-tiny/_synthetic/cents_M8_nbits5_opq.npz")
    assert z["Rk"].shape == (2, 16, 16)
    # rotations orthogonal
    np.testing.assert_allclose(z["Rk"][0] @ z["Rk"][0].T, np.eye(16), atol=1e-4)


def test_native_trainer_pipeline(tmp_path):
    """pq.native_trainer=true trains codebooks in the C++ host library
    (native/pqlib.cpp) instead of the JAX trainer."""
    from million_tpu.native import native_available

    if not native_available():
        import pytest

        pytest.skip("no native toolchain")
    os.chdir(tmp_path)
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "sampling", "training", "evaluation",
        "-o", "pq.native_trainer=true",
        "-o", f"run.results={tmp_path}/nat.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
        "-o", "run.prefill_lengths=[64]",
        "-o", "run.decode_length=8",
    ])
    rows = read_results(tmp_path / "nat.jsonl")
    assert rows[0]["result"]["results"][0]["tpot_s"] > 0
    z = np.load(tmp_path / "artifacts/test-tiny/_synthetic/cents_M8_nbits5.npz")
    assert np.isfinite(z["key"]).all()


def test_outlier_pipeline(tmp_path):
    """pq.outlier_k/outlier_v as first-class pipeline flags (round 5: the
    headline dm4+outlier geometry reachable end-to-end): training selects
    top-energy channels per layer, zeroes them before k-means, persists
    the idx arrays; evaluation runs the outlier-corrected cache path."""
    os.chdir(tmp_path)
    main([
        "-f", "/root/repo/configs/test-tiny.json",
        "-p", "sampling", "training", "evaluation",
        "-o", "pq.M=4",
        "-o", "pq.outlier_k=2",
        "-o", "pq.outlier_v=2",
        "-o", f"run.results={tmp_path}/out.jsonl",
        "-o", f"run.artifacts={tmp_path}/artifacts",
        "-o", "run.prefill_lengths=[64]",
        "-o", "run.decode_length=8",
    ])
    rows = read_results(tmp_path / "out.jsonl")
    assert rows[0]["result"]["results"][0]["tpot_s"] > 0
    z = np.load(
        tmp_path / "artifacts/test-tiny/_synthetic/cents_M4_nbits5_ok2_ov2.npz"
    )
    assert z["k_outlier_idx"].shape == (2, 2)
    assert z["v_outlier_idx"].shape == (2, 2)
    # zeroed-channel contract: the trained codebooks carry exactly-zero
    # components at the selected channels (strided layout)
    M = 4
    for L in range(2):
        for c in z["k_outlier_idx"][L]:
            assert abs(z["key"][L, c % M, :, c // M]).max() == 0.0
