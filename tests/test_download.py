"""Downloader fetchers (reference download.py:16-62) + the pinned
real-text fixture path: offline environments fall back to the fixtures and
the real-data harnesses stay runnable end to end."""

from pathlib import Path

import numpy as np
import pytest

from million_tpu.benchmarks.registry import ByteTokenizer, load_tokens
from million_tpu.utils import download


FIXTURE = Path(__file__).parent / "fixtures" / "realtext.txt"


def test_offline_ppl_fetch_returns_fixture(tmp_path, monkeypatch):
    monkeypatch.setattr(download, "have_network", lambda *a, **k: False)
    p = download.fetch_ppl_dataset("wikitext-2", tmp_path)
    assert p == FIXTURE and p.exists()


def test_offline_longbench_fetch_returns_fixture(tmp_path, monkeypatch):
    monkeypatch.setattr(download, "have_network", lambda *a, **k: False)
    p = download.fetch_longbench_task("passage_count", tmp_path)
    assert p.name == "longbench_fixture.jsonl" and p.exists()


def test_offline_model_fetch_raises(monkeypatch):
    monkeypatch.setattr(download, "have_network", lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="no network"):
        download.fetch_model("TinyLlama/TinyLlama-1.1B-Chat-v1.0", Path("/tmp"))


def test_fixture_is_real_text_and_tokenizes():
    text = FIXTURE.read_text()
    assert len(text) > 100_000  # enough for multiple ppl windows
    words = text.split()
    assert sum(w.isalpha() for w in words) / len(words) > 0.5  # prose
    ids = load_tokens(str(FIXTURE), tokenizer=ByteTokenizer(), vocab_size=256)
    assert ids.dtype == np.int32 and len(ids) > 100_000
    assert ids.min() >= 0 and ids.max() < 256


@pytest.mark.slow
def test_cli_perplexity_on_real_text(tmp_path, rng):
    """The full pipeline (sampling -> training -> evaluation) on the pinned
    REAL text fixture — the non-synthetic results.jsonl row (VERDICT r2
    item 9)."""
    import sys

    from million_tpu.cli import main

    results = tmp_path / "results.jsonl"
    cfg_path = Path(__file__).parent.parent / "configs" / "test-tiny.json"
    argv = sys.argv
    sys.argv = [
        "cli", "-f", str(cfg_path),
        "-p", "sampling", "training", "evaluation",
        "-o", f"run.dataset={FIXTURE}",
        "-o", "run.max_length=256", "-o", "run.max_windows=2",
        "-o", "pq.sample_target=2048", "-o", "pq.train_samples=2048",
        "-o", f"run.results={results}",
        "-o", f"run.artifacts={tmp_path}",
    ]
    try:
        main()
    finally:
        sys.argv = argv
    import json

    rows = [json.loads(l) for l in results.read_text().splitlines()]
    ev = [r for r in rows if r["stage"] == "evaluation"]
    assert ev and np.isfinite(ev[-1]["result"]["ppl"])
