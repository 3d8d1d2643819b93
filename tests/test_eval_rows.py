"""Measured-row eval runner (benchmarks/eval_rows.py): harness plumbing +
the PQ~=dense quality gate on the small anchor (the large-anchor measured
rows in results.jsonl come from the real runner invocation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.benchmarks import tiny_lm
from million_tpu.benchmarks.eval_rows import (
    ByteTokenizer,
    build_mc_items,
    build_task_rows,
)
from million_tpu.benchmarks.lm_eval_adapter import evaluate_multiple_choice
from million_tpu.benchmarks.quality_ladder import sample_kv, train_cents
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.models.llama import build_tables


@pytest.fixture(scope="module")
def anchor():
    params, cfg = tiny_lm.load_checkpoint(tiny_lm.checkpoint_path())
    corpus = tiny_lm.build_corpus()
    kv_k, kv_v = sample_kv(params, cfg, jnp.asarray(corpus[: 4 * 512], jnp.int32),
                           windows=4)
    M = cfg.head_dim // 2
    cents = {"key": train_cents(kv_k, M, 8)[0],
             "value": train_cents(kv_v, M, 8)[0]}
    return params, cfg, corpus, build_tables(cents), M


def test_task_rows_schema(anchor):
    _, _, corpus, _, _ = anchor
    rng = np.random.default_rng(0)
    for task in ("lcc", "passage_count", "passage_retrieval_en"):
        rows = build_task_rows(corpus, task, 3, rng)
        assert len(rows) == 3
        for r in rows:
            assert {"context", "input", "answers"} <= set(r)
            assert r["answers"] and isinstance(r["answers"][0], str)
    # fixed prompt length per task (one prefill executable per mode)
    tok = ByteTokenizer()
    from million_tpu.benchmarks.longbench import dataset2prompt

    lens = {len(tok(dataset2prompt["lcc"].format(**r))["input_ids"])
            for r in build_task_rows(corpus, "lcc", 3, rng)}
    assert len(lens) == 1


def test_mc_gate_pq_tracks_dense(anchor):
    """The byte-MC battery scores far above chance on the trained anchor,
    and PQ tracks dense within the quality-contract margin — the lm-eval
    analogue of the Δppl gate (VERDICT r3 item 5)."""
    params, cfg, corpus, tables, M = anchor
    rng = np.random.default_rng(1)
    items = build_mc_items(corpus, 24, rng)

    def mk_dense():
        return init_dense_state(DenseCacheConfig(
            bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=256,
            dtype=cfg.dtype), cfg.num_layers)

    def mk_pq():
        return init_state(PQCacheConfig(
            bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=256,
            Lt=128, N_max=256, dtype=cfg.dtype), cfg.num_layers)

    acc_d = evaluate_multiple_choice(params, cfg, mk_dense, tables, items,
                                     mode="dense")["acc"]
    acc_p = evaluate_multiple_choice(params, cfg, mk_pq, tables, items,
                                     mode="pq")["acc"]
    assert acc_d > 0.4, f"trained anchor should beat 0.25 chance: {acc_d}"
    assert acc_p >= acc_d - 0.21, f"PQ acc {acc_p} fell too far below dense {acc_d}"


def test_new_task_rows_schema(anchor):
    """Round-5 additions: repobench-p and the synthetic needle task build
    valid release-schema rows at fixed prompt lengths; code tasks scale
    with ctx_bytes."""
    _, _, corpus, _, _ = anchor
    rng = np.random.default_rng(0)
    from million_tpu.benchmarks.longbench import dataset2metric, dataset2prompt

    for task in ("repobench-p", "needle_retrieval"):
        rows = build_task_rows(corpus, task, 3, rng)
        assert len(rows) == 3 and task in dataset2metric
        tok = ByteTokenizer()
        lens = {
            len(tok(dataset2prompt[task].format(**r))["input_ids"])
            for r in rows
        }
        assert len(lens) == 1, f"{task}: variable prompt lengths {lens}"
    # needle rows: answer parses under the real retrieval metric and a
    # correct prediction scores 1.0 while a wrong one scores 0.0
    from million_tpu.benchmarks.longbench import retrieval_score

    r = build_task_rows(corpus, "needle_retrieval", 1, rng)[0]
    gt = r["answers"][0]
    num = gt.split()[-1]
    assert retrieval_score(num + ".", gt) == 1.0
    assert retrieval_score("99.", gt) == 0.0
    # ctx scaling: longer rows really carry longer contexts
    short = build_task_rows(corpus, "lcc", 1, rng, ctx_bytes=1024)[0]
    long = build_task_rows(corpus, "lcc", 1, rng, ctx_bytes=4096)[0]
    assert len(long["context"]) == 4 * len(short["context"])


def test_cloze_items_schema(anchor):
    from million_tpu.benchmarks.eval_rows import build_cloze_items

    _, _, corpus, _, _ = anchor
    items = build_cloze_items(corpus, 6, np.random.default_rng(0))
    assert len(items) == 6
    for it in items:
        assert len(it["choices_ids"]) == 4
        assert 0 <= it["label"] < 4
        assert all(len(c) >= 1 for c in it["choices_ids"])
        # distractors differ from the true choice
        true = it["choices_ids"][it["label"]]
        assert sum(c == true for c in it["choices_ids"]) == 1
