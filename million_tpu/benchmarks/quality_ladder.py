"""End-to-end quality ladder: Δppl(dense → PQ) on a trained model + real text.

The reference's quality anchor is teacher-forced wikitext-2 perplexity of
llama-2-7b with fully-quantized history (distort_recent), swept over nbits
8..12 and M geometries (BASELINE.md ppl rows; protocol main_pq.py:251-407).
This module reproduces that protocol at environment scale against the
pinned trained byte-LM (benchmarks/tiny_lm.py): for each ladder rung it
runs the REAL pipeline — sample KV from the model's own prefill on held-out
text, train codebooks with the production k-means, evaluate distorted-
prefill ppl — and reports Δppl vs the dense baseline.

Rungs:
  - M = d/2 (d_m=2), nbits 8..12  — the BASELINE sensitivity ladder
    (nbits 9-12 run the int16/jnp path, like the reference's pure-torch
    nbits != 8 route)
  - M = d/4 (d_m=4), nbits 8      — the known-degenerate coarse geometry
    (BASELINE: M=32 at d=128 gives ppl 14.97 vs 5.33)
  - OPQ at M = d/2, nbits 8       — rotation win or parity
  - asymmetric K d_m=2 / V d_m=4  — the kernel-speed geometry that ships
    behind pq.M_v; this rung is its quality gate (see PERF.md)

Run: python -m million_tpu.benchmarks.quality_ladder [--fast]
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.benchmarks.perplexity import perplexity
from million_tpu.benchmarks.tiny_lm import (
    build_corpus,
    build_corpus_v2,
    checkpoint_path_l,
    load_checkpoint,
)
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
from million_tpu.models import llama
from million_tpu.pq.kmeans import train_opq, train_pq


def sample_kv(params, cfg, tokens, *, windows=8, ctx=512, bs=8):
    """Collect per-layer K/V head vectors from dense prefills on the FIRST
    windows of the stream (the sampling stage's role, main_pq.py:168-205 —
    here the vectors come straight out of the dense cache instead of a
    save_forward hook writing fvecs). Prefills run bs windows at a time;
    rows are stored f16 to keep the reference budget (256 * 2^12 rows/layer
    at nbits=12) under ~1.5 GB/side on the host."""
    bs = min(bs, windows)
    dcfg = DenseCacheConfig(
        bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=ctx, dtype=cfg.dtype
    )
    ks, vs = [], []
    for w0 in range(0, windows - windows % bs, bs):
        ids = jnp.asarray(
            np.stack([
                tokens[(w0 + i) * ctx : (w0 + i + 1) * ctx]
                for i in range(bs)
            ]), jnp.int32,
        )
        cache = init_dense_state(dcfg, cfg.num_layers)
        _, cache = llama.prefill(params, cfg, ids, cache, None, mode="dense")
        # (L, bs, nh_k, n, d) -> per layer (bs*nh_k*n, d)
        ks.append(np.asarray(cache["k"], np.float16).reshape(cfg.num_layers, -1, cfg.head_dim))
        vs.append(np.asarray(cache["v"], np.float16).reshape(cfg.num_layers, -1, cfg.head_dim))
    return np.concatenate(ks, axis=1), np.concatenate(vs, axis=1)


def train_cents(kv, M, nbits, *, iters=15, opq=False, seed=0):
    """Per-layer codebooks (and OPQ rotations): (L, M, C, d_m) [+ (L, d, d)]."""
    L = kv.shape[0]
    cents, rots = [], []
    for l in range(L):
        x = jnp.asarray(kv[l])
        if opq:
            R, c = train_opq(x, M=M, nbits=nbits, iters=iters, seed=seed + l,
                             layout="strided")
            rots.append(np.asarray(R))
        else:
            c = train_pq(x, M=M, nbits=nbits, iters=iters, seed=seed + l,
                         layout="strided")
        cents.append(np.asarray(c))
    out = jnp.asarray(np.stack(cents), jnp.float32)
    return (out, jnp.asarray(np.stack(rots), jnp.float32) if opq else None)


def ladder_rung(
    params, cfg, eval_tokens, kv_k, kv_v, *,
    M_k: int, nbits_k: int, M_v: Optional[int] = None,
    nbits_v: Optional[int] = None, opq: bool = False, outlier_k: int = 0,
    outlier_kk: int = 0,
    max_length: int = 512, max_windows: int = 8, train_iters: int = 15,
) -> Dict:
    M_v = M_v or M_k
    nbits_v = nbits_v or nbits_k
    # the reference's per-rung codebook budget: 256 rows per centroid
    # (main_pq.py:197) — round-2's fixed 8K-row budget starved k-means at
    # nbits >= 11 and flattened the sensitivity curve (docs/PERF.md)
    budget = 256 * (2 ** max(nbits_k, nbits_v))

    def split_outliers(kv, k):
        """outlier-channel high precision (VERDICT r2 item 5 / north star):
        the top-energy channels are excluded from PQ and stored exact."""
        from million_tpu.pq.ops import select_outlier_channels, zero_channels

        idx = np.stack([
            np.asarray(select_outlier_channels(jnp.asarray(kv[l]), k))
            for l in range(kv.shape[0])
        ])  # (L, k)
        zeroed = np.stack([
            np.asarray(zero_channels(jnp.asarray(kv[l]), jnp.asarray(idx[l])))
            for l in range(kv.shape[0])
        ])
        return idx, zeroed

    kv_k_b, kv_v_b = kv_k[:, :budget], kv_v[:, :budget]
    oidx = koidx = None
    if outlier_k:
        oidx, kv_v_b = split_outliers(kv_v_b, outlier_k)
    if outlier_kk:
        koidx, kv_k_b = split_outliers(kv_k_b, outlier_kk)
    ck, Rk = train_cents(kv_k_b, M_k, nbits_k, iters=train_iters,
                         opq=opq)
    cv, Rv = train_cents(kv_v_b, M_v, nbits_v, iters=train_iters,
                         opq=opq, seed=100)
    cents = {"key": ck, "value": cv}
    if opq:
        cents["Rk"], cents["Rv"] = Rk, Rv
    if oidx is not None:
        cents["v_outlier_idx"] = jnp.asarray(oidx, jnp.int32)
    if koidx is not None:
        cents["k_outlier_idx"] = jnp.asarray(koidx, jnp.int32)
    # mode "pq" (the evaluation path here) reads raw cents only; kernel
    # tables would even REJECT the deliberately-degenerate d_m=4/C=256 rung
    tables = cents
    pqc = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M_k, M_v=M_v,
        C=2 ** max(nbits_k, nbits_v), Lt=64, N_max=max_length,
        dtype=cfg.dtype,
        # outlier rungs need the byte-plane arenas in the cache: prefill
        # writes them unconditionally when cents carry the idx (it
        # KeyErrors otherwise — regression since the byte-plane-layout
        # change; the committed r3 outlier rows predate it)
        OK=outlier_kk, OV=outlier_k,
    )
    r = perplexity(
        params, cfg, eval_tokens,
        lambda: init_state(pqc, cfg.num_layers), tables,
        mode="pq", max_length=max_length, distort_recent=True,
        max_windows=max_windows,
    )
    return {
        "M": M_k, "nbits": nbits_k, "M_v": M_v, "nbits_v": nbits_v,
        "opq": opq, "outlier_k": outlier_k, "outlier_kk": outlier_kk,
        "ppl": r["ppl"],
    }


def run_ladder(*, fast: bool = False, max_windows: int = 8,
               max_length: int = 512, model: str = "tiny",
               train_iters: int = 15, coarse_sweep: bool = False) -> Dict:
    """model="tiny": the d=32 regression model (round-2 protocol).
    model="large": the d=64 quality anchor (QUALITY_CFG_L) with the
    reference sample budget, 1024-token eval windows, and 25 k-means
    iterations — the published ladder."""
    if model == "large":
        params, cfg = load_checkpoint(checkpoint_path_l())
        tokens = build_corpus_v2()
        holdout = 2 << 20
        eval_tokens = tokens[-holdout:][: max_windows * max_length + 1]
        # budget: 256*2^12 rows/layer at the deepest rung; nh_k heads
        # contribute ctx rows each per window
        ctx = 1024
        need_rows = 256 * 4096
        windows = -(-need_rows // (cfg.num_kv_heads * ctx))
        sample_tokens = tokens[: windows * ctx]  # train region (ref samples train split)
        kv_k, kv_v = sample_kv(params, cfg, sample_tokens,
                               windows=windows, ctx=ctx, bs=8)
    else:
        params, cfg = load_checkpoint()
        tokens = build_corpus()
        holdout = 1 << 16
        eval_tokens = tokens[-holdout:]  # never seen in training
        sample_tokens = tokens[-2 * holdout : -holdout]
        kv_k, kv_v = sample_kv(params, cfg, sample_tokens)

    dense = perplexity(
        params, cfg, eval_tokens,
        lambda: init_dense_state(
            DenseCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim,
                             N_max=max_length, dtype=cfg.dtype),
            cfg.num_layers,
        ),
        None, mode="dense", max_length=max_length, distort_recent=False,
        max_windows=max_windows,
    )
    M = cfg.head_dim // 2
    if coarse_sweep:
        # the RESOLVABLE sensitivity curve: at M=d/2 this model's Δppl
        # saturates near zero for every nbits (quantization error below
        # eval noise), so the monotone nbits demonstration runs at the
        # coarse M=d/4 geometry — the reference's own M=32@d=128 ladder
        # (BASELINE results.jsonl:8-10: ppl 14.97 -> 6.25 -> 5.50 for
        # nbits 8/10/12)
        rungs = [dict(M_k=cfg.head_dim // 4, nbits_k=nb)
                 for nb in (8, 9, 10, 11, 12)]
    else:
        rungs = [dict(M_k=M, nbits_k=8)]
        if not fast:
            rungs += [dict(M_k=M, nbits_k=nb) for nb in (9, 10, 11, 12)]
            rungs += [
                dict(M_k=cfg.head_dim // 4, nbits_k=8),          # degenerate d_m=4
                dict(M_k=M, nbits_k=8, opq=True),                 # OPQ
                dict(M_k=M, nbits_k=8, M_v=cfg.head_dim // 4,     # asym V d_m=4
                     nbits_v=7),
                # asym V d_m=4 RESCUED by outlier channels (north star):
                # top-energy V channels stored exact next to the codes
                dict(M_k=M, nbits_k=8, M_v=cfg.head_dim // 4, nbits_v=7,
                     outlier_k=max(cfg.head_dim // 16, 2)),
                dict(M_k=M, nbits_k=8, M_v=cfg.head_dim // 4, nbits_v=7,
                     outlier_k=max(cfg.head_dim // 8, 4)),
                # FULL-coarse geometry with outliers on both sides: halves
                # the kernel's gather volume on K and V — the bs=1 TPOT
                # lever (PERF.md) — if this rung holds, the compiled path
                # gets the correction terms
                dict(M_k=cfg.head_dim // 4, nbits_k=8,
                     M_v=cfg.head_dim // 4, nbits_v=8,
                     outlier_k=max(cfg.head_dim // 8, 4),
                     outlier_kk=max(cfg.head_dim // 8, 4)),
            ]
    rows = []
    for kw in rungs:
        row = ladder_rung(
            params, cfg, eval_tokens, kv_k, kv_v,
            max_length=max_length, max_windows=max_windows,
            train_iters=train_iters, **kw,
        )
        row["dppl"] = row["ppl"] - dense["ppl"]
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {"dense_ppl": dense["ppl"], "rows": rows}
    print(json.dumps({"dense_ppl": dense["ppl"]}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="nbits=8 rung only (the regression-test slice)")
    ap.add_argument("--model", choices=("tiny", "large"), default="tiny")
    ap.add_argument("--windows", type=int, default=None)
    ap.add_argument("--max-length", type=int, default=None)
    ap.add_argument("--coarse-sweep", action="store_true",
                    help="nbits 8..12 at M=d/4 (the BASELINE M=32@d=128 "
                    "sensitivity ladder)")
    args = ap.parse_args()
    if args.model == "large":
        windows = args.windows or 32
        max_length = args.max_length or 1024
        iters = 25  # match the reference's faiss niter (pq_utils.py:600)
    else:
        windows = args.windows or 8
        max_length = args.max_length or 512
        iters = 15
    out = run_ladder(fast=args.fast, max_windows=windows,
                     max_length=max_length, model=args.model,
                     train_iters=iters, coarse_sweep=args.coarse_sweep)
    from million_tpu.utils.ledger import append_result
    append_result("results.jsonl", {
        "stage": "quality_ladder", "model": args.model,
        "coarse_sweep": args.coarse_sweep,
        "max_length": max_length, "windows": windows, "result": out,
    })


if __name__ == "__main__":
    main()
