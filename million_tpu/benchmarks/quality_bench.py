"""Quantization-quality sweep: reconstruction and attention-output error
per (M, nbits) — the weights-free analogue of the reference's perplexity
sensitivity table (BASELINE.md: nbits 8..12 x M in {32, 64}; M=32@nbits=8
degenerate).

Synthetic KV is drawn with the structure the paper targets (README.md:15
"outlier-immunized"): a low-rank correlated base plus heavy-tailed outlier
directions — k-means codebooks place centroids where the data is, so error
should stay bounded as outlier scale grows, unlike uniform quantization.

Run:  python -m million_tpu.benchmarks.quality_bench [--n 8192] [--d 64]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_kv(rng, n, d, outlier_scale=8.0):
    """Low-rank correlated vectors with heavy-tailed outlier channels."""
    rank = max(4, d // 8)
    basis = rng.standard_normal((rank, d))
    x = rng.standard_normal((n, rank)) @ basis / np.sqrt(rank)
    # a few channels carry outliers (the K-cache structure PQ tolerates)
    n_out = max(1, d // 16)
    idx = rng.choice(d, n_out, replace=False)
    x[:, idx] += outlier_scale * rng.standard_normal((n, n_out)) ** 3 / 3.0
    return x.astype(np.float32)


def attention_mae(q, k, v, khat, vhat):
    """|softmax(qK^T)V - softmax(qK̂^T)V̂| mean abs error."""
    def attn(kk, vv):
        s = q @ kk.T / np.sqrt(q.shape[-1])
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return p @ vv

    return float(np.abs(attn(k, v) - attn(khat, vhat)).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192, help="training vectors")
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--outlier-scale", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from million_tpu.pq.kmeans import train_pq
    from million_tpu.pq.ops import pq_decode, pq_encode

    rng = np.random.default_rng(args.seed)
    d = args.d
    k = synth_kv(rng, args.n, d, args.outlier_scale)
    v = synth_kv(rng, args.n, d, 1.0)
    q = rng.standard_normal((args.n_queries, d)).astype(np.float32)
    var = float(k.var())

    def roundtrip(x, M, nbits):
        cents = train_pq(jnp.asarray(x), M=M, nbits=nbits, iters=args.iters,
                         layout="strided", seed=args.seed)
        return np.asarray(
            pq_decode(pq_encode(jnp.asarray(x), cents, "strided"), cents, "strided")
        )

    rows = []
    # symmetric sweep + the asymmetric kernel geometry (K:d_m=2/nbits=8,
    # V:d_m=4/nbits=7 — the fused kernel's v_direct fast path)
    combos = [
        (d // 2, 8, d // 2, 8), (d // 2, 6, d // 2, 6), (d // 2, 4, d // 2, 4),
        (d // 4, 8, d // 4, 8), (d // 4, 10, d // 4, 10),
        (d // 2, 8, d // 4, 7),
    ]
    for M_k, nb_k, M_v, nb_v in combos:
        khat = roundtrip(k, M_k, nb_k)
        vhat = roundtrip(v, M_v, nb_v)
        mse = float(((k - khat) ** 2).mean())
        amae = attention_mae(q, k, v, khat, vhat)
        bits_per_dim = (M_k * nb_k + M_v * nb_v) / (2 * d)
        row = {
            "M": M_k, "nbits": nb_k, "M_v": M_v, "nbits_v": nb_v,
            "bits_per_dim": bits_per_dim,
            "rel_mse": round(mse / var, 5), "attn_mae": round(amae, 5),
        }
        rows.append(row)
        log(row)

    # headline: the production shape (M=d/2, nbits=8 -> 4 bits/dim)
    prod = rows[0]
    print(json.dumps({
        "metric": f"PQ relative reconstruction MSE, M=d/2 nbits=8 "
                  f"(4-bit effective), outlier-scale {args.outlier_scale}",
        "value": prod["rel_mse"],
        "unit": "mse/var",
        "attn_mae": prod["attn_mae"],
        "sweep": rows,
    }))


if __name__ == "__main__":
    main()
