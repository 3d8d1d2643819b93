"""Pipeline driver CLI — the analogue of the reference's main_pq.py.

    python -m million_tpu.cli -f configs/llama-3.2-3b.json \
        -p baseline sampling training evaluation [key=value ...]

Stages (reference main_pq.py:151-407):
  baseline    benchmark the model with the dense bf16 KV cache
  sampling    collect KV head-vectors to .fvecs files for codebook training
              (reference save_forward hook, modeling_llama.py:21-125 — here
              the functional dense cache IS the collection point, no hooks)
  training    per-layer k-means -> centroid .npz artifact
              (reference train_pq/faiss, pq_utils.py:586-609)
  evaluation  benchmark with the PQ cache + fused kernel; results appended
              to the results.jsonl ledger with the full config
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.benchmarks.perplexity import perplexity
from million_tpu.benchmarks.registry import load_tokenizer, load_tokens, select_benchmark
from million_tpu.benchmarks.speedtest import speedtest
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.models import llama
from million_tpu.pq.kmeans import train_pq
from million_tpu.utils.config import Config, load_config
from million_tpu.utils.fvecs import reservoir_sample_fvecs, write_fvecs
from million_tpu.utils.ledger import append_result

DEFAULTS = {
    "model": {"preset": "tinyllama-1.1b", "weights": None, "tokenizer": "byte", "seed": 0},
    # sample_target / train_samples None -> auto 256 * 2^nbits rows/layer,
    # the reference's codebook budget (main_pq.py:197 via faiss's
    # max_points_per_centroid=256) — fixed-size budgets starve k-means at
    # nbits >= 11 (see docs/PERF.md quality ladder, round-2 plateau).
    "pq": {"M": None, "nbits": 8, "M_v": None, "nbits_v": None, "Lt": 128,
           "train_samples": None,
           "opq": False, "native_trainer": False, "train_iters": 25,
           "sample_target": None},
    "cache": {"N_max": 32768},
    "run": {
        "dataset": "_synthetic",
        "data_path": None,
        "max_length": 2048,
        "max_windows": 4,
        "max_samples": None,
        "prefill_lengths": [1024, 4096],
        "decode_length": 64,
        "mode": "pq_pallas",
        "breakdown": False,
        "results": "results.jsonl",
        "artifacts": "artifacts",
    },
}


def log(*a):
    print("[million-tpu]", *a, file=sys.stderr, flush=True)


def build_model(cfg: Config):
    mcfg = llama.PRESETS[cfg.model.preset]
    if cfg.model.weights:
        from million_tpu.models.hf_loader import load_hf_weights

        params = load_hf_weights(cfg.model.weights, mcfg)
        log(f"loaded weights from {cfg.model.weights}")
    else:
        params = llama.init_params(mcfg, jax.random.PRNGKey(cfg.model.seed))
        log(f"random weights for preset {cfg.model.preset} (synthetic mode)")
    return mcfg, params


def art_dir(cfg: Config) -> Path:
    d = Path(cfg.run.artifacts) / cfg.model.preset / Path(cfg.run.dataset).name
    d.mkdir(parents=True, exist_ok=True)
    return d


def pq_m(cfg: Config, mcfg) -> int:
    return cfg.pq.M or mcfg.head_dim // 2


def sample_budget(cfg: Config, mcfg) -> int:
    """Auto codebook sample budget: 256 rows per centroid of the finest
    codebook in play (reference main_pq.py:197 — 256 * 2^nbits; faiss
    trains on at most max_points_per_centroid=256 * k points, so the
    reference budget is exactly 'as many as k-means will use')."""
    _, nb_k, _, nb_v = pq_geometry(cfg, mcfg)
    return 256 * (2 ** max(nb_k, nb_v))


def pq_geometry(cfg: Config, mcfg):
    """Per-side (M, nbits): V defaults to K's (symmetric, the reference's
    only mode); pq.M_v / pq.nbits_v opt into the asymmetric kernel geometry
    (see ops/pq_attention_pallas.py header for the quality caveat)."""
    M_k, nb_k = pq_m(cfg, mcfg), cfg.pq.nbits
    M_v = cfg.pq.get("M_v") or M_k
    nb_v = cfg.pq.get("nbits_v") or nb_k
    if (M_v, nb_v) != (M_k, nb_k) and not getattr(pq_geometry, "_warned", False):
        pq_geometry._warned = True
        log(
            "WARNING: asymmetric V-side geometry (pq.M_v/pq.nbits_v) is "
            "EXPERIMENTAL and quality-degrading: the end-to-end ladder "
            "measured Δppl +1.83 for K d_m=2 / V d_m=4 vs +0.47 symmetric "
            "(docs/PERF.md quality table). Use for research sweeps only."
        )
    return M_k, nb_k, M_v, nb_v


def outlier_geometry(cfg) -> tuple:
    """(OK, OV) exact outlier channels per side (pq.outlier_k /
    pq.outlier_v) — the north-star option as first-class pipeline flags.
    The headline dm4+16/16 geometries (docs/PERF.md) are reachable as
    e.g. `-o pq.M=32 -o pq.nbits=7 -o pq.outlier_k=16 -o pq.outlier_v=16`
    at d=128."""
    return (int(cfg.pq.get("outlier_k") or 0),
            int(cfg.pq.get("outlier_v") or 0))


def make_pq_cache_factory(cfg, mcfg, bs=1, n_max=None):
    M_k, nb_k, M_v, _ = pq_geometry(cfg, mcfg)
    OK, OV = outlier_geometry(cfg)
    pqc = PQCacheConfig(
        bs=bs,
        nh_k=mcfg.num_kv_heads,
        d=mcfg.head_dim,
        M=M_k,
        M_v=M_v,
        C=2**nb_k,
        Lt=cfg.pq.Lt,
        N_max=n_max or cfg.cache.N_max,
        OK=OK,
        OV=OV,
    )
    return lambda *_: init_state(pqc, mcfg.num_layers)


def make_dense_cache_factory(cfg, mcfg, bs=1, n_max=None):
    dc = DenseCacheConfig(
        bs=bs, nh_k=mcfg.num_kv_heads, d=mcfg.head_dim, N_max=n_max or cfg.cache.N_max
    )
    return lambda *_: init_dense_state(dc, mcfg.num_layers)


def cents_path(cfg: Config, mcfg) -> Path:
    M_k, nb_k, M_v, nb_v = pq_geometry(cfg, mcfg)
    name = f"cents_M{M_k}_nbits{nb_k}"
    if (M_v, nb_v) != (M_k, nb_k):
        name += f"_V{M_v}_{nb_v}"
    if cfg.pq.get("opq"):
        name += "_opq"
    OK, OV = outlier_geometry(cfg)
    if OK or OV:
        name += f"_ok{OK}_ov{OV}"
    return art_dir(cfg) / f"{name}.npz"


def load_cents(cfg: Config, mcfg):
    path = cents_path(cfg, mcfg)
    if path.exists():
        z = np.load(path)
        cents = {"key": jnp.asarray(z["key"]), "value": jnp.asarray(z["value"])}
        if "Rk" in z:
            cents["Rk"] = jnp.asarray(z["Rk"])
            cents["Rv"] = jnp.asarray(z["Rv"])
        if "k_outlier_idx" in z:
            cents["k_outlier_idx"] = jnp.asarray(z["k_outlier_idx"])
        if "v_outlier_idx" in z:
            cents["v_outlier_idx"] = jnp.asarray(z["v_outlier_idx"])
        log(f"loaded centroids {path}")
    else:
        # reference _synthetic fallback: random codebooks (main_pq.py:252-255)
        rng = np.random.default_rng(0)
        M_k, nb_k, M_v, nb_v = pq_geometry(cfg, mcfg)
        OK, OV = outlier_geometry(cfg)
        d, L = mcfg.head_dim, mcfg.num_layers
        ck = rng.standard_normal((L, M_k, 2**nb_k, d // M_k)).astype(np.float32)
        cv = rng.standard_normal((L, M_v, 2**nb_v, d // M_v)).astype(np.float32)
        cents = {}
        if OK:
            kidx = np.sort(rng.choice(d, OK, replace=False)).astype(np.int32)
            # strided layout: channel c -> subspace c % M, component c // M;
            # zero the centroid components so the synthetic run matches
            # the trained artifact's zeroed-channel contract
            for c in kidx:
                ck[:, c % M_k, :, c // M_k] = 0.0
            cents["k_outlier_idx"] = jnp.asarray(np.stack([kidx] * L))
        if OV:
            vidx = np.sort(rng.choice(d, OV, replace=False)).astype(np.int32)
            for c in vidx:
                cv[:, c % M_v, :, c // M_v] = 0.0
            cents["v_outlier_idx"] = jnp.asarray(np.stack([vidx] * L))
        cents["key"] = jnp.asarray(ck)
        cents["value"] = jnp.asarray(cv)
        if cfg.pq.get("opq"):
            # random ORTHOGONAL rotations so the synthetic run exercises the
            # same rotated-cache code path the trained artifact would
            cents["Rk"] = jnp.asarray(
                np.linalg.qr(rng.standard_normal((L, d, d)))[0], jnp.float32
            )
            cents["Rv"] = jnp.asarray(
                np.linalg.qr(rng.standard_normal((L, d, d)))[0], jnp.float32
            )
        log(f"no trained centroids at {path}; using random codebooks (_synthetic)")
    return llama.build_tables(cents)


def run_benchmark(cfg: Config, mcfg, params, mode: str, cents):
    kind = select_benchmark(cfg.run.dataset)
    if kind == "speedtest":
        factory = (
            make_dense_cache_factory(cfg, mcfg)
            if mode == "dense"
            else make_pq_cache_factory(cfg, mcfg)
        )
        return speedtest(
            params, mcfg, factory, cents,
            mode=mode,
            prefill_lengths=list(cfg.run.prefill_lengths),
            decode_length=cfg.run.decode_length,
            breakdown=bool(cfg.run.get("breakdown")),
        )
    if kind == "perplexity":
        tokens = load_tokens(
            cfg.run.dataset,
            tokenizer=load_tokenizer(cfg.model.tokenizer),
            vocab_size=mcfg.vocab_size,
        )
        factory = (
            make_dense_cache_factory(cfg, mcfg, n_max=cfg.run.max_length)
            if mode == "dense"
            else make_pq_cache_factory(cfg, mcfg, n_max=cfg.run.max_length)
        )
        return perplexity(
            params, mcfg, tokens, factory, cents,
            mode=mode,
            max_length=cfg.run.max_length,
            max_windows=cfg.run.max_windows,
        )
    if kind == "longbench":
        return run_longbench(cfg, mcfg, params, mode, cents)
    if kind == "lm_eval":
        return run_lm_eval(cfg, mcfg, params, mode, cents)
    raise NotImplementedError(f"benchmark kind {kind} (dataset {cfg.run.dataset})")


def run_longbench(cfg: Config, mcfg, params, mode: str, cents):
    """LongBench generate-and-score (reference pred_long_bench protocol):
    per-request fresh cache (the cache_clear_func contract), task prompt,
    middle truncation, greedy generation of dataset2maxlen tokens."""
    from million_tpu.benchmarks.longbench import (
        dataset2maxlen,
        load_longbench_rows,
        pred_longbench,
    )
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    task = cfg.run.dataset.split(":", 1)[1]
    tok = load_tokenizer(cfg.model.tokenizer)
    rows = load_longbench_rows(task, cfg.run.data_path)
    maxgen = dataset2maxlen[task]
    n_max = cfg.cache.N_max
    if n_max - maxgen - 4 <= 0:
        raise ValueError(
            f"cache.N_max={n_max} cannot hold {task}'s generation budget "
            f"({maxgen} new tokens) plus any prompt; raise cache.N_max"
        )
    factory = (
        make_dense_cache_factory(cfg, mcfg, n_max=n_max)
        if mode == "dense"
        else make_pq_cache_factory(cfg, mcfg, n_max=n_max)
    )
    greedy = SamplingConfig(temperature=0.0)

    def generate_fn(prompt: str, max_new: int) -> str:
        ids = tok(prompt)["input_ids"][: n_max - maxgen - 4]
        ids = jnp.asarray(np.asarray(ids, np.int32) % mcfg.vocab_size)[None, :]
        res, _ = generate(
            params, mcfg, ids, factory(), cents,
            mode=mode, max_new_tokens=max_new, sampling=greedy,
        )
        return tok.decode(res.tokens[0].tolist())

    return pred_longbench(
        generate_fn, tok, task, rows,
        max_length=min(cfg.run.max_length, n_max - maxgen - 4),
        max_samples=cfg.run.max_samples,
    )


def run_lm_eval(cfg: Config, mcfg, params, mode: str, cents):
    """Loglikelihood multiple-choice accuracy. The dataset spec is
    `lm_eval:<path.jsonl>` — rows either pre-tokenized ({context_ids,
    choices_ids, label}) or text ({context, choices, label}, tokenized
    here); with the lm_eval package installed, `lm_eval:task:<name>` runs
    the external harness through MillionLM."""
    import json as _json

    from million_tpu.benchmarks.lm_eval_adapter import (
        evaluate_multiple_choice,
        make_lm_eval_model,
    )

    spec = cfg.run.dataset.split(":", 1)[1]
    tok = load_tokenizer(cfg.model.tokenizer)
    factory = (
        make_dense_cache_factory(cfg, mcfg)
        if mode == "dense"
        else make_pq_cache_factory(cfg, mcfg)
    )
    if spec.startswith("task:"):
        import lm_eval  # type: ignore

        lm = make_lm_eval_model(params, mcfg, factory, cents, tok, mode=mode)
        return lm_eval.simple_evaluate(model=lm, tasks=[spec[5:]])["results"]
    rows = [
        _json.loads(l)
        for l in Path(cfg.run.data_path or spec).read_text().splitlines()
        if l.strip()
    ]
    examples = []
    for r in rows[: cfg.run.max_samples]:
        if "context_ids" in r:
            examples.append(r)
        else:
            examples.append({
                "context_ids": [i % mcfg.vocab_size for i in tok(r["context"])["input_ids"]],
                "choices_ids": [
                    [i % mcfg.vocab_size for i in tok(c)["input_ids"]]
                    for c in r["choices"]
                ],
                "label": r["label"],
            })
    return evaluate_multiple_choice(params, mcfg, factory, cents, examples, mode=mode)


def stage_baseline(cfg, mcfg, params):
    res = run_benchmark(cfg, mcfg, params, "dense", None)
    append_result(cfg.run.results, {"stage": "baseline", "result": res, "config": cfg.to_dict()})
    log("baseline:", res)


def stage_sampling(cfg, mcfg, params):
    """Collect per-layer KV samples (reference sampling stage,
    main_pq.py:168-205): run dense prefills over the dataset and persist
    subsampled head-vectors until sample_target rows per layer."""
    tokens = load_tokens(
        cfg.run.dataset,
        tokenizer=load_tokenizer(cfg.model.tokenizer),
        vocab_size=mcfg.vocab_size,
    )
    target = cfg.pq.sample_target or sample_budget(cfg, mcfg)
    out = art_dir(cfg)
    for L in range(mcfg.num_layers):
        (out / f"layer{L}.key.fvecs").unlink(missing_ok=True)
        (out / f"layer{L}.value.fvecs").unlink(missing_ok=True)
    collected = 0
    wlen = cfg.run.max_length
    rng = np.random.default_rng(0)
    factory = make_dense_cache_factory(cfg, mcfg, n_max=wlen)
    w = 0
    while collected < target and (w + 1) * wlen <= len(tokens):
        ids = jnp.asarray(tokens[w * wlen : (w + 1) * wlen][None, :])
        _, cache = llama.prefill(params, mcfg, ids, factory(), None, mode="dense")
        keep = min(wlen * mcfg.num_kv_heads, target - collected)
        for L in range(mcfg.num_layers):
            k = np.asarray(cache["k"][L, 0, :, :wlen].astype(jnp.float32)).reshape(-1, mcfg.head_dim)
            v = np.asarray(cache["v"][L, 0, :, :wlen].astype(jnp.float32)).reshape(-1, mcfg.head_dim)
            sel = rng.choice(len(k), size=keep, replace=False)
            write_fvecs(out / f"layer{L}.key.fvecs", k[sel])
            write_fvecs(out / f"layer{L}.value.fvecs", v[sel])
        collected += keep
        w += 1
        log(f"sampling: {collected}/{target} rows/layer")
    if collected < target:
        log(f"warning: dataset exhausted at {collected} rows/layer")


def stage_training(cfg, mcfg, params=None):
    """Per-layer codebook k-means (reference training stage,
    main_pq.py:208-242), strided subspace layout to match the kernel."""
    out = art_dir(cfg)
    M_k, nb_k, M_v, nb_v = pq_geometry(cfg, mcfg)
    opq = bool(cfg.pq.get("opq"))
    native = bool(cfg.pq.get("native_trainer"))
    if native and opq:
        raise ValueError("pq.native_trainer covers plain PQ only (no OPQ)")
    if native:
        # multithreaded C++ host trainer (native/pqlib.cpp) — keeps the
        # accelerator free during the offline stage, the role faiss-cpu
        # plays in the reference (pq_utils.py:586-609)
        from million_tpu.native import train_pq_native

        train_k = lambda x, M, nb: train_pq_native(
            np.asarray(x), M=M, nbits=nb, iters=cfg.pq.train_iters, layout="strided"
        )
    else:
        train_k = lambda x, M, nb: np.asarray(
            train_pq(jnp.asarray(x), M=M, nbits=nb,
                     iters=cfg.pq.train_iters, layout="strided")
        )
    OK, OV = outlier_geometry(cfg)
    if (OK or OV) and opq:
        raise ValueError("pq.outlier_k/outlier_v do not compose with OPQ "
                         "(outlier channels are defined in the original "
                         "basis; the rotation would smear them)")
    keys, vals, rks, rvs = [], [], [], []
    kidxs, vidxs = [], []
    # STREAM the sample files: a large sampling corpus never loads whole —
    # one-pass reservoir at O(train_samples) memory (utils/fvecs.py, the
    # reference's sample_fvecs/read_fvecs_batch role, fvecio.py:61-133)
    cap = int(cfg.pq.train_samples or sample_budget(cfg, mcfg))
    for L in range(mcfg.num_layers):
        ks = reservoir_sample_fvecs(out / f"layer{L}.key.fvecs", cap, seed=L)
        vs = reservoir_sample_fvecs(
            out / f"layer{L}.value.fvecs", cap, seed=1000 + L
        )
        if OK or OV:
            # outlier-channel split (north star): the top-energy channels
            # are excluded from PQ — zeroed before k-means so the
            # codebooks spend no mass on them — and stored exact at
            # runtime (quality_ladder.ladder_rung's protocol)
            from million_tpu.pq.ops import (
                select_outlier_channels,
                zero_channels,
            )

            if OK:
                kidx = np.asarray(
                    select_outlier_channels(jnp.asarray(ks), OK))
                ks = np.asarray(
                    zero_channels(jnp.asarray(ks), jnp.asarray(kidx)))
                kidxs.append(kidx)
            if OV:
                vidx = np.asarray(
                    select_outlier_channels(jnp.asarray(vs), OV))
                vs = np.asarray(
                    zero_channels(jnp.asarray(vs), jnp.asarray(vidx)))
                vidxs.append(vidx)
        if opq:
            # OPQ: rotation + codebooks trained jointly (the reference
            # ships this trainer but rejects it at the CLI,
            # main_pq.py:67-68 — here it is a first-class pipeline flag;
            # the runtime cost is one (d, d) rotation per q/k/v + output)
            from million_tpu.pq.kmeans import train_opq

            Rk, ck = train_opq(jnp.asarray(ks), M=M_k, nbits=nb_k,
                               iters=cfg.pq.train_iters, layout="strided")
            Rv, cv = train_opq(jnp.asarray(vs), M=M_v, nbits=nb_v,
                               iters=cfg.pq.train_iters, layout="strided")
            rks.append(np.asarray(Rk))
            rvs.append(np.asarray(Rv))
            keys.append(np.asarray(ck))
            vals.append(np.asarray(cv))
        else:
            keys.append(train_k(ks, M_k, nb_k))
            vals.append(train_k(vs, M_v, nb_v))
        log(f"training: layer {L} codebooks done ({len(ks)} samples)")
    path = cents_path(cfg, mcfg)
    arrays = {"key": np.stack(keys), "value": np.stack(vals)}
    if opq:
        arrays["Rk"] = np.stack(rks)
        arrays["Rv"] = np.stack(rvs)
    if kidxs:
        arrays["k_outlier_idx"] = np.stack(kidxs).astype(np.int32)
    if vidxs:
        arrays["v_outlier_idx"] = np.stack(vidxs).astype(np.int32)
    np.savez(path, **arrays)
    log(f"saved centroids to {path}")


def stage_evaluation(cfg, mcfg, params):
    tables = load_cents(cfg, mcfg)
    res = run_benchmark(cfg, mcfg, params, cfg.run.mode, tables)
    append_result(cfg.run.results, {"stage": "evaluation", "result": res, "config": cfg.to_dict()})
    log("evaluation:", res)


STAGES = {
    "baseline": stage_baseline,
    "sampling": stage_sampling,
    "training": stage_training,
    "evaluation": stage_evaluation,
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="million_tpu.cli")
    ap.add_argument("-f", "--config", action="append", default=[], help="JSON config file(s)")
    ap.add_argument("-p", "--pipelines", nargs="+", default=["evaluation"],
                    choices=list(STAGES), help="stages to run, in order")
    ap.add_argument("-o", "--override", action="append", default=[],
                    dest="overrides", help="dotted key=value override (repeatable)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config, args.overrides, base=DEFAULTS)
    mcfg, params = build_model(cfg)
    for stage in args.pipelines:
        log(f"=== stage: {stage} ===")
        STAGES[stage](cfg, mcfg, params)


if __name__ == "__main__":
    main()
