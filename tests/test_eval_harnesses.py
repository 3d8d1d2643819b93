"""LongBench metrics, loglikelihood evaluator, profiling utils."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from million_tpu.benchmarks.longbench import (
    qa_f1_score,
    rouge_l_score,
    classification_score,
    retrieval_score,
    count_score,
    code_sim_score,
    pred_longbench,
    dataset2metric,
    dataset2prompt,
    dataset2maxlen,
)
from million_tpu.benchmarks.lm_eval_adapter import (
    loglikelihood,
    evaluate_multiple_choice,
)
from million_tpu.models.llama import PRESETS, init_params
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
from million_tpu.utils.profiling import StepTimer, Ticker


def test_metric_functions():
    assert qa_f1_score("Paris is the capital", "Paris") > 0
    assert qa_f1_score("the answer is Paris", "the answer is Paris") == 1.0
    assert qa_f1_score("London", "Paris") == 0.0
    assert rouge_l_score("a b c d", "a b c d") == 1.0
    assert 0 < rouge_l_score("a b x d", "a b c d") < 1.0
    assert classification_score("label: sports", "sports", ["sports", "politics"]) == 1.0
    assert classification_score("politics", "sports", ["sports", "politics"]) == 0.0
    assert retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert retrieval_score("Paragraph 6", "Paragraph 7") == 0.0
    assert count_score("the final answer is 12", "12") == 1.0
    assert code_sim_score("return x + 1", "return x + 1") == 1.0


def test_metric_tables_consistent():
    assert set(dataset2metric) == set(dataset2prompt) == set(dataset2maxlen)


def test_pred_longbench_loop():
    """Harness mechanics with a fake tokenizer + echo generator."""

    class Tok:
        def __call__(self, s, **kw):
            return {"input_ids": list(range(len(s.split())))}

        def decode(self, ids):
            return " ".join("w" for _ in ids)

    rows = [
        {"context": "a b", "input": "what", "answers": ["12"], "all_classes": None},
        {"context": "c d", "input": "how many", "answers": ["3"], "all_classes": None},
    ]
    res = pred_longbench(
        lambda prompt, n: "the count is 12", Tok(), "passage_count", rows
    )
    assert res["n"] == 2
    assert 0.0 <= res["score"] <= 1.0
    assert res["score"] == 0.5  # first row matches, second doesn't


def test_loglikelihood_prefers_continuation_consistency(rng):
    cfg = PRESETS["test-tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    dc = DenseCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=32,
                          dtype=jnp.float32)
    mk = lambda: init_dense_state(dc, cfg.num_layers)
    ctx = [1, 2, 3]
    ll_a = loglikelihood(params, cfg, mk, None, ctx, [5], mode="dense")
    ll_b = loglikelihood(params, cfg, mk, None, ctx, [5, 7], mode="dense")
    assert np.isfinite(ll_a) and np.isfinite(ll_b)
    assert ll_b < ll_a  # adding a token can only lower total logprob

    acc = evaluate_multiple_choice(
        params, cfg, mk, None,
        [{"context_ids": ctx, "choices_ids": [[5], [6]], "label": 0}],
        mode="dense",
    )
    assert acc["n"] == 1 and acc["acc"] in (0.0, 1.0)


def test_step_timer_and_ticker():
    t = StepTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] > 0

    tk = Ticker()
    for _ in range(4):
        tk.tick()
    assert len(tk.intervals) == 3
    d = tk.tpot_ttft()
    assert np.isfinite(d["ttft_s"]) and np.isfinite(d["tpot_s"])


def test_speedtest_breakdown(rng):
    """run.breakdown=true attaches a device-op time breakdown to each
    speedtest row (the reference's --breakdown Timer harvest,
    speedtest.py:110-117, via the hardware profile)."""
    import dataclasses
    import jax.numpy as jnp
    from million_tpu.benchmarks.speedtest import speedtest
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.models.llama import PRESETS, init_params, build_tables
    import numpy as np

    cfg = PRESETS["test-tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    pqc = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=32,
                        Lt=16, N_max=256, dtype=jnp.float32)
    res = speedtest(
        params, cfg, lambda *_: init_state(pqc, cfg.num_layers), tables,
        prefill_lengths=[32], decode_length=4, breakdown=True,
    )
    bd = res["results"][0]["breakdown_ms"]
    assert isinstance(bd, dict) and bd
    # on CPU the profile has no per-op line; on TPU real families appear
    if "breakdown_error" not in bd:
        assert all(v >= 0 for v in bd.values())


def _tiny_setup(rng):
    import dataclasses

    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.models.llama import PRESETS, init_params

    cfg = dataclasses.replace(PRESETS["test-tiny"], num_layers=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((2, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((2, M, 32, 2)), jnp.float32),
    }
    pqc = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M,
                        C=32, Lt=8, N_max=128, dtype=jnp.float32)
    return cfg, params, cents, (lambda: init_state(pqc, 2))


def test_external_lm_eval_adapter_via_stub(rng, monkeypatch):
    """Exercise the external lm_eval integration seam (make_lm_eval_model)
    with a STUB lm_eval package: the adapter's LM subclass must build,
    accept Instance-style requests, and return (loglikelihood, greedy)
    pairs consistent with the hermetic loglikelihood path."""
    import sys
    import types

    from million_tpu.benchmarks.lm_eval_adapter import (
        loglikelihood, make_lm_eval_model,
    )
    from million_tpu.benchmarks.registry import ByteTokenizer

    api = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")
    inst_mod = types.ModuleType("lm_eval.api.instance")

    class LM:  # the real base class is richer; the adapter only subclasses
        def __init__(self):
            pass

    class Instance:
        def __init__(self, args):
            self.args = args

    model_mod.LM = LM
    inst_mod.Instance = Instance
    root = types.ModuleType("lm_eval")
    root.api = api
    for name, mod in (
        ("lm_eval", root), ("lm_eval.api", api),
        ("lm_eval.api.model", model_mod), ("lm_eval.api.instance", inst_mod),
    ):
        monkeypatch.setitem(sys.modules, name, mod)

    cfg, params, cents, make_cache = _tiny_setup(rng)
    tok = ByteTokenizer()
    lm = make_lm_eval_model(params, cfg, make_cache, cents, tok, mode="pq")
    reqs = [Instance(("Hello wor", "ld")), Instance(("abc", "def"))]
    out = lm.loglikelihood(reqs)
    assert len(out) == 2
    for (ll, greedy), req in zip(out, reqs):
        assert np.isfinite(ll) and ll < 0
        want = loglikelihood(
            params, cfg, make_cache, cents,
            tok(req.args[0])["input_ids"],
            tok(req.args[1], add_special_tokens=False)["input_ids"],
            "pq",
        )
        np.testing.assert_allclose(ll, want, rtol=1e-5)


def _write_hf_tokenizer(tmp_path):
    """Build a real on-disk HF fast tokenizer (word-level) fixture."""
    import json

    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "question", "answer", "[UNK]"]
    vocab = {w: i for i, w in enumerate(words)}
    t = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    t.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "unk_token": "[UNK]",
        "model_max_length": 512,
    }))
    return tmp_path


def test_hf_tokenizer_path_in_harnesses(rng, tmp_path):
    """The HF AutoTokenizer route of load_tokenizer (registry.py) drives
    the ppl harness end-to-end from a LOCAL tokenizer fixture — previously
    only the hermetic byte tokenizer was ever exercised."""
    from million_tpu.benchmarks.perplexity import perplexity
    from million_tpu.benchmarks.registry import load_tokenizer, load_tokens

    tok_dir = _write_hf_tokenizer(tmp_path)
    tok = load_tokenizer(str(tok_dir))
    ids = tok("the quick brown fox")["input_ids"]
    assert ids == [0, 1, 2, 3]
    assert "quick" in tok.decode([1])

    text = " ".join(
        np.random.default_rng(0).choice(
            ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"],
            400,
        )
    )
    data = tmp_path / "corpus.txt"
    data.write_text(text)
    tokens = load_tokens(str(data), tokenizer=tok)
    assert tokens.ndim == 1 and len(tokens) >= 256
    assert tokens.max() < 11  # ids from the fixture vocab, not bytes

    cfg, params, cents, make_cache = _tiny_setup(rng)
    r = perplexity(params, cfg, tokens, make_cache, cents, mode="pq",
                   max_length=64, max_windows=2)
    assert np.isfinite(r["ppl"]) and r["ppl"] > 1


def test_speedtest_oom_guard(rng, monkeypatch):
    """An OOM at one sweep point yields an {"oom": True} row and the sweep
    continues (the reference IgnoreOOM role, speedtest.py:16-29)."""
    import million_tpu.benchmarks.speedtest as st

    cfg, params, cents, _ = _tiny_setup(rng)
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state

    pqc = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim,
                        M=cfg.head_dim // 2, C=32, Lt=8, N_max=128,
                        dtype=jnp.float32)

    real_generate = st.generate
    calls = {"n": 0}

    def flaky_generate(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory (synthetic)")
        return real_generate(*a, **kw)

    monkeypatch.setattr(st, "generate", flaky_generate)
    out = st.speedtest(
        params, cfg, lambda pl: init_state(pqc, 2), cents, mode="pq",
        prefill_lengths=[16, 24], decode_length=4,
    )
    rows = out["results"]
    assert rows[0].get("oom") is True
    assert rows[1]["prefill_length"] == 24 and np.isfinite(rows[1]["tpot_s"])


def test_longbench_metric_reference_semantics():
    """Fraction-of-numbers scoring, exactly the reference's
    retrieval_score/count_score (longbench.py:49-67): every number in the
    prediction counts, matches score proportionally."""
    # two numbers, one matching the paragraph id -> 0.5
    assert retrieval_score("Paragraph 7 or maybe 9", "Paragraph 7") == 0.5
    # the id is parsed from the GROUND TRUTH pattern, not the prediction
    assert retrieval_score("the answer is 7", "Paragraph 7") == 1.0
    assert retrieval_score("no numbers here", "Paragraph 7") == 0.0
    assert retrieval_score("7", "no paragraph marker") == 0.0
    # count: 3 numbers, 1 correct -> 1/3
    assert abs(count_score("12 or 13 or 14", "13") - 1 / 3) < 1e-9
    assert count_score("none", "13") == 0.0
    # code-sim: first COMMENT-FREE line is compared (reference skips
    # lines containing backticks, #, //)
    assert code_sim_score("# comment\nreturn x\n", "return x") == 1.0
    assert code_sim_score("```\nall commented #\n", "return x") < 1.0
