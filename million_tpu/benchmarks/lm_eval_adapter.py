"""Multiple-choice / loglikelihood accuracy evaluation.

The reference adapts its model to EleutherAI's lm-eval harness
(lm_eval_simple.py:7-36, for MMLU/ARC/PIQA/...). Two paths here:

  * `MillionLM` — a lm-eval `LM` subclass when the `lm_eval` package is
    installed (the reference's HFLM role);
  * `loglikelihood` / `evaluate_multiple_choice` — a self-contained
    evaluator for (context, continuation) scoring that needs no external
    harness: teacher-forced forward, sum of continuation log-probs. This is
    the primitive under every loglikelihood task, so accuracy tasks run
    even in hermetic environments.

Both clear the KV cache per request, the reference's PreSuffixInjector
contract (lm_eval_simple.py:13-30).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.models import llama


def loglikelihood(
    params,
    cfg: llama.ModelConfig,
    make_cache: Callable[[], object],
    cents,
    context_ids: Sequence[int],
    continuation_ids: Sequence[int],
    mode: str = "pq",
) -> float:
    """Sum log P(continuation | context) via one teacher-forced prefill."""
    ids = jnp.asarray(list(context_ids) + list(continuation_ids), jnp.int32)[None]
    logits, _ = llama.prefill(
        params, cfg, ids, make_cache(), cents,
        mode="dense" if mode == "dense" else "pq",
        distort_recent=(mode != "dense"),
    )
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    targets = ids[0, 1:]
    start = len(context_ids) - 1
    cont = slice(start, start + len(continuation_ids))
    picked = jnp.take_along_axis(logp[cont], targets[cont][:, None], axis=-1)
    return float(jnp.sum(picked))


def evaluate_multiple_choice(
    params,
    cfg: llama.ModelConfig,
    make_cache,
    cents,
    examples: List[Dict],
    mode: str = "pq",
) -> Dict[str, float]:
    """examples: [{"context_ids": [...], "choices_ids": [[...], ...],
    "label": int}] -> accuracy (argmax of summed continuation logprob, the
    lm-eval 'acc' metric)."""
    correct = 0
    for ex in examples:
        scores = [
            loglikelihood(
                params, cfg, make_cache, cents, ex["context_ids"], ch, mode
            )
            for ch in ex["choices_ids"]
        ]
        correct += int(int(np.argmax(scores)) == ex["label"])
    return {"acc": correct / max(len(examples), 1), "n": len(examples)}


def make_lm_eval_model(params, cfg, make_cache, cents, tokenizer, mode="pq"):
    """Return an lm_eval.api.model.LM implementation, when lm_eval exists."""
    try:
        from lm_eval.api.model import LM
        from lm_eval.api.instance import Instance
    except ImportError as e:  # pragma: no cover - optional dep
        raise RuntimeError(
            "lm_eval is not installed; use evaluate_multiple_choice for "
            "hermetic loglikelihood accuracy evaluation"
        ) from e

    class MillionLM(LM):  # pragma: no cover - exercised only with lm_eval
        def loglikelihood(self, requests):
            out = []
            for req in requests:
                ctx, cont = req.args
                ctx_ids = tokenizer(ctx)["input_ids"]
                cont_ids = tokenizer(cont, add_special_tokens=False)["input_ids"]
                ll = loglikelihood(
                    params, cfg, make_cache, cents, ctx_ids, cont_ids, mode
                )
                out.append((ll, False))
            return out

        def loglikelihood_rolling(self, requests):
            raise NotImplementedError

        def generate_until(self, requests):
            raise NotImplementedError

    return MillionLM()
