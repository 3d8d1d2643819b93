"""Teacher-forced perplexity (reference scripts/benchmarks/perplexity.py).

Protocol match: the token stream is split into non-overlapping windows of
`max_length` (reference stride loop, perplexity.py:23-85), each window runs
a fresh-cache prefill, and in PQ mode `distort_recent=True` replaces K/V
with decode(encode(.)) so the loss reflects fully-quantized history
(perplexity.py:27 + pq_utils.py:243-247).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.models import llama


def window_nll(
    params, cfg, ids: jax.Array, cache, cents, mode: str, distort_recent: bool
) -> tuple[float, int]:
    """Sum NLL (nats) of predicting ids[1:] from ids[:-1], and token count."""
    logits, _ = llama.prefill(
        params, cfg, ids, cache, cents, mode=mode, distort_recent=distort_recent
    )
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.sum(nll)), int(tgt.size)


def perplexity(
    params,
    cfg: llama.ModelConfig,
    tokens: np.ndarray,  # 1-D token stream
    make_cache,  # () -> fresh cache pytree
    cents: Optional[Dict[str, jax.Array]],
    *,
    mode: str = "pq",
    max_length: int = 2048,
    distort_recent: bool = True,
    max_windows: Optional[int] = None,
) -> Dict[str, Any]:
    tokens = np.asarray(tokens, np.int32)
    n_windows = len(tokens) // max_length
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
    if n_windows == 0:
        raise ValueError(f"stream of {len(tokens)} tokens < max_length {max_length}")
    total_nll, total_cnt = 0.0, 0
    for w in range(n_windows):
        ids = jnp.asarray(tokens[w * max_length : (w + 1) * max_length][None, :])
        nll, cnt = window_nll(
            params, cfg, ids, make_cache(), cents,
            mode if mode != "pq_pallas" else "pq",  # prefill path is shared
            distort_recent and mode != "dense",
        )
        total_nll += nll
        total_cnt += cnt
    ppl = float(np.exp(total_nll / total_cnt))
    return {"ppl": ppl, "nll_per_token": total_nll / total_cnt, "windows": n_windows}
