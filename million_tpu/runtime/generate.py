"""Autoregressive generation loop over the functional model + cache.

Replaces the reference's reliance on HF `model.generate` + monkey-patched
`prepare_inputs_for_generation` (modeling_llama.py:127-216): here generation
is an explicit loop over the jitted `decode_step`, with the cache pytree
threaded through. Tokens stay on device across steps (the data dependency
serializes execution without host syncs); TTFT/TPOT are measured by forcing
completion only at phase boundaries — the role of the reference's injected
TextStreamer Ticker (speedtest.py:36-45).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.models import llama
from million_tpu.runtime.sampling import SamplingConfig, sample


@dataclasses.dataclass
class GenerationResult:
    tokens: np.ndarray  # (bs, n_generated)
    ttft_s: float  # prefill + first token
    tpot_s: float  # mean per subsequent token
    decode_s: float  # total decode-loop wall time
    selfcheck_max_diff: float = 0.0  # max |pallas - oracle| logit gap seen


def generate(
    params: Any,
    cfg: llama.ModelConfig,
    input_ids: jax.Array,  # (bs, n_prompt)
    cache: Any,
    cents: Optional[Dict[str, jax.Array]],
    *,
    mode: str = "pq_pallas",
    max_new_tokens: int = 64,
    sampling: SamplingConfig = SamplingConfig(),
    seed: int = 0,
    selfcheck_every: int = 0,
    mesh=None,  # jax.sharding.Mesh -> sharded prefill/decode attention
    prefill_chunk: int = 0,  # >0: admit the prompt in bounded-memory chunks
    prefill_hist_block: int = 4096,  # history block for chunked admission
    auto_bucket: bool = True,  # host-picked arena scan bucket (l2Ns analogue)
    flush_chunk: int = 0,  # 0: full-window flushes (reference semantics);
    # F < Lt: flush only the oldest F tokens when the window fills — the
    # flush-tail spike shrinks ~Lt/F-fold and the exact-recent window
    # never drops below Lt - F (llama.flush_windows)
) -> Tuple[GenerationResult, Any]:
    """Prefill + decode loop. Returns (result, final cache state).

    selfcheck_every=N (mode "pq_pallas" only): every N decode steps, rerun
    the step through the jnp oracle on the same cache and record the max
    logit divergence — the reference's embedded runtime numerical
    self-check (pq_utils.py:330-381, a debug block diffing the kernel
    against SDPA-on-decoded), made a first-class debug switch. Costs one
    extra forward per checked step (so ttft/tpot/decode_s are NOT clean
    perf numbers under selfcheck — it is a debug mode); the divergence
    accumulates on device and syncs once at the end. The sampled token
    still comes from the kernel path."""
    bs, n_prompt = input_ids.shape
    key = jax.random.PRNGKey(seed)
    if flush_chunk % 4:
        # fail BEFORE prefill, not at the first flush deep into decode
        raise ValueError(
            f"flush_chunk={flush_chunk} must be word-aligned (multiple of 4)"
        )

    # Guard cache capacity on the host: inside jit, dynamic_update_slice
    # CLAMPS out-of-range writes, which would silently overwrite the newest
    # codes instead of failing (observed in verification probe P5).
    if mode != "dense":
        from million_tpu.cache.pq_cache import arena_tokens

        n_max = arena_tokens(cache["key_codes"])
        lt = cache["key_residual"].shape[-2]
        # Prefill writes the 4-aligned prompt prefix as codes; decode
        # flushes whole Lt-sized residual windows. Arena high-water mark =
        # aligned prefix + Lt per flush that can occur while generating.
        tail0 = n_prompt % 4
        fch = flush_chunk if 0 < flush_chunk < lt else lt
        n_flushes = max(
            0, (tail0 + max(max_new_tokens - 1, 0) - lt) // fch + 1
        )
        peak_codes = (n_prompt - tail0) + fch * n_flushes
        if peak_codes > n_max:
            raise ValueError(
                f"prompt({n_prompt}) + max_new_tokens({max_new_tokens}) would "
                f"flush {peak_codes} codes into an arena of N_max({n_max}); "
                f"increase N_max (Lt={lt})"
            )
    else:
        n_max = cache["k"].shape[-2]
        if n_prompt + max_new_tokens > n_max:
            raise ValueError(
                f"prompt({n_prompt}) + max_new_tokens({max_new_tokens}) exceeds "
                f"dense cache capacity N_max({n_max})"
            )

    t0 = time.perf_counter()
    prefill_mode = "dense" if mode == "dense" else "pq"
    if prefill_chunk and mode == "dense":
        raise ValueError("prefill_chunk requires a PQ mode (quantized history)")
    if prefill_chunk:
        from million_tpu.models.chunked_prefill import chunked_prefill

        last_logits, cache = chunked_prefill(
            params, cfg, input_ids, cache, cents, chunk=prefill_chunk,
            hist_block=prefill_hist_block, mesh=mesh,
        )
        logits = last_logits[:, None]  # (bs, 1, V) like last_logit_only
    else:
        logits, cache = llama.prefill(
            params, cfg, input_ids, cache, cents, mode=prefill_mode,
            last_logit_only=True, mesh=mesh,
        )
    key, sk = jax.random.split(key)
    tok = sample(logits[:, -1], sk, sampling)
    tok.block_until_ready()
    np.asarray(tok[:1])  # force through any async tunnel
    ttft = time.perf_counter() - t0

    toks = [tok]
    t1 = time.perf_counter()
    # Host-scheduled residual-window flush: the residual count after prefill
    # is n_prompt % 4 (the ragged tail), +1 per decode step; when it reaches
    # Lt the step must run with flush=True (static arg — see decode_step).
    r_host = n_prompt % 4 if mode != "dense" else 0
    lt_host = cache["key_residual"].shape[-2] if mode != "dense" else 0
    f_host = flush_chunk if 0 < flush_chunk < lt_host else lt_host
    # Host mirror of n_codes (the quantized-arena fill level): the aligned
    # prompt prefix now, +Lt per flush. Drives the static scan bucket — the
    # reference's l2Ns length->kernel selection (pq_utils.py:8-22) — so
    # short-context decode stops streaming the whole N_max arena.
    codes_host = n_prompt - (n_prompt % 4) if mode != "dense" else 0
    use_bucket = auto_bucket and mode == "pq_pallas"
    if use_bucket:
        from million_tpu.ops.pq_attention_pallas import bucket_for_length

        # Warm the compile cache for every (flush, bucket) decode variant
        # this generation will reach — the schedule is fully host-known.
        # AOT lower().compile() in a daemon thread: nothing executes, no
        # buffers allocate, and a rung crossing mid-generation hits a warm
        # cache instead of stalling the token stream on a fresh compile.
        # (Skipped on CPU: tests would pay double compiles for nothing.)
        if jax.default_backend() != "cpu":
            variants = []
            r_w, c_w = r_host, codes_host
            for _ in range(max_new_tokens - 1):
                if r_w >= lt_host:
                    r_w, c_w = r_w - f_host, c_w + f_host
                r_w += 1
                # the flush runs as its own host-split programs now, so
                # decode variants differ only by scan bucket
                v = (False, bucket_for_length(c_w, n_max))
                if v not in variants:
                    variants.append(v)
            if len(variants) > 1:
                import threading

                # AOT compiles do not land in the jit dispatch cache, but
                # they DO populate the persistent compilation cache — the
                # main thread's eventual compile becomes a disk hit.
                try:
                    jax.config.update(
                        "jax_compilation_cache_dir", "/tmp/jax_cache"
                    )
                    jax.config.update(
                        "jax_persistent_cache_min_entry_size_bytes", -1
                    )
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 0
                    )
                except Exception:  # noqa: BLE001
                    pass

                def _warm(vs=tuple(variants[1:])):
                    for fl, nb_ in vs:
                        try:
                            llama.decode_step.lower(
                                params, cfg,
                                jnp.zeros((bs,), jnp.int32),
                                jnp.asarray(0, jnp.int32),
                                cache, cents, mode=mode, flush=fl,
                                mesh=mesh, n_bucket=nb_,
                            ).compile()
                        except Exception:  # noqa: BLE001 — warming is
                            return  # best-effort; the main loop compiles
                            # on demand if this thread dies

                threading.Thread(target=_warm, daemon=True).start()
    selfcheck_max = jnp.zeros((), jnp.float32)  # accumulated ON DEVICE —
    # a per-step host sync would pollute decode_s/tpot_s (they already
    # include the extra oracle forward on checked steps; see docstring)
    for i in range(max_new_tokens - 1):
        pos = jnp.asarray(n_prompt + i, jnp.int32)
        flush = mode != "dense" and r_host >= lt_host
        if flush:
            # host-split flush (encode core + argument-fed writer with
            # donated arenas): the in-program decode_step(flush=True) path
            # relayout-copies the multi-GB arenas (llama.flush_windows)
            cache = llama.flush_windows(
                cache, cents, n=flush_chunk,
                interp=(
                    True
                    if mesh is not None
                    and mesh.devices.flat[0].platform == "cpu"
                    else None
                ),
            )
            r_host -= f_host
            codes_host += f_host
        r_host += 1
        n_bucket = bucket_for_length(codes_host, n_max) if use_bucket else None
        if (
            selfcheck_every
            and mode == "pq_pallas"
            and i % selfcheck_every == 0
        ):
            # same inputs, oracle attention; cache update rule is identical
            # so only the attention math is being diffed
            ref_logits, _ = llama.decode_step(
                params, cfg, tok, pos, cache, cents, mode="pq"
            )
        else:
            ref_logits = None
        logits, cache = llama.decode_step(
            params, cfg, tok, pos, cache, cents, mode=mode,
            mesh=mesh, n_bucket=n_bucket,
        )
        if ref_logits is not None:
            diff = jnp.max(jnp.abs(logits - ref_logits)).astype(jnp.float32)
            selfcheck_max = jnp.maximum(selfcheck_max, diff)
        key, sk = jax.random.split(key)
        tok = sample(logits, sk, sampling)
        toks.append(tok)
    tok.block_until_ready()
    np.asarray(tok[:1])
    decode_s = time.perf_counter() - t1
    tpot = decode_s / max(max_new_tokens - 1, 1)

    tokens = np.stack([np.asarray(t) for t in toks], axis=1)
    return (
        GenerationResult(
            tokens=tokens, ttft_s=ttft, tpot_s=tpot, decode_s=decode_s,
            selfcheck_max_diff=float(selfcheck_max),
        ),
        cache,
    )
