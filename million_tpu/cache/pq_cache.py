"""Functional PQ KV-cache state and updates.

Re-design of the reference's DynamicPQCache (pq_utils.py:98-408). The
reference mutates per-layer Python lists of torch tensors, grows the code
cache with `torch.cat` (a realloc+copy costing ~4 ms/layer at 32K,
results.jsonl:13), and hands state around through a Singleton. Here the cache
is an explicit pytree of statically-shaped arrays threaded through jitted
steps, so XLA donates and updates buffers in place:

  key_codes / value_codes : (bs, nh_k, M, N_max//4) int32 — preallocated
      code arena written by dynamic_update_slice (no realloc: the "paged"
      goal of the reference's PageManager achieved by a flat static arena).
      The layout is TRANSPOSED (subspace-major, token-minor) and WORD-PACKED
      (4 uint8 codes per int32, byte t of word w = token 4w+t): the Pallas
      decode kernel extracts bytes with shift/and because Mosaic's uint8
      vector cast is an order of magnitude slower than i32 bit ops
      (ops/pq_attention_pallas.py). The transposed layout itself is the
      TPU-native analogue of the reference's transposed-V page experiments
      (paged_pq_utils.py).
  key_residual / value_residual : (bs, nh_k, Lt, d) — recent tokens exact,
      in the compute dtype. Matches the reference's fp16 residual window
      (pq_utils.py:110, 127-135).
  (the current residual window's codes are written DIRECTLY into the
      arena at [n_codes, n_codes+Lt) as each token arrives — a ~14 KB
      read-modify-write per step. They stay invisible to attention, which
      masks by n_codes, until the window fills and the flush is a counter
      bump. Profiling showed separate per-window code buffers cost ~8 ms/
      step in slice/write-back and layout-change copies at 3B/32K scale.)
  n_codes, r : int32 scalars — quantized-token and residual counts
      (reference: seen_tokens / residualed counters, pq_utils.py:111-113).

Invariants: total visible tokens = n_codes + r; n_codes is ALWAYS a multiple
of 4 (word alignment — prefill writes multiples of 4 and routes ragged tails
into the residual window; flushes advance by Lt). When r reaches Lt the whole
residual window's codes are already in the arena (the per-step mirror), so
the flush is just a counter bump. Layer states are stacked on a leading axis
and scanned by the model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from million_tpu.pq.ops import pq_encode
from million_tpu.ops.pq_attention_pallas import WORD, pack_codes

PQCacheLayerState = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class PQCacheConfig:
    bs: int
    nh_k: int
    d: int
    M: int
    C: int = 256
    Lt: int = 128  # residual window capacity (reference ties this to d)
    N_max: int = 32768  # code arena capacity (quantized tokens)
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if self.N_max % WORD or self.Lt % WORD:
            raise ValueError("N_max and Lt must be multiples of 4 (word packing)")

    @property
    def max_tokens(self) -> int:
        return self.N_max + self.Lt


def init_layer_state(cfg: PQCacheConfig) -> PQCacheLayerState:
    """One layer's empty cache (reference init_cache, pq_utils.py:115-138)."""
    return {
        "key_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.N_max // WORD), jnp.int32),
        "value_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.N_max // WORD), jnp.int32),
        "key_residual": jnp.zeros((cfg.bs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype),
        "value_residual": jnp.zeros((cfg.bs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype),
        # in-progress arena word (the token-granular RMW happens here; the
        # arena itself only ever sees whole-word WRITES — reading the arena
        # in its own update expression breaks XLA's in-place aliasing and
        # duplicates the multi-GB buffer, measured as an OOM + 6x slowdown)
        "key_word_buf": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, 1), jnp.int32),
        "value_word_buf": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, 1), jnp.int32),
        "n_codes": jnp.zeros((), jnp.int32),
        "r": jnp.zeros((), jnp.int32),
    }


def init_state(cfg: PQCacheConfig, num_layers: int) -> PQCacheLayerState:
    """Stacked (num_layers, ...) cache pytree, scanned by the model."""
    one = init_layer_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (num_layers, *x.shape)).copy(), one)


def set_word_byte(words: jax.Array, token_idx: jax.Array, code: jax.Array) -> jax.Array:
    """Write one token's codes into the word-packed buffer.

    words (..., M, nw) int32; token_idx () int32; code (..., M) uint8/int.
    Returns words with byte (token_idx % 4) of word (token_idx // 4) set.
    NOTE: reads `words` — only use on SMALL buffers (an arena-sized operand
    would lose in-place aliasing; see update_word_buf/write below).
    """
    w_idx = token_idx // WORD
    shift = (token_idx % WORD) * 8
    old = jax.lax.dynamic_index_in_dim(words, w_idx, axis=-1, keepdims=True)
    oldu = old.astype(jnp.uint32)
    mask = jnp.uint32(0xFF) << shift.astype(jnp.uint32)
    new = (oldu & ~mask) | (code.astype(jnp.uint32)[..., None] << shift.astype(jnp.uint32))
    return jax.lax.dynamic_update_index_in_dim(
        words, new.astype(jnp.int32)[..., 0], w_idx, axis=-1
    )


def update_word_buf(buf: jax.Array, token_idx: jax.Array, code: jax.Array) -> jax.Array:
    """RMW one token's codes into the in-progress word buffer (..., M, 1).

    Resets at word boundaries (token_idx % 4 == 0)."""
    byte = token_idx % WORD
    shift = (byte * 8).astype(jnp.uint32)
    cur = jnp.where(byte == 0, 0, buf).astype(jnp.uint32)
    mask = jnp.uint32(0xFF) << shift
    new = (cur & ~mask) | (code.astype(jnp.uint32)[..., None] << shift)
    return new.astype(jnp.int32)


def prefill_update(
    state: PQCacheLayerState,
    k: jax.Array,  # (bs, nh_k, n, d)
    v: jax.Array,
    key_cents: jax.Array,  # (M, C, d_m)
    value_cents: jax.Array,
    layout: str = "strided",
) -> PQCacheLayerState:
    """Quantize-on-append of a full prefill chunk (reference prefill,
    pq_utils.py:222-247). The aligned prefix (4-token multiples) is encoded
    into the word arena; a ragged tail of n % 4 tokens goes into the exact
    residual window (slightly better than the reference, which quantizes
    everything). Chunk length is static under jit; the write offset n_codes
    is dynamic (supports chunked prefill while n_codes stays 4-aligned)."""
    n = k.shape[2]
    n4 = (n // WORD) * WORD
    tail = n - n4
    new = dict(state)
    if n4:
        kc = jnp.swapaxes(pq_encode(k[:, :, :n4], key_cents, layout), -1, -2)
        vc = jnp.swapaxes(pq_encode(v[:, :, :n4], value_cents, layout), -1, -2)
        start_w = state["n_codes"] // WORD
        new["key_codes"] = jax.lax.dynamic_update_slice(
            state["key_codes"], pack_codes(kc), (0, 0, 0, start_w)
        )
        new["value_codes"] = jax.lax.dynamic_update_slice(
            state["value_codes"], pack_codes(vc), (0, 0, 0, start_w)
        )
        new["n_codes"] = state["n_codes"] + n4
    if tail:
        kt = k[:, :, n4:].astype(state["key_residual"].dtype)
        vt = v[:, :, n4:].astype(state["value_residual"].dtype)
        new["key_residual"] = jax.lax.dynamic_update_slice(
            new["key_residual"], kt, (0, 0, state["r"], 0)
        )
        new["value_residual"] = jax.lax.dynamic_update_slice(
            new["value_residual"], vt, (0, 0, state["r"], 0)
        )
        kct = pq_encode(k[:, :, n4:], key_cents, layout)  # (bs, nh_k, tail, M)
        vct = pq_encode(v[:, :, n4:], value_cents, layout)
        # window codes go straight into the arena past n_codes (masked out
        # of attention until the flush counter-bump); the arena only sees
        # whole-word writes, the byte RMW happens in the small word buffer
        for t in range(tail):
            pos = new["n_codes"] + state["r"] + t
            new["key_word_buf"] = update_word_buf(new["key_word_buf"], pos, kct[:, :, t])
            new["value_word_buf"] = update_word_buf(new["value_word_buf"], pos, vct[:, :, t])
            new["key_codes"] = jax.lax.dynamic_update_index_in_dim(
                new["key_codes"], new["key_word_buf"][..., 0], pos // WORD, axis=-1
            )
            new["value_codes"] = jax.lax.dynamic_update_index_in_dim(
                new["value_codes"], new["value_word_buf"][..., 0], pos // WORD, axis=-1
            )
        new["r"] = state["r"] + tail
    return new


def decode_update(
    state: PQCacheLayerState,
    k: jax.Array,  # (bs, nh_k, 1, d)
    v: jax.Array,
    key_cents: jax.Array,
    value_cents: jax.Array,
    layout: str = "strided",
) -> PQCacheLayerState:
    """Append one decode token (reference decoding, pq_utils.py:281-311).

    Flush without lax.cond and without re-encoding: every decode step encodes
    ONLY its one token and read-modify-writes its byte straight into the
    arena word at n_codes + r. While the window is partial those positions
    lie beyond the valid region (attention masks by n_codes) so they are
    invisible; when the window fills, "flush" is just the counter bump.
    Rationale: a lax.cond over the multi-GB arena defeats XLA's in-place
    buffer aliasing (the arena would be copied every token — the
    reference's torch.cat pathology reborn); re-encoding the window per
    step materializes a (nh_k, Lt, M, C) distance tensor; and keeping a
    separate window-code buffer costs ~8 ms/step in slice + layout copies
    (measured at 3B/32K). The direct write is one 1-token encode plus a
    ~14 KB arena RMW per layer per step.
    """
    cfg_Lt = state["key_residual"].shape[2]

    do_restart = state["r"] >= cfg_Lt
    state = dict(state)
    state["n_codes"] = jnp.where(do_restart, state["n_codes"] + cfg_Lt, state["n_codes"])
    state["r"] = jnp.where(do_restart, 0, state["r"])

    r = state["r"]
    kc1 = pq_encode(k, key_cents, layout)[:, :, 0]  # (bs, nh_k, M)
    vc1 = pq_encode(v, value_cents, layout)[:, :, 0]
    new = dict(state)
    new["key_residual"] = jax.lax.dynamic_update_slice(
        state["key_residual"], k.astype(state["key_residual"].dtype), (0, 0, r, 0)
    )
    new["value_residual"] = jax.lax.dynamic_update_slice(
        state["value_residual"], v.astype(state["value_residual"].dtype), (0, 0, r, 0)
    )
    pos = state["n_codes"] + r
    new["key_word_buf"] = update_word_buf(state["key_word_buf"], pos, kc1)
    new["value_word_buf"] = update_word_buf(state["value_word_buf"], pos, vc1)
    new["key_codes"] = jax.lax.dynamic_update_index_in_dim(
        state["key_codes"], new["key_word_buf"][..., 0], pos // WORD, axis=-1
    )
    new["value_codes"] = jax.lax.dynamic_update_index_in_dim(
        state["value_codes"], new["value_word_buf"][..., 0], pos // WORD, axis=-1
    )
    new["r"] = r + 1
    return new


def cache_memory_bytes(cfg: PQCacheConfig, num_layers: int) -> Dict[str, int]:
    """Analogue of the reference's memory-size properties (pq_utils.py:383-408)."""
    code_bytes = 2 * cfg.bs * cfg.nh_k * cfg.N_max * cfg.M * num_layers
    res_bytes = (
        2 * cfg.bs * cfg.nh_k * cfg.Lt * cfg.d * num_layers * jnp.dtype(cfg.dtype).itemsize
    )
    dense_bytes = (
        2 * cfg.bs * cfg.nh_k * cfg.max_tokens * cfg.d * num_layers * 2
    )  # fp16/bf16 dense equivalent
    return {
        "codes": code_bytes,
        "residual": res_bytes,
        "total": code_bytes + res_bytes,
        "dense_equivalent": dense_bytes,
        "compression": dense_bytes / max(code_bytes + res_bytes, 1),
    }
