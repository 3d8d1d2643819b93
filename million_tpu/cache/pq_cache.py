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
  (the residual window's codes are NOT mirrored into the arena while the
      window fills: a per-token word RMW + strided arena column write cost
      ~1.2 ms/step at 3B/32K. Instead the WHOLE window is batch-encoded and
      written as one contiguous word slab when it fills — the reference's
      own flush flow, pq_utils.py:288-302 — which amortizes to ~0.4 us/step.)
  n_codes, r : int32 scalars — quantized-token and residual counts
      (reference: seen_tokens / residualed counters, pq_utils.py:111-113).

Invariants: total visible tokens = n_codes + r; n_codes is ALWAYS a multiple
of 4 (word alignment — prefill writes multiples of 4 and routes ragged tails
into the residual window; flushes advance by Lt). When r reaches Lt,
flush_window encodes the full residual window into the arena and resets r.
The model's decode_step takes the flush as a STATIC host-scheduled argument
(the host knows token counts exactly), avoiding a lax.cond around the
multi-GB arena; the single-layer decode_update here auto-flushes with a
lax.cond, which is fine at unit-test scale. Layer states are stacked on a
leading axis and scanned by the model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from million_tpu.pq.ops import runtime_encode
from million_tpu.ops.pq_attention_pallas import WORD, pack_codes

PQCacheLayerState = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Arena storage granularity. nbits <= 8 (C <= 256) word-packs 4 uint8 codes
# per int32 — the fused Pallas kernel's format. nbits 9-12 (C <= 4096) store
# one int16 code per arena entry and run the jnp attention path only — the
# same split as the reference, whose CUDA kernel is compiled for nbits=8 and
# routes nbits != 8 through the pure-torch forward (modeling_llama.py:218-343,
# nbits2dtype pq_utils.py:542-552). The BASELINE nbits 9-12 ppl sensitivity
# ladder runs on this path.
# ---------------------------------------------------------------------------

def wide_codes(C: int) -> bool:
    if C > 65536:
        raise ValueError(f"codebook size {C} exceeds int16 code storage")
    return C > 256


def store_codes_t(codes_t: jax.Array, wide: bool) -> jax.Array:
    """Transposed codes (..., M, n) -> arena representation: packed int32
    words (n//4 entries) for 8-bit arenas, int16 entries for wide ones.
    `wide` MUST come from the destination arena's dtype (== int16) so the
    storage always matches the arena, including asymmetric K/V geometries
    where only one side's codebook is wide."""
    if wide:
        return codes_t.astype(jnp.int16)
    return pack_codes(codes_t)


def load_codes_t(arena: jax.Array) -> jax.Array:
    """Arena (..., M, entries) -> transposed integer codes (..., M, n)."""
    from million_tpu.ops.pq_attention_pallas import unpack_codes

    if arena.dtype == jnp.int16:
        return arena
    return unpack_codes(arena)


def codes_per_entry(C: int) -> int:
    return 1 if wide_codes(C) else WORD


def arena_tokens(arena: jax.Array) -> int:
    """Token capacity of a code arena, inferred from its storage dtype."""
    return arena.shape[-1] * (1 if arena.dtype == jnp.int16 else WORD)


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
    # asymmetric geometry: V-side subspace count (None -> M). V is less
    # outlier-prone than K, so V can run d_m=4 (half the gathers and code
    # bytes in the kernel) while K keeps d_m=2 score resolution.
    M_v: int | None = None
    # outlier-channel high precision (north star): OK/OV channels per
    # K/V head vector excluded from PQ and stored exact in byte-plane
    # arenas (ops/pq_attention_pallas.py to_byte_plane); the kernel folds
    # them back with dense MXU corrections. This is what makes the COARSE
    # d_m=4 geometries (half the gather volume) quality-viable.
    OK: int = 0
    OV: int = 0

    def __post_init__(self):
        if self.N_max % WORD or self.Lt % WORD:
            raise ValueError("N_max and Lt must be multiples of 4 (word packing)")

    @property
    def m_v(self) -> int:
        return self.M_v or self.M

    @property
    def max_tokens(self) -> int:
        return self.N_max + self.Lt


def init_layer_state(cfg: PQCacheConfig) -> PQCacheLayerState:
    """One layer's empty cache (reference init_cache, pq_utils.py:115-138)."""
    cpe = codes_per_entry(cfg.C)
    cdt = jnp.int16 if wide_codes(cfg.C) else jnp.int32
    st = {
        "key_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.N_max // cpe), cdt),
        "value_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.m_v, cfg.N_max // cpe), cdt),
        "key_residual": jnp.zeros((cfg.bs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype),
        "value_residual": jnp.zeros((cfg.bs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype),
        "n_codes": jnp.zeros((), jnp.int32),
        "r": jnp.zeros((), jnp.int32),
    }
    if cfg.OK:
        st["key_outliers"] = jnp.zeros(
            (cfg.bs, cfg.nh_k, WORD, cfg.OK, cfg.N_max // WORD), jnp.bfloat16
        )
    if cfg.OV:
        st["value_outliers"] = jnp.zeros(
            (cfg.bs, cfg.nh_k, WORD, cfg.OV, cfg.N_max // WORD), jnp.bfloat16
        )
    return st


def init_state(cfg: PQCacheConfig, num_layers: int) -> PQCacheLayerState:
    """Stacked (num_layers, ...) cache pytree, scanned by the model."""
    one = init_layer_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (num_layers, *x.shape)).copy(), one)


def flush_window(
    state: PQCacheLayerState,
    key_cents: jax.Array,  # (M, C, d_m)
    value_cents: jax.Array,
    layout: str = "strided",
) -> PQCacheLayerState:
    """Encode the FULL residual window into the arena and reset counters
    (reference flush, pq_utils.py:288-302): one batched encode + one
    contiguous word-slab write at [n_codes, n_codes + Lt), then
    n_codes += Lt, r = 0. The residual contents are left in place — slots
    are overwritten as new tokens arrive and masked out of attention by r.
    """
    Lt = state["key_residual"].shape[2]
    new = dict(state)
    wide = state["key_codes"].dtype == jnp.int16
    start_w = state["n_codes"] // (1 if wide else WORD)
    for side, cents in (("key", key_cents), ("value", value_cents)):
        codes_t = jnp.swapaxes(
            runtime_encode(state[side + "_residual"], cents, layout), -1, -2
        )  # (bs, nh_k, M, Lt)
        new[side + "_codes"] = jax.lax.dynamic_update_slice(
            state[side + "_codes"], store_codes_t(codes_t, wide),
            (0, 0, 0, start_w)
        )
    new["n_codes"] = state["n_codes"] + Lt
    new["r"] = jnp.zeros_like(state["r"])
    return new


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
        kc = jnp.swapaxes(
            runtime_encode(k[:, :, :n4], key_cents, layout), -1, -2)
        vc = jnp.swapaxes(
            runtime_encode(v[:, :, :n4], value_cents, layout), -1, -2)
        wide = state["key_codes"].dtype == jnp.int16
        start_w = state["n_codes"] // (1 if wide else WORD)
        new["key_codes"] = jax.lax.dynamic_update_slice(
            state["key_codes"], store_codes_t(kc, wide), (0, 0, 0, start_w)
        )
        new["value_codes"] = jax.lax.dynamic_update_slice(
            state["value_codes"], store_codes_t(vc, wide), (0, 0, 0, start_w)
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

    When the residual window is full the whole window is batch-encoded into
    the arena first (flush_window) under a lax.cond. The cond is fine at
    this single-layer unit scale; the model's decode_step instead takes the
    flush as a static host-scheduled argument so the multi-GB stacked arena
    never flows through a conditional (which would break XLA's in-place
    buffer aliasing)."""
    Lt = state["key_residual"].shape[2]
    state = jax.lax.cond(
        state["r"] >= Lt,
        lambda s: flush_window(s, key_cents, value_cents, layout),
        lambda s: dict(s),
        state,
    )
    r = state["r"]
    new = dict(state)
    new["key_residual"] = jax.lax.dynamic_update_slice(
        state["key_residual"], k.astype(state["key_residual"].dtype), (0, 0, r, 0)
    )
    new["value_residual"] = jax.lax.dynamic_update_slice(
        state["value_residual"], v.astype(state["value_residual"].dtype), (0, 0, r, 0)
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


def stacked_prefix_write(
    cache: PQCacheLayerState,
    li: jax.Array,  # () int32 — layer index into the stacked (L, ...) cache
    kc_t: jax.Array,  # (bs, nh_k, M_k, n4) uint8 transposed codes (n4 % 4 == 0)
    vc_t: jax.Array,
    k_tail: jax.Array | None,  # (bs, nh_k, tail, d) exact tail or None
    v_tail: jax.Array | None,
    k_out_t: jax.Array | None = None,  # (bs, nh_k, 4, OK, n4//4) bf16
    # byte-plane exact outlier channels (to_byte_plane)
    v_out_t: jax.Array | None = None,
) -> PQCacheLayerState:
    """Append one layer's prefill chunk into the STACKED cache: packed codes
    at word offset n_codes[li]//4, ragged tail into the residual window at
    r[li], counters advanced. Single source of truth for the write layout —
    used by llama.prefill and models/chunked_prefill (single-layer analogue:
    prefill_update above)."""
    cache = dict(cache)
    n4 = kc_t.shape[-1]
    if n4:
        wide = cache["key_codes"].dtype == jnp.int16
        start_w = cache["n_codes"][li] // (1 if wide else WORD)
        cache["key_codes"] = jax.lax.dynamic_update_slice(
            cache["key_codes"], store_codes_t(kc_t, wide)[None],
            (li, 0, 0, 0, start_w)
        )
        cache["value_codes"] = jax.lax.dynamic_update_slice(
            cache["value_codes"], store_codes_t(vc_t, wide)[None],
            (li, 0, 0, 0, start_w)
        )
        w0 = cache["n_codes"][li] // WORD
        if k_out_t is not None:
            cache["key_outliers"] = jax.lax.dynamic_update_slice(
                cache["key_outliers"], k_out_t.astype(jnp.bfloat16)[None],
                (li, 0, 0, 0, 0, w0),
            )
        if v_out_t is not None:
            cache["value_outliers"] = jax.lax.dynamic_update_slice(
                cache["value_outliers"], v_out_t.astype(jnp.bfloat16)[None],
                (li, 0, 0, 0, 0, w0),
            )
    if k_tail is not None and k_tail.shape[2]:
        r0 = cache["r"][li]
        cache["key_residual"] = jax.lax.dynamic_update_slice(
            cache["key_residual"],
            k_tail.astype(cache["key_residual"].dtype)[None],
            (li, 0, 0, r0, 0),
        )
        cache["value_residual"] = jax.lax.dynamic_update_slice(
            cache["value_residual"],
            v_tail.astype(cache["value_residual"].dtype)[None],
            (li, 0, 0, r0, 0),
        )
    # counters advance AFTER both writes so the offsets above read the
    # pre-chunk values
    if n4:
        cache["n_codes"] = cache["n_codes"].at[li].add(n4)
    if k_tail is not None and k_tail.shape[2]:
        cache["r"] = cache["r"].at[li].add(k_tail.shape[2])
    return cache
