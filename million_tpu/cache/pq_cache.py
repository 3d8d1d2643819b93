"""Functional PQ KV-cache state and updates.

Re-design of the reference's DynamicPQCache (pq_utils.py:98-408). The
reference mutates per-layer Python lists of torch tensors, grows the code
cache with `torch.cat` (a realloc+copy costing ~4 ms/layer at 32K,
results.jsonl:13), and hands state around through a Singleton. Here the cache
is an explicit pytree of statically-shaped arrays threaded through jitted
steps, so XLA donates and updates buffers in place:

  key_codes / value_codes : (bs, nh_k, M, N_max) uint8 — preallocated code
      arena written by dynamic_update_slice (no realloc, the "paged" goal of
      the reference's PageManager achieved by a flat static arena). The
      layout is TRANSPOSED (subspace-major, token-minor): the Pallas decode
      kernel gathers per-subspace rows with 128-token lanes
      (ops/pq_attention_pallas.py), the TPU-native analogue of the
      reference's transposed-V page experiments (paged_pq_utils.py).
  key_residual / value_residual : (bs, nh_k, Lt, d) — recent tokens exact,
      in the compute dtype. Matches the reference's fp16 residual window
      (pq_utils.py:110, 127-135).
  n_codes, r : int32 scalars — quantized-token and residual counts
      (reference: seen_tokens / residualed counters, pq_utils.py:111-113).

Invariant (reference decoding, pq_utils.py:281-311): total visible tokens =
n_codes + r; when r reaches Lt the whole residual window is encoded and
appended to the code arena in one shot, then the window restarts. Layer
states are stacked on a leading axis and scanned by the model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from million_tpu.pq.ops import pq_encode

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

    @property
    def max_tokens(self) -> int:
        return self.N_max + self.Lt


def init_layer_state(cfg: PQCacheConfig) -> PQCacheLayerState:
    """One layer's empty cache (reference init_cache, pq_utils.py:115-138)."""
    return {
        "key_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.N_max), jnp.uint8),
        "value_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.N_max), jnp.uint8),
        "key_residual": jnp.zeros((cfg.bs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype),
        "value_residual": jnp.zeros((cfg.bs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype),
        # incremental codes of the current residual window (see decode_update)
        "key_residual_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.Lt), jnp.uint8),
        "value_residual_codes": jnp.zeros((cfg.bs, cfg.nh_k, cfg.M, cfg.Lt), jnp.uint8),
        "n_codes": jnp.zeros((), jnp.int32),
        "r": jnp.zeros((), jnp.int32),
    }


def init_state(cfg: PQCacheConfig, num_layers: int) -> PQCacheLayerState:
    """Stacked (num_layers, ...) cache pytree, scanned by the model."""
    one = init_layer_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (num_layers, *x.shape)).copy(), one)


def prefill_update(
    state: PQCacheLayerState,
    k: jax.Array,  # (bs, nh_k, n, d)
    v: jax.Array,
    key_cents: jax.Array,  # (M, C, d_m)
    value_cents: jax.Array,
    layout: str = "strided",
) -> PQCacheLayerState:
    """Quantize-on-append of a full prefill chunk (reference prefill,
    pq_utils.py:222-247): every prefill token is encoded; the residual window
    stays empty. Chunk length is static under jit; the write offset n_codes
    is dynamic (supports chunked prefill)."""
    n = k.shape[2]
    kc = jnp.swapaxes(pq_encode(k, key_cents, layout), -1, -2)  # (bs,nh_k,M,n)
    vc = jnp.swapaxes(pq_encode(v, value_cents, layout), -1, -2)
    start = state["n_codes"]
    new = dict(state)
    new["key_codes"] = jax.lax.dynamic_update_slice(
        state["key_codes"], kc, (0, 0, 0, start)
    )
    new["value_codes"] = jax.lax.dynamic_update_slice(
        state["value_codes"], vc, (0, 0, 0, start)
    )
    new["n_codes"] = start + n
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

    If the residual window is full, flush it: encode all Lt residual tokens
    and append their codes to the arena (the reference's
    sa_encode_4d_keops + torch.cat at pq_utils.py:288-302, without the cat
    realloc), then restart the window. Finally write the new token into the
    residual at position r.
    """
    cfg_Lt = state["key_residual"].shape[2]

    # Flush without lax.cond and without re-encoding: every decode step
    # encodes ONLY its one token into a small per-window code buffer
    # (key/value_residual_codes), and that tiny (nh_k, M, Lt) buffer is
    # unconditionally copied into the arena at n_codes. While the window is
    # partial the copied span lies beyond the valid region (attention masks
    # by n_codes) so it is harmless; when the window fills, "flush" is just
    # the counter bump. Rationale: a lax.cond over the multi-GB arena
    # defeats XLA's in-place buffer aliasing (the arena would be copied
    # every token — the reference's torch.cat pathology reborn), and
    # re-encoding the whole window per step materializes a
    # (nh_k, Lt, M, C) distance tensor; the incremental scheme costs one
    # 1-token encode plus a ~100 KB write per layer per step.
    do_restart = state["r"] >= cfg_Lt
    state = dict(state)
    state["n_codes"] = jnp.where(do_restart, state["n_codes"] + cfg_Lt, state["n_codes"])
    state["r"] = jnp.where(do_restart, 0, state["r"])

    r = state["r"]
    kc1 = jnp.swapaxes(pq_encode(k, key_cents, layout), -1, -2)  # (bs,nh_k,M,1)
    vc1 = jnp.swapaxes(pq_encode(v, value_cents, layout), -1, -2)
    new = dict(state)
    new["key_residual"] = jax.lax.dynamic_update_slice(
        state["key_residual"], k.astype(state["key_residual"].dtype), (0, 0, r, 0)
    )
    new["value_residual"] = jax.lax.dynamic_update_slice(
        state["value_residual"], v.astype(state["value_residual"].dtype), (0, 0, r, 0)
    )
    new["key_residual_codes"] = jax.lax.dynamic_update_slice(
        state["key_residual_codes"], kc1, (0, 0, 0, r)
    )
    new["value_residual_codes"] = jax.lax.dynamic_update_slice(
        state["value_residual_codes"], vc1, (0, 0, 0, r)
    )
    new["r"] = r + 1
    # unconditional small copy of the window's codes into the arena
    start = state["n_codes"]
    new["key_codes"] = jax.lax.dynamic_update_slice(
        state["key_codes"], new["key_residual_codes"], (0, 0, 0, start)
    )
    new["value_codes"] = jax.lax.dynamic_update_slice(
        state["value_codes"], new["value_residual_codes"], (0, 0, 0, start)
    )
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
