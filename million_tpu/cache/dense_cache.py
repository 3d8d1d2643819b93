"""Dense (uncompressed) KV cache — the fp16/bf16 baseline the PQ path is
measured against (reference baseline_forward, modeling_llama.py:345-453,
which uses the vanilla HF DynamicCache). Same functional-pytree style as the
PQ cache so the two are drop-in alternatives in the model."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

DenseCacheLayerState = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class DenseCacheConfig:
    bs: int
    nh_k: int
    d: int
    N_max: int = 32768
    dtype: Any = jnp.bfloat16


def init_dense_state(cfg: DenseCacheConfig, num_layers: int) -> DenseCacheLayerState:
    shape = (num_layers, cfg.bs, cfg.nh_k, cfg.N_max, cfg.d)
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "length": jnp.zeros((num_layers,), jnp.int32),
    }


def dense_prefill_update(state, k, v):
    """Per-layer update: state leaves without the layer axis."""
    n = k.shape[2]
    start = state["length"]
    return {
        "k": jax.lax.dynamic_update_slice(state["k"], k.astype(state["k"].dtype), (0, 0, start, 0)),
        "v": jax.lax.dynamic_update_slice(state["v"], v.astype(state["v"].dtype), (0, 0, start, 0)),
        "length": start + n,
    }


dense_decode_update = dense_prefill_update  # same op; n == 1
