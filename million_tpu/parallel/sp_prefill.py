"""Sequence-parallel PQ prefill: activations sharded over the sequence.

The 128K multi-host prefill (SURVEY.md §7.7's last mile): each `sp` shard
embeds and projects only its own contiguous token block, attention runs as
a ring (`ring_causal_local`), and each shard PQ-encodes its block straight
into ITS OWN slice of the code arena — the arena sharding
(pq_cache_shardings: codes over "sp" on the word axis) aligns exactly with
the token blocks, so no cross-chip code movement happens at all. Per layer
the only communication is the ring's K/V block rotation on ICI.

Scope (explicit, enforced): mode "pq", weights REPLICATED (sequence memory,
not weight memory, is the long-context constraint this solves), bs x heads
unsharded inside the shard_map (combine with tp/dp OUTSIDE via the flat
prefill when weight sharding matters more than context length), prompt
length divisible by 4 * sp (whole words per shard, no ragged tail).

Returns last-token logits (the generation entry; teacher-forced ppl keeps
using the flat prefill) and the updated cache, decode-ready: n_codes = n,
r = 0 — generate()'s flush schedule continues unchanged.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from million_tpu.models.llama import (
    ModelConfig,
    Params,
    SUBSPACE_LAYOUT,
    _mlp,
    _rms_norm,
    _rope_freqs,
    _rope_mscale,
    _apply_rope,
    _logits,
)
from million_tpu.ops.pq_attention_pallas import WORD, pack_codes
from million_tpu.parallel.ring_attention import ring_causal_local
from million_tpu.pq.ops import pq_encode


def prefill_sp(
    params: Params,
    cfg: ModelConfig,
    input_ids: jax.Array,  # (bs, n) — n divisible by 4 * sp
    cache: Dict[str, jax.Array],  # stacked PQ cache, arena sharded over "sp"
    cents: Dict[str, jax.Array],
    mesh: Mesh,
    axis: str = "sp",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sequence-parallel prefill. Returns (last-token logits (bs, V) f32,
    decode-ready cache)."""
    if "Rk" in cents:
        raise NotImplementedError("OPQ not wired into prefill_sp yet")
    bs, n = input_ids.shape
    Pn = mesh.shape[axis]
    if n % (WORD * Pn):
        raise ValueError(f"prompt length {n} must divide 4*{axis}={WORD * Pn}")
    n_loc = n // Pn
    L = cfg.num_layers
    nh, nk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inv_freq = _rope_freqs(cfg)
    rope_ms = _rope_mscale(cfg)
    scale = 1.0 / (dh**0.5)

    def local_fn(ids, params, cache, cents):
        i = jax.lax.axis_index(axis)
        pos = i * n_loc + jnp.arange(n_loc)
        x = params["embed"][ids]  # (bs, n_loc, D)

        def layer(carry, lp):
            x, cache, li = carry
            h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q = jnp.einsum("bnd,fd->bnf", h, lp["wq"]).reshape(bs, n_loc, nh, dh).transpose(0, 2, 1, 3)
            k = jnp.einsum("bnd,fd->bnf", h, lp["wk"]).reshape(bs, n_loc, nk, dh).transpose(0, 2, 1, 3)
            v = jnp.einsum("bnd,fd->bnf", h, lp["wv"]).reshape(bs, n_loc, nk, dh).transpose(0, 2, 1, 3)
            q = _apply_rope(q, pos, inv_freq, rope_ms)
            k = _apply_rope(k, pos, inv_freq, rope_ms)

            kcent = jax.lax.dynamic_index_in_dim(cents["key"], li, 0, False)
            vcent = jax.lax.dynamic_index_in_dim(cents["value"], li, 0, False)
            # encode THIS shard's block into THIS shard's arena slice —
            # sharded identically, so local offset 0 == global block start
            kc = jnp.swapaxes(pq_encode(k, kcent, SUBSPACE_LAYOUT), -1, -2)
            vc = jnp.swapaxes(pq_encode(v, vcent, SUBSPACE_LAYOUT), -1, -2)
            cache = dict(cache)
            cache["key_codes"] = jax.lax.dynamic_update_slice(
                cache["key_codes"], pack_codes(kc)[None], (li, 0, 0, 0, 0)
            )
            cache["value_codes"] = jax.lax.dynamic_update_slice(
                cache["value_codes"], pack_codes(vc)[None], (li, 0, 0, 0, 0)
            )

            attn = ring_causal_local(q, k, v, axis, Pn, scale)
            attn = attn.transpose(0, 2, 1, 3).reshape(bs, n_loc, -1)
            x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
            h2 = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            x = x + _mlp(h2, lp).astype(x.dtype)
            return (x, cache, li + 1), None

        (x, cache, _), _ = jax.lax.scan(
            layer, (x, cache, jnp.asarray(0, jnp.int32)), params["layers"]
        )
        cache = dict(cache)
        cache["n_codes"] = jnp.full_like(cache["n_codes"], n)
        cache["r"] = jnp.zeros_like(cache["r"])
        # only the LAST shard owns the final token; psum-select its hidden
        last_h = jnp.where(i == Pn - 1, x[:, -1], 0.0)
        last_h = jax.lax.psum(last_h, axis)  # (bs, D), replicated
        return _logits(params, cfg, last_h[:, None])[:, 0], cache

    arena_spec = {
        "key_codes": P(None, None, None, None, axis),
        "value_codes": P(None, None, None, None, axis),
        "key_residual": P(),
        "value_residual": P(),
        "n_codes": P(),
        "r": P(),
    }
    shmap = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(), arena_spec, P()),
        out_specs=(P(), arena_spec),
        check_vma=False,
    )
    return shmap(input_ids, params, cache, cents)
