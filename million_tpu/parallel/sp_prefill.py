"""Sequence-parallel PQ prefill: activations sharded over the sequence.

The 128K multi-host prefill (SURVEY.md §7.7's last mile): each `sp` shard
embeds and projects only its own contiguous token block, attention runs as
a ring (`ring_causal_local`), and each shard PQ-encodes its own block. The
packed codes are re-laid out from prompt-layout (contiguous n/Pn-token
spans per shard) to arena-layout (contiguous N_max/Pn-token spans per
shard) INSIDE the shard_map: slice to the (dp, tp)-local batch/heads, one
explicit per-layer `all_gather` over the sequence axes, then every shard
cuts its own arena slab — so the shard_map's code outputs carry EXACTLY the
cache's sharding and become the new arena with no resharding at all.
(Round 1 instead emitted prompt-sharded codes and did one global
dynamic_update_slice outside; the two seq layouts have misaligned shard
boundaries, so GSPMD could only bridge them by involuntary full
rematerialization — a flagged replicate-then-repartition of the code
tensor. The explicit gather moves the same compressed codes once per
admission over ICI — ~50 MB/layer/chip at 128K x 3B, ~30 ms total against
a multi-second 128K prefill — and the transient is bounded per layer
instead of one all-layer remat.)

Scope (explicit, enforced): mode "pq", FRESH cache (n_codes == 0 — this is
the admission prefill, not a chunked continuation), weights REPLICATED
(sequence memory, not weight memory, is the long-context constraint this
solves), prompt length divisible by 4 (one packed code word; ragged tails
go through the flat prefill or per-token decode steps). Prompts not
divisible by 4 * (total sequence shards) are padded internally — pad codes
land beyond n_codes in the arena and are masked by every consumer, and the
last-token logit selection targets the last REAL token's (shard, offset).
On a multi-slice mesh the ring linearizes over ("dcn", "sp") slice-major,
so only 1 in every sp hops crosses the data-center network. OPQ rotations
(cents["Rk"]/["Rv"]) are applied per shard: stored codes live in rotated
space while the ring attention stays in the original space — same contract
as the flat prefill (models/llama.py).

Returns last-token logits (the generation entry; teacher-forced ppl keeps
using the flat prefill) and the updated cache, decode-ready: n_codes = n,
r = 0 — generate()'s flush schedule continues unchanged.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from million_tpu.models.llama import (
    ModelConfig,
    Params,
    SUBSPACE_LAYOUT,
    _logits,
    _mlp,
    _qkv,
    _rms_norm,
    _rotate,
)
from million_tpu.ops.pq_attention_pallas import WORD, pack_codes
from million_tpu.parallel.ring_attention import ring_causal_local
from million_tpu.pq.ops import runtime_encode


def prefill_sp(
    params: Params,
    cfg: ModelConfig,
    input_ids: jax.Array,  # (bs, n) — n divisible by 4 * sp
    cache: Dict[str, jax.Array],  # stacked PQ cache (fresh), any sharding
    cents: Dict[str, jax.Array],
    mesh: Mesh,
    axis: str = "sp",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sequence-parallel prefill. Returns (last-token logits (bs, V) f32,
    decode-ready cache)."""
    bs, n = input_ids.shape
    # multi-slice meshes ring over the linearized ("dcn", axis) order:
    # slice-major blocks, so only 1 in every `sp` ring hops crosses DCN
    if mesh.shape.get("dcn", 1) > 1:
        axis = ("dcn", axis)
        Pn = mesh.shape["dcn"] * mesh.shape[axis[1]]
    else:
        Pn = mesh.shape[axis]
    if n % WORD:
        raise ValueError(
            f"prompt length {n} must divide {WORD} (one packed code word); "
            "ragged tails go through the flat prefill or decode steps"
        )
    if n > cache["key_codes"].shape[-1] * WORD:
        raise ValueError("prompt longer than the code arena")
    # pad to a multiple of 4*Pn: pad codes land beyond n_codes (masked by
    # every consumer) and pad tokens are causally after every real token,
    # so they influence nothing.
    n_real = n
    span = WORD * Pn
    n_padded = ((n + span - 1) // span) * span
    if n_padded > cache["key_codes"].shape[-1] * WORD:
        raise ValueError(
            f"padded prompt ({n_padded} tokens for {Pn} shards) exceeds the "
            "code arena; grow N_max or use the flat prefill"
        )
    if n_padded != n:
        input_ids = jnp.pad(input_ids, ((0, 0), (0, n_padded - n)))
        n = n_padded
    # fresh-cache contract (checkable only outside jit; inside a jit trace
    # the caller owns the invariant)
    try:
        if int(np.asarray(cache["n_codes"][0])) != 0:
            raise ValueError(
                "prefill_sp requires a FRESH cache (n_codes == 0); it is the "
                "admission prefill, not a chunked continuation"
            )
    except jax.errors.TracerArrayConversionError:
        pass
    n_loc = n // Pn
    scale = 1.0 / (cfg.head_dim**0.5)
    NW = cache["key_codes"].shape[-1]  # arena words
    if NW % Pn:
        raise ValueError(
            f"arena words {NW} not divisible by {Pn} sequence shards"
        )
    Aw = NW // Pn  # arena words owned per shard
    dp_n, tp_n = mesh.shape.get("dp", 1), mesh.shape.get("tp", 1)
    nh_k = cfg.num_kv_heads
    if bs % dp_n or nh_k % tp_n:
        raise ValueError(
            f"bs {bs} / kv heads {nh_k} must divide the mesh dp={dp_n} / "
            f"tp={tp_n} axes (the arena shards batch over dp, heads over tp)"
        )
    bs_loc, nhk_loc = bs // dp_n, nh_k // tp_n
    # kernel interpret detection must follow the MESH's devices (a CPU mesh
    # can coexist with an accelerator default backend)
    interp = True if mesh.devices.flat[0].platform == "cpu" else None

    def local_fn(ids, params, cents):
        i = jax.lax.axis_index(axis)  # linearized over tuple axes
        dp_i = jax.lax.axis_index("dp")
        tp_i = jax.lax.axis_index("tp")
        pos = i * n_loc + jnp.arange(n_loc)
        x = params["embed"][ids]  # (bs, n_loc, D)

        def to_arena_slab(codes):
            """(bs, nh_k, M?, n_loc/4) prompt-sharded packed codes -> this
            shard's (bs_loc, nhk_loc, M?, Aw) ARENA slab: slice to the
            dp/tp-local batch & heads (shrinks the gather by dp*tp), gather
            the full prompt's words over the sequence shards, zero-pad to
            the arena width, cut the local window."""
            c = jax.lax.dynamic_slice_in_dim(codes, dp_i * bs_loc, bs_loc, 0)
            c = jax.lax.dynamic_slice_in_dim(c, tp_i * nhk_loc, nhk_loc, 1)
            c = jax.lax.all_gather(c, axis, axis=3, tiled=True)  # (.., n/4)
            c = jnp.pad(c, ((0, 0), (0, 0), (0, 0), (0, NW - c.shape[3])))
            return jax.lax.dynamic_slice_in_dim(c, i * Aw, Aw, 3)

        def layer(carry, lp):
            x, li = carry
            h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q, k, v = _qkv(h, lp, cfg, pos)

            kcent = jax.lax.dynamic_index_in_dim(cents["key"], li, 0, False)
            vcent = jax.lax.dynamic_index_in_dim(cents["value"], li, 0, False)
            # OPQ: the stored codes live in rotated space; the ring
            # attention below stays in the original space (flat-prefill
            # contract, models/llama.py prefill)
            if "Rk" in cents:
                k_st = _rotate(k, jax.lax.dynamic_index_in_dim(cents["Rk"], li, 0, False))
                v_st = _rotate(v, jax.lax.dynamic_index_in_dim(cents["Rv"], li, 0, False))
            else:
                k_st, v_st = k, v
            kc = to_arena_slab(pack_codes(jnp.swapaxes(
                runtime_encode(k_st, kcent, SUBSPACE_LAYOUT, interp), -1, -2)))
            vc = to_arena_slab(pack_codes(jnp.swapaxes(
                runtime_encode(v_st, vcent, SUBSPACE_LAYOUT, interp), -1, -2)))

            attn = ring_causal_local(q, k, v, axis, Pn, scale)
            attn = attn.transpose(0, 2, 1, 3).reshape(bs, n_loc, -1)
            x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
            h2 = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            x = x + _mlp(h2, lp).astype(x.dtype)
            return (x, li + 1), (kc, vc)

        (x, _), (kc_all, vc_all) = jax.lax.scan(
            layer, (x, jnp.asarray(0, jnp.int32)), params["layers"]
        )
        # psum-select the hidden state of the last REAL token (static
        # owner shard + local offset — padding may leave trailing shards
        # holding only pad tokens)
        owner = (n_real - 1) // n_loc
        lidx = (n_real - 1) % n_loc
        i_last = jnp.where(i == owner, 1.0, 0.0)
        last_h = jax.lax.psum(x[:, lidx] * i_last, axis)  # (bs, D), replicated over axis
        return _logits(params, cfg, last_h[:, None])[:, 0], kc_all, vc_all

    shmap = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=(
            P(),
            # (L, bs, nh_k, M, NW) codes ALREADY in the cache's own arena
            # sharding (mesh.pq_cache_shardings) — no resharding downstream
            P(None, "dp", "tp", None, axis),
            P(None, "dp", "tp", None, axis),
        ),
        check_vma=False,
    )
    logits, kc_all, vc_all = shmap(input_ids, params, cents)

    # fresh-cache contract: the slabs ARE the arena (zeros past the prompt)
    new = dict(cache)
    new["key_codes"] = kc_all
    new["value_codes"] = vc_all
    new["n_codes"] = jnp.full_like(cache["n_codes"], n_real)
    new["r"] = jnp.zeros_like(cache["r"])
    return logits, new
