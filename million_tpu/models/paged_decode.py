"""Batched decode step over the paged PQ cache — the serving-path forward.

This is what continuous batching runs: S sequence slots decode one token
each per step, with per-slot lengths/positions, page-table attention
(pq_paged_attention), and per-slot exact residual windows. Encoding is
window-flush batched (round 3): the decode step never encodes — the
scheduler runs `flush_paged_slots` (one batched executable for any flush
combination) when a slot's window fills, and `paged_admit_chunked` admits
long prompts in bounded-memory chunks against the quantized history in
the slot's pages.

The reference has no analogue — its batch size is hardcoded 1
(main_pq.py:338) — this is the scheduler substrate the north star asks for.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from million_tpu.cache.paged_pq_cache import PagedPQCacheConfig
from million_tpu.models.llama import (
    ModelConfig,
    Params,
    SUBSPACE_LAYOUT,
    _logits,
    _mlp,
    _qkv,
    _rms_norm,
    _rope_freqs,
    _rope_mscale,
    _rotate,
)
from million_tpu.models.llama import direct_flags
from million_tpu.ops.pq_attention_ref import causal_attention
from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    check_group,
    pq_paged_attention,
    pq_paged_attention_stacked,
)
from million_tpu.ops.pq_attention_ref import masked_partial_attention, merge_two_partials
from million_tpu.pq.ops import runtime_encode


def _rope_per_seq(
    x: jax.Array, pos: jax.Array, inv_freq: jax.Array, mscale: float = 1.0
) -> jax.Array:
    """x (S, nh, 1, dh), pos (S,) — per-sequence rotary positions."""
    ang = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (S, dh/2)
    cos = jnp.cos(ang)[:, None, None, :] * mscale
    sin = jnp.sin(ang)[:, None, None, :] * mscale
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _layer_rots(tables, li):
    """Per-layer OPQ rotations (or None, None): codebooks trained with
    pq.opq=true live in rotated space, so the pools/residuals store rotated
    k/v, q rotates by Rk for attention, and the attention output (which is
    in rotated-V space) unrotates by Rv^T — same contract as the flat decode
    path (models/llama.py decode_step)."""
    if "Rk" not in tables:
        return None, None
    Rk_i = jax.lax.dynamic_index_in_dim(tables["Rk"], li, 0, False)
    Rv_i = jax.lax.dynamic_index_in_dim(tables["Rv"], li, 0, False)
    return Rk_i, Rv_i


def _history_partial_pages(q, kw, vw, kcent, vcent, n_prev, scale, page_size):
    """Full attention of chunk queries against quantized history stored as
    GATHERED PAGES kw/vw (nph, H, M, ps_w) int32 words — page bi covers
    tokens [bi*page_size, (bi+1)*page_size). Scans one page at a time
    (bounded memory, leading-axis page indexing only); positions >=
    n_prev mask out. Returns ((bs=1, nh, nc, d) f32 normalized, lse)."""
    from million_tpu.ops.pq_attention_pallas import unpack_codes
    from million_tpu.ops.pq_attention_ref import _gqa_expand
    from million_tpu.pq.ops import pq_decode

    nph, H = kw.shape[0], kw.shape[1]
    bs, nh, nc, d = q.shape
    qf = q.astype(jnp.float32) * scale

    m0 = jnp.full((bs, nh, nc, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bs, nh, nc, 1), jnp.float32)
    acc0 = jnp.zeros((bs, nh, nc, d), jnp.float32)

    def body(carry, bi):
        m, l, acc = carry
        kp = jax.lax.dynamic_index_in_dim(kw, bi, 0, False)  # (H, M, ps_w)
        vp = jax.lax.dynamic_index_in_dim(vw, bi, 0, False)
        khat = pq_decode(
            jnp.swapaxes(unpack_codes(kp), -1, -2)[None], kcent,
            SUBSPACE_LAYOUT,
        )  # (1, H, page_size, d) f32
        vhat = pq_decode(
            jnp.swapaxes(unpack_codes(vp), -1, -2)[None], vcent,
            SUBSPACE_LAYOUT,
        )
        kf = _gqa_expand(khat, nh)
        vf = _gqa_expand(vhat, nh)
        sc = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
        kpos = bi * page_size + jnp.arange(page_size)
        sc = jnp.where((kpos < n_prev)[None, None, None], sc, -1e30)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(nph))
    safe_l = jnp.maximum(l, 1e-30)
    lse = jnp.where(l[..., 0] > 0, m[..., 0] + jnp.log(safe_l[..., 0]), -1e30)
    return acc / safe_l, lse


def _history_pages_kernel(q, kw, vw, tables, li, n_prev, scale, page_size,
                          ko_pages=None, koidx=None,
                          vo_pages=None, voidx=None):
    """Pallas chunk-kernel form of _history_partial_pages (VERDICT r3
    item 1): the gathered pages (S, nph, H, M, ps_w) are page-major and
    token-contiguous within each page, so stacking them along the word
    axis yields a flat arena (1, H, M, nph*ps_w) whose token t lives at
    global position t — exactly pq_chunk_attention's layout; positions
    >= n_prev (scratch/garbage pages included) mask out via n_codes.
    ko_pages/vo_pages (nph, H, 4, O, ps_w) byte-plane outlier pages stack
    the same way and fold in as dense corrections (round-4 outlier
    serving)."""
    from million_tpu.models.chunked_prefill import (
        _table_layer,
        history_kernel_block,
    )
    from million_tpu.ops.pq_attention_pallas import pq_chunk_history_attention

    S, nph, H = kw.shape[0], kw.shape[1], kw.shape[2]
    arena_k = kw.transpose(0, 2, 3, 1, 4).reshape(S, H, kw.shape[3], -1)
    arena_v = vw.transpose(0, 2, 3, 1, 4).reshape(S, H, vw.shape[3], -1)
    interpret = jax.default_backend() == "cpu"
    blk = history_kernel_block(nph * page_size, interpret)
    d_k, d_v = direct_flags(tables)
    okw = {}
    if ko_pages is not None:
        okw["k_outliers"] = ko_pages.transpose(0, 2, 3, 4, 1, 5).reshape(
            S, H, 4, ko_pages.shape[4], -1)
        okw["koidx"] = koidx
    if vo_pages is not None:
        okw["v_outliers"] = vo_pages.transpose(0, 2, 3, 4, 1, 5).reshape(
            S, H, 4, vo_pages.shape[4], -1)
        okw["voidx"] = voidx
    return pq_chunk_history_attention(
        q, arena_k, arena_v,
        _table_layer(tables["kpack"], li), _table_layer(tables["vpack"], li),
        n_prev, scale, block=blk, direct=d_k, v_direct=d_v, **okw,
    )


def _paged_decode_step_impl(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    tokens: jax.Array,  # (S,) int32 — last sampled token per slot
    positions: jax.Array,  # (S,) int32 — absolute position of `tokens`
    state: Dict[str, jax.Array],  # paged cache state (all layers)
    tables: Dict[str, jax.Array],  # cents + kpack/vpack, stacked (L, ...)
    p_bucket=None,  # STATIC: page-walk bound — the scheduler passes a
    # power-of-two covering the longest allocated table (l2Ns analogue)
    mesh=None,  # STATIC jax.sharding.Mesh -> the page pool is sequence-
    # sharded (parallel/paged_sharded.py) and attention runs per shard
    # with the 2-collective LSE merge; everything else GSPMD-partitions
    # over (tp,) via the input shardings
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decode token for every slot. Returns (logits (S, V) f32, state).

    Inactive slots (seq_active == 0) still compute (lockstep batch) but
    their cache writes are masked out.

    Contract (round 3, window-flush batching — VERDICT r2 item 4): this
    step does NO encoding — the new token's k/v go to the exact residual
    window only, and the caller must run `flush_paged_slots` on any slot
    whose window is full (seq_r >= Lt) BEFORE stepping it again. The flat
    path measured the per-token encode+RMW pattern at ~1.2 ms/step and
    amortizes it the same way (cache/pq_cache.py:23-27 rationale); the
    round-2 paged step paid encode + 2 word-RMWs + 2 pool scatters per
    layer per token on top of that. A slot stepped past a full window
    overwrites its last residual row (data loss) — the scheduler flushes
    first (runtime/scheduler.py step()).
    """
    S = tokens.shape[0]
    nh, nh_k, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = nh // nh_k
    scale = 1.0 / (dh**0.5)
    inv_freq = _rope_freqs(cfg)
    rope_ms = _rope_mscale(cfg)
    active = state["seq_active"] > 0  # (S,)
    r = state["seq_r"]  # (S,)
    n_codes = state["seq_n_codes"]

    x = params["embed"][tokens][:, None, :]  # (S, 1, D)
    # safety clamp: an unflushed full window would otherwise scatter out of
    # bounds (advanced-index .at writes clamp silently — make it explicit)
    wr = jnp.where(active, jnp.minimum(r, pcfg.Lt - 1), 0)

    def layer(carry, lp):
        x, st, li = carry
        kres = jax.lax.dynamic_index_in_dim(st["key_residual"], li, 0, False)
        vres = jax.lax.dynamic_index_in_dim(st["value_residual"], li, 0, False)

        h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        qf = jnp.einsum("bnd,fd->bnf", h, lp["wq"])
        kf = jnp.einsum("bnd,fd->bnf", h, lp["wk"])
        vf = jnp.einsum("bnd,fd->bnf", h, lp["wv"])
        if "bq" in lp:  # qwen2-family q/k/v biases
            qf = qf + lp["bq"]
            kf = kf + lp["bk"]
            vf = vf + lp["bv"]
        q = qf.reshape(S, 1, nh, dh).transpose(0, 2, 1, 3)
        k = kf.reshape(S, 1, nh_k, dh).transpose(0, 2, 1, 3)
        v = vf.reshape(S, 1, nh_k, dh).transpose(0, 2, 1, 3)
        q = _rope_per_seq(q, positions, inv_freq, rope_ms)
        k = _rope_per_seq(k, positions, inv_freq, rope_ms)
        Rk_i, Rv_i = _layer_rots(tables, li)
        if Rk_i is not None:
            k = _rotate(k, Rk_i)
            v = _rotate(v, Rv_i)
            q_att = _rotate(q, Rk_i)
        else:
            q_att = q

        # append the new token to the residual window at wr (per slot)
        k1 = k[:, :, 0].astype(kres.dtype)  # (S, nh_k, d)
        v1 = v[:, :, 0].astype(vres.dtype)
        kres_new = kres.at[jnp.arange(S), :, wr].set(
            jnp.where(active[:, None, None], k1, kres[jnp.arange(S), :, wr])
        )
        vres_new = vres.at[jnp.arange(S), :, wr].set(
            jnp.where(active[:, None, None], v1, vres[jnp.arange(S), :, wr])
        )

        st = dict(st)
        st["key_residual"] = jax.lax.dynamic_update_slice(
            st["key_residual"], kres_new[None], (li, 0, 0, 0, 0)
        )
        st["value_residual"] = jax.lax.dynamic_update_slice(
            st["value_residual"], vres_new[None], (li, 0, 0, 0, 0)
        )

        # --- attention: paged codes partial + residual partial, LSE merge
        d_k, d_v = direct_flags(tables)
        check_group(G)
        qg = (q_att[:, :, 0].astype(jnp.float32) * scale).reshape(S, nh_k, G, dh)
        q_pad = jnp.zeros((S, nh_k, GROUP_PAD, dh), jnp.bfloat16)
        q_pad = q_pad.at[:, :, :G].set(qg.astype(jnp.bfloat16))
        # outlier-channel corrections (round 4: the flat kernel's OK/OV
        # option served through the paged path — VERDICT r3 item 3)
        okw = {}
        if "key_outlier_pool" in st:
            koidx_l = jax.lax.dynamic_index_in_dim(
                tables["k_outlier_idx"], li, 0, False)
            okw["qo"] = jnp.take_along_axis(
                q_pad, koidx_l[None, None, None, :], axis=-1)
            okw["k_outliers"] = st["key_outlier_pool"]
        if "value_outlier_pool" in st:
            okw["v_outliers"] = st["value_outlier_pool"]
        if mesh is None:
            res = pq_paged_attention_stacked(
                q_pad, st["key_pool"], st["value_pool"],
                tables["kpack"], tables["vpack"], li,
                state["page_table"], n_codes,
                direct=d_k, v_direct=d_v, p_bucket=p_bucket, **okw,
            )
        else:
            from million_tpu.parallel.paged_sharded import (
                sharded_paged_attention_stacked,
            )

            res = sharded_paged_attention_stacked(
                mesh, pcfg, q_pad, st["key_pool"], st["value_pool"],
                tables["kpack"], tables["vpack"], li,
                state["page_table"], n_codes,
                p_bucket=p_bucket, direct=d_k, v_direct=d_v,
                qo=okw.get("qo"), k_outliers=okw.get("k_outliers"),
                v_outliers=okw.get("v_outliers"),
            )
        if "value_outlier_pool" in st:
            out_c, lse_c, co = res
            voidx_l = jax.lax.dynamic_index_in_dim(
                tables["v_outlier_idx"], li, 0, False)
            # decoded outlier components are exactly 0 (centroids trained
            # on zeroed channels); the correction IS the channel value
            out_c = out_c.at[..., voidx_l].set(co)
        else:
            out_c, lse_c = res
        # valid residual entries per slot: [0, wr] (token just appended)
        rmask = jnp.arange(pcfg.Lt)[None] <= jnp.where(active, wr, -1)[:, None]
        out_r, lse_r = masked_partial_attention(
            q_pad.astype(jnp.float32),
            kres_new,
            vres_new,
            rmask[:, None, None, :],  # broadcast over (nh_k, G)
            scale=1.0,
        )
        merged, _ = merge_two_partials(out_c, lse_c, out_r, lse_r)
        if Rv_i is not None:
            merged = _rotate(merged, Rv_i.T)
        attn = merged[:, :, :G].reshape(S, 1, nh * dh)

        x_out = x + jnp.einsum("bnf,df->bnd", attn.astype(x.dtype), lp["wo"]).astype(x.dtype)
        h2 = _rms_norm(x_out, lp["mlp_norm"], cfg.rms_eps)
        x_out = x_out + _mlp(h2, lp).astype(x.dtype)
        return (x_out, st, li + 1), None

    (x, state2, _), _ = jax.lax.scan(
        layer, (x, state, jnp.asarray(0, jnp.int32)), params["layers"]
    )

    logits = _logits(params, cfg, x)[:, 0]  # (S, V)

    new = dict(state2)
    new["seq_r"] = jnp.where(active, wr + 1, r)
    return logits, new


# public jitted form; the unjitted _paged_decode_step_impl exists so the
# scheduler's fused tick (decode + sample + key split in ONE program,
# runtime/scheduler.py _fused_tick) can inline it without nested-jit
# donation warnings
paged_decode_step = partial(
    jax.jit, static_argnames=("cfg", "pcfg", "p_bucket", "mesh"),
    donate_argnums=(5,),
)(_paged_decode_step_impl)


POOL_KEYS = ("key_pool", "value_pool", "key_outlier_pool",
             "value_outlier_pool")


def _put_page(pool, upd, page, off):
    """dynamic_update_slice of one page's slab: pool (L, P+1, ..., ps_w),
    upd (L, 1, ..., w) — index (0, page, 0, ..., off)."""
    z = jnp.int32(0)
    idx = (z, page) + (z,) * (pool.ndim - 3) + (off,)
    return jax.lax.dynamic_update_slice(pool, upd, idx)


def _commit_words_body(pools, updates, pages, off):
    """Write one admission chunk's packed words (and outlier slabs) for
    ALL layers into the pools. `pools` is the dict of page pools (codes +
    optional byte-plane outlier pools), donated; `updates` maps the same
    keys to ARGUMENT slabs with the page axis removed — codes
    (L, H, M, ncw) int32, outliers (L, H, 4, O, ncw) bf16. Producing the
    update operand inside the same program as the dynamic_update_slice
    makes XLA's layout assigner relayout-copy the multi-GB pool to the
    producer's layout (5.5 GB padded at the 3B serving shape — observed
    compile OOM, reproduced in isolation); argument layouts are natural,
    so this tiny writer program stays at ~0 temp memory. pages (npc,)
    int32 page ids (scratch-routed by the caller); off () int32 sub-page
    word offset (0 for page-aligned commits). The unjitted body is shared
    with the sp-sharded commit (parallel/paged_sharded.py), which calls
    it per shard inside shard_map with locally-routed page ids."""
    ncw = updates["key_pool"].shape[-1]
    ps_w = pools["key_pool"].shape[-1]
    cw = min(ps_w, ncw)
    npc = -(-ncw // cw)
    out = dict(pools)
    for j in range(npc):
        w = min(cw, ncw - j * cw)
        for key, upd in updates.items():
            out[key] = _put_page(
                out[key], upd[:, None, ..., j * cw : j * cw + w], pages[j], off
            )
    return out


_commit_words = partial(jax.jit, donate_argnums=(0,))(_commit_words_body)


def _commit_words_multi_body(pools, updates, pages, off):
    """Per-slot variant of _commit_words for batched admission: updates
    carry a slot axis (L, S, H, ..., ncw); pages (S, npc) int32 routes
    each slot's word-chunks to its own pages; off is the shared sub-page
    word offset (slots in one batch sit at the same chunk position)."""
    S = updates["key_pool"].shape[1]
    ncw = updates["key_pool"].shape[-1]
    ps_w = pools["key_pool"].shape[-1]
    cw = min(ps_w, ncw)
    npc = -(-ncw // cw)
    out = dict(pools)
    for si in range(S):
        for j in range(npc):
            w = min(cw, ncw - j * cw)
            for key, upd in updates.items():
                out[key] = _put_page(
                    out[key],
                    upd[:, si][:, None, ..., j * cw : j * cw + w],
                    pages[si, j], off,
                )
    return out


_commit_words_multi = partial(jax.jit, donate_argnums=(0,))(
    _commit_words_multi_body
)


def _commit_flush_body(pools, updates, pages, offs):
    """Write flushed residual-window words (and outlier slabs) for ALL
    layers, per slot. `updates` maps pool keys to (L, S, H, ..., Ltw)
    ARGUMENT slabs (see _commit_words for why); pages/offs (S,) int32
    per-slot page id + in-page word offset (a window never crosses a
    page: page_size % Lt == 0)."""
    S = updates["key_pool"].shape[1]
    out = dict(pools)
    for si in range(S):
        for key, upd in updates.items():
            out[key] = _put_page(
                out[key], upd[:, si][:, None], pages[si], offs[si]
            )
    return out


_commit_flush = partial(jax.jit, donate_argnums=(0,))(_commit_flush_body)


def _split_state(state):
    """(pools dict, everything-else): compute cores take the substate
    (plus read-only pool args where needed) and never RETURN pools — an
    unmodified pass-through output is still a copy without donation, and a
    pool written inside a producer program triggers the relayout hazard
    above."""
    pools = {k: state[k] for k in POOL_KEYS if k in state}
    sub = {k: v for k, v in state.items() if k not in pools}
    return pools, sub


@partial(jax.jit, static_argnames=("pcfg",))
def _flush_encode_core(pcfg, sub, tables, mask):
    """Encode every slot's residual window for all layers; no pool access.
    Returns (updates dict keyed like the pools — code words
    (L, S, H, M_side, Ltw) int32 + optional byte-plane outlier slabs
    (L, S, H, 4, O, Ltw) bf16 — new seq_n_codes, new seq_r)."""
    from million_tpu.ops.pq_attention_pallas import pack_codes, to_byte_plane

    def layer(_, li):
        kres = jax.lax.dynamic_index_in_dim(sub["key_residual"], li, 0, False)
        vres = jax.lax.dynamic_index_in_dim(sub["value_residual"], li, 0, False)
        kcent = jax.lax.dynamic_index_in_dim(tables["key"], li, 0, False)
        vcent = jax.lax.dynamic_index_in_dim(tables["value"], li, 0, False)
        # windows are stored in codebook (rotated) space already
        kc = runtime_encode(kres, kcent, SUBSPACE_LAYOUT)  # (S, H, Lt, M)
        vc = runtime_encode(vres, vcent, SUBSPACE_LAYOUT)
        out = {
            "key_pool": pack_codes(jnp.swapaxes(kc, -1, -2)),  # (S, H, M, Ltw)
            "value_pool": pack_codes(jnp.swapaxes(vc, -1, -2)),
        }
        # exact outlier channels of the window -> byte-plane slabs
        # (channels were zeroed before codebook training, so the codes
        # already spend no mass on them — llama.prefill's round-3 contract)
        if "k_outlier_idx" in tables:
            koidx = jax.lax.dynamic_index_in_dim(
                tables["k_outlier_idx"], li, 0, False)
            out["key_outlier_pool"] = to_byte_plane(
                jnp.swapaxes(kres[..., koidx], -1, -2)
            ).astype(jnp.bfloat16)  # (S, H, 4, OK, Ltw)
        if "v_outlier_idx" in tables:
            voidx = jax.lax.dynamic_index_in_dim(
                tables["v_outlier_idx"], li, 0, False)
            out["value_outlier_pool"] = to_byte_plane(
                jnp.swapaxes(vres[..., voidx], -1, -2)
            ).astype(jnp.bfloat16)
        return None, out

    L = sub["key_residual"].shape[0]
    _, updates = jax.lax.scan(layer, None, jnp.arange(L, dtype=jnp.int32))
    n_codes = sub["seq_n_codes"]
    new_n = n_codes + jnp.where(mask, pcfg.Lt, 0)
    new_r = jnp.where(mask, 0, sub["seq_r"])
    return updates, new_n, new_r


def flush_paged_slots(
    pcfg: PagedPQCacheConfig,
    state: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    mask: jax.Array,  # (S,) bool — slots whose FULL residual window flushes
    mesh=None,  # jax.sharding.Mesh -> per-shard commit routing
) -> Dict[str, jax.Array]:
    """Encode the full residual windows of the masked slots and write the
    packed words into their pages; advance seq_n_codes by Lt and reset
    seq_r. Host-side composition of two programs — the encode core (no
    pool access) and the tiny argument-fed writer (donated pools) — the
    split exists because a pool written in the producing program gets
    relayout-copied whole (see _commit_words).

    This is the flat path's window-flush (cache/pq_cache.py flush contract)
    applied to the page pool: encode cost is paid once per Lt tokens per
    slot instead of every step. Unmasked slots' writes route to the
    reserved scratch page. The window must be FULL (seq_r == Lt) for
    masked slots — the scheduler guarantees it.
    """
    if pcfg.page_size % pcfg.Lt:
        raise ValueError(
            "flush_paged_slots needs page_size % Lt == 0 (a residual window "
            "must land inside one page)"
        )
    ps_w = pcfg.page_size // 4
    pools, sub = _split_state(state)
    updates, new_n, new_r = _flush_encode_core(pcfg, sub, tables, mask)
    w0 = state["seq_n_codes"] // 4  # (S,)
    if mesh is None:
        scratch = pools["key_pool"].shape[1] - 1
        raw = jnp.take_along_axis(
            state["page_table"],
            jnp.clip(w0 // ps_w, 0, pcfg.pages_per_seq - 1)[:, None],
            axis=1,
        )[:, 0]
        pages = jnp.where((raw < 0) | ~mask, scratch, raw)
        pools = _commit_flush(pools, updates, pages, w0 % ps_w)
    else:
        from million_tpu.parallel.paged_sharded import sharded_commit_flush

        tpos = jnp.clip(w0 // ps_w, 0, pcfg.pages_per_seq - 1)
        pools = sharded_commit_flush(
            mesh, pcfg, pools, updates, state["page_table"], tpos,
            w0 % ps_w, mask,
        )
    new = dict(sub)
    new.update(pools)
    new["seq_n_codes"] = new_n
    new["seq_r"] = new_r
    return new


@partial(jax.jit, static_argnames=("cfg", "pcfg", "has_nv"))
def _prefill_seq_core(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    seq_id: jax.Array,
    input_ids: jax.Array,  # (1, n)
    sub: Dict[str, jax.Array],  # paged state WITHOUT pools (_split_state)
    tables: Dict[str, jax.Array],
    nv: jax.Array,  # () int32 real length (== n when not bucketed)
    has_nv: bool,
) -> Tuple[jax.Array, Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Transformer pass of one-shot admission: exact causal attention,
    per-layer encode, residual-tail writes, counters. Emits the packed
    code words (L, H, M_side, ncw) — plus byte-plane outlier slabs
    (L, H, 4, O, ncw) for outlier geometries — keyed like the pools, for
    the separate pool writer (_commit_words); no pool access here (see
    _commit_words for why). Returns (last-real-token logits, new
    substate, updates dict or None)."""
    from million_tpu.ops.pq_attention_pallas import pack_codes, to_byte_plane

    n = input_ids.shape[1]
    if has_nv and n % 4:
        raise ValueError("bucketed admission requires a 4-aligned bucket")
    n4 = (n // 4) * 4
    tail = 0 if has_nv else n - n4
    pos = jnp.arange(n)
    x = params["embed"][input_ids[0]][None]  # (1, n, D)

    def layer(carry, lp):
        x, st, li = carry
        kcent = jax.lax.dynamic_index_in_dim(tables["key"], li, 0, False)
        vcent = jax.lax.dynamic_index_in_dim(tables["value"], li, 0, False)
        h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(h, lp, cfg, pos)
        # OPQ: the stored cache (pages + residual) lives in rotated space;
        # the exact prefill attention below stays in the original space.
        Rk_i, Rv_i = _layer_rots(tables, li)
        if Rk_i is not None:
            k_st = _rotate(k, Rk_i)
            v_st = _rotate(v, Rv_i)
        else:
            k_st, v_st = k, v
        kc = jnp.swapaxes(
            runtime_encode(k_st[0], kcent, SUBSPACE_LAYOUT), -1, -2)
        vc = jnp.swapaxes(
            runtime_encode(v_st[0], vcent, SUBSPACE_LAYOUT), -1, -2)
        upd_l = None
        if n4:
            upd_l = {
                "key_pool": pack_codes(kc[..., :n4]),
                "value_pool": pack_codes(vc[..., :n4]),
            }
            if "k_outlier_idx" in tables:
                koidx = jax.lax.dynamic_index_in_dim(
                    tables["k_outlier_idx"], li, 0, False)
                upd_l["key_outlier_pool"] = to_byte_plane(
                    jnp.swapaxes(k_st[0, :, :n4][..., koidx], -1, -2)
                ).astype(jnp.bfloat16)  # (H, 4, OK, n4//4)
            if "v_outlier_idx" in tables:
                voidx = jax.lax.dynamic_index_in_dim(
                    tables["v_outlier_idx"], li, 0, False)
                upd_l["value_outlier_pool"] = to_byte_plane(
                    jnp.swapaxes(v_st[0, :, :n4][..., voidx], -1, -2)
                ).astype(jnp.bfloat16)
        st = dict(st)
        if tail:
            # ragged tail -> exact residual window (rotated space, matching
            # the pools); codes are produced later by flush_paged_slots
            kt = k_st[0, :, n4:].astype(st["key_residual"].dtype)
            vt = v_st[0, :, n4:].astype(st["value_residual"].dtype)
            st["key_residual"] = st["key_residual"].at[li, seq_id, :, :tail].set(kt)
            st["value_residual"] = st["value_residual"].at[li, seq_id, :, :tail].set(vt)
        if has_nv:
            # dynamic ragged tail (bucketed admission): the up-to-3 real
            # tokens past the aligned prefix go to the exact residual
            # window. A full 4-row slice is written; rows past the real
            # tail are garbage masked by seq_r.
            start = jnp.minimum((nv // 4) * 4, n - 4)
            kt4 = jax.lax.dynamic_slice_in_dim(k_st[0], start, 4, axis=1)
            vt4 = jax.lax.dynamic_slice_in_dim(v_st[0], start, 4, axis=1)
            st["key_residual"] = st["key_residual"].at[li, seq_id, :, :4].set(
                kt4.astype(st["key_residual"].dtype)
            )
            st["value_residual"] = st["value_residual"].at[li, seq_id, :, :4].set(
                vt4.astype(st["value_residual"].dtype)
            )
        attn = causal_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(1, n, -1)
        x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
        h2 = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + _mlp(h2, lp).astype(x.dtype)
        return (x, st, li + 1), upd_l

    (x, sub, _), updates = jax.lax.scan(
        layer, (x, sub, jnp.asarray(0, jnp.int32)), params["layers"]
    )  # updates: dict of (L, ...) slabs, or None when n4 == 0
    # project ONLY the last real token (the (1, n, V) f32 tensor is 2.1 GB
    # at 4096 tokens x 128K vocab)
    x_last = jax.lax.dynamic_slice_in_dim(x, nv - 1, 1, axis=1)
    logits = _logits(params, cfg, x_last)[:, 0]  # (1, V)

    new = dict(sub)
    new["seq_n_codes"] = sub["seq_n_codes"].at[seq_id].set((nv // 4) * 4)
    new["seq_r"] = sub["seq_r"].at[seq_id].set(nv - (nv // 4) * 4)
    new["seq_active"] = sub["seq_active"].at[seq_id].set(1)
    return logits, new, updates


def paged_prefill_seq(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    seq_id: jax.Array,  # () int32 — slot being admitted
    input_ids: jax.Array,  # (1, n) int32 — n may be a PADDED bucket length
    state: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    n_valid: Optional[jax.Array] = None,  # () int32 — real prompt length
    # when input_ids is padded to a bucket; None = every token is real
    mesh=None,  # jax.sharding.Mesh -> per-shard commit routing
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Admit one sequence: exact-attention prefill whose K/V are encoded
    and written into the slot's (pre-allocated) pages. Returns (last-token
    logits (1, V), new state). The reference's prefill quantizes everything
    and leaves the residual empty (pq_utils.py:222-247); same here.

    `n_valid` enables BUCKETED admission (the scheduler pads prompts to
    bucket lengths so the compile count is ~log2(max_prompt), not one
    executable per distinct length): padded positions sit AFTER every real
    token so causality masks them out of real rows; fully-padded or
    unallocated pages route to the write-only scratch page, and a
    partially-real page carries unread garbage past n_valid (masked by
    seq_n_codes, overwritten by the first flushes); the returned logits
    select position n_valid-1; counters advance by the real length only.

    Host-side composition: transformer core (no pool access) + the tiny
    argument-fed pool writer — see _commit_words for why the split exists.
    """
    n = input_ids.shape[1]
    has_nv = n_valid is not None
    nv = jnp.asarray(n_valid if has_nv else n, jnp.int32)
    pools, sub = _split_state(state)
    logits, new_sub, updates = _prefill_seq_core(
        params, cfg, pcfg, jnp.asarray(seq_id, jnp.int32), input_ids, sub,
        tables, nv, has_nv,
    )
    if updates is not None:
        ps_w = pcfg.page_size // 4
        ncw = updates["key_pool"].shape[-1]
        npg = -(-ncw // ps_w)
        j = jnp.arange(npg)
        real = (j * ps_w) < ((nv + 3) // 4)
        if mesh is None:
            raw = state["page_table"][seq_id, :npg]
            pages = jnp.where(real & (raw >= 0), raw, pcfg.n_pages)
            pools = _commit_words(pools, updates, pages, jnp.int32(0))
        else:
            from million_tpu.parallel.paged_sharded import (
                sharded_commit_words,
            )

            pools = sharded_commit_words(
                mesh, pcfg, pools, updates, state["page_table"], seq_id,
                j, real, jnp.int32(0),
            )
    new = dict(new_sub)
    new.update(pools)
    return logits, new


# ---------------------------------------------------------------------------
# Chunked admission: long prompts into pages with bounded activation memory
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "pcfg", "hw_bucket", "last_chunk",
                                   "use_kernel", "mesh"))
def _paged_prefill_chunk_core(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    seq_ids: jax.Array,  # (S,) int32 — slots admitted TOGETHER (round 4:
    # batched admission — the per-chunk transformer/encode/MLP costs
    # amortize over S equal-bucket prompts)
    ids: jax.Array,  # (S, nc) int32 — one FULL chunk per slot (nc % 4 == 0)
    key_pool: jax.Array,  # read-only (history pages)
    value_pool: jax.Array,
    k_out_pool,  # read-only byte-plane outlier pools (or None): history
    v_out_pool,  # attention corrections for outlier geometries
    page_table: jax.Array,
    sub: Dict[str, jax.Array],  # paged state WITHOUT pools
    tables: Dict[str, jax.Array],
    pos_offset: jax.Array,  # () int32 — global position of ids[:, 0]
    n_valid: jax.Array,  # (S,) int32 — real prompt lengths (equal bucket,
    # possibly different real lengths)
    hw_bucket: int,  # STATIC: history WORDS read from the slot's pages
    # (power-of-two bucket >= pos_offset//4, so executables are shared
    # across chunk indices and admissions)
    last_chunk: bool,
    use_kernel: bool = False,  # STATIC: history partial via the Pallas
    # chunk kernel (_history_pages_kernel) instead of the jnp page walk
    mesh=None,  # STATIC jax.sharding.Mesh -> history partial per shard
    # (sharded_history_pages_kernel) + sharded commit routing by the
    # caller; the transformer core GSPMD-partitions over tp
) -> Tuple[jax.Array, Dict[str, jax.Array], jax.Array, jax.Array]:
    """One admission chunk for the PAGED cache (VERDICT r2 item 3): the
    flat chunked_prefill decomposition (exact causal within the chunk +
    page-by-page attention against the QUANTIZED history, LSE-merged —
    models/chunked_prefill.py) with the history read from the slot's page
    table. Activation memory is bounded by (nc, page_size), independent of
    total prompt length, so 16-32K admissions fit beside the pool (the
    one-shot paged_prefill_seq is kept for short prompts).

    Pools are READ-ONLY inputs; the chunk's packed code words come back as
    outputs (L, S, H, M_side, ncw) for the separate argument-fed writer
    (_commit_words_multi — see _commit_words for why writes must not live
    here). Returns (logits (S, V), new substate, updates).
    """
    from million_tpu.models.chunked_prefill import _causal_partial
    from million_tpu.ops.pq_attention_pallas import pack_codes, to_byte_plane

    S, nc = ids.shape
    if nc % 4:
        raise ValueError("chunk length must be a multiple of 4")
    scale = 1.0 / (cfg.head_dim**0.5)
    nv = jnp.asarray(n_valid, jnp.int32)  # (S,)
    pos = pos_offset + jnp.arange(nc)
    x = params["embed"][ids]  # (S, nc, D)
    ps_w = pcfg.page_size // 4
    scratch = key_pool.shape[1] - 1

    # history read pattern: each slot's pages covering the first hw_bucket
    # words (bucketed pow2; tokens >= pos_offset are masked inside
    # the history partial). PAGE-granularity leading-axis gathers only.
    if hw_bucket:
        nph = -(-hw_bucket // ps_w)  # pages covering the bucket
        if mesh is None:
            h_raw = page_table[seq_ids][:, : max(nph, 1)]  # (S, nph)
            h_pages = jnp.where(h_raw >= 0, h_raw, scratch)

    def layer(carry, lp):
        x, st, li = carry
        kcent = jax.lax.dynamic_index_in_dim(tables["key"], li, 0, False)
        vcent = jax.lax.dynamic_index_in_dim(tables["value"], li, 0, False)
        h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(h, lp, cfg, pos)
        Rk_i, Rv_i = _layer_rots(tables, li)
        if Rk_i is not None:
            k_st, v_st, q_h = _rotate(k, Rk_i), _rotate(v, Rv_i), _rotate(q, Rk_i)
        else:
            k_st, v_st, q_h = k, v, q

        kc = jnp.swapaxes(runtime_encode(k_st, kcent, SUBSPACE_LAYOUT), -1, -2)
        vc = jnp.swapaxes(runtime_encode(v_st, vcent, SUBSPACE_LAYOUT), -1, -2)
        upd_l = {
            "key_pool": pack_codes(kc),  # (S, H, M, ncw)
            "value_pool": pack_codes(vc),
        }
        koidx = voidx = None
        if "k_outlier_idx" in tables:
            koidx = jax.lax.dynamic_index_in_dim(
                tables["k_outlier_idx"], li, 0, False)
            upd_l["key_outlier_pool"] = to_byte_plane(
                jnp.swapaxes(k_st[..., koidx], -1, -2)
            ).astype(jnp.bfloat16)  # (S, H, 4, OK, ncw)
        if "v_outlier_idx" in tables:
            voidx = jax.lax.dynamic_index_in_dim(
                tables["v_outlier_idx"], li, 0, False)
            upd_l["value_outlier_pool"] = to_byte_plane(
                jnp.swapaxes(v_st[..., voidx], -1, -2)
            ).astype(jnp.bfloat16)
        st = dict(st)

        out_c, lse_c = _causal_partial(q, k, v, scale)
        if hw_bucket and mesh is not None:
            # sharded history: each shard gathers ITS pages covering the
            # bucket and the shards LSE-merge (paged_sharded.py); mesh
            # admission always runs the kernel path (packed tables
            # required — _admit_chunked_impl enforces it)
            from million_tpu.models.chunked_prefill import _table_layer
            from million_tpu.parallel.paged_sharded import (
                sharded_history_pages_kernel,
            )

            d_kf, d_vf = direct_flags(tables)
            okw2 = {}
            if k_out_pool is not None:
                okw2.update(ko_pool=k_out_pool, koidx=koidx)
            if v_out_pool is not None:
                okw2.update(vo_pool=v_out_pool, voidx=voidx)
            out_h, lse_h = sharded_history_pages_kernel(
                mesh, pcfg, q_h, key_pool, value_pool,
                _table_layer(tables["kpack"], li),
                _table_layer(tables["vpack"], li),
                li, seq_ids, page_table, pos_offset, scale, nph,
                direct=d_kf, v_direct=d_vf, **okw2,
            )
            if Rv_i is not None:
                out_h = _rotate(out_h, Rv_i.T)
            attn, _ = merge_two_partials(out_c, lse_c, out_h, lse_h)
        elif hw_bucket:
            kw = key_pool[li, h_pages]  # (S, nph, H, M, ps_w)
            vw = value_pool[li, h_pages]
            if use_kernel:
                okw = {}
                if k_out_pool is not None:
                    okw["ko_pages"] = k_out_pool[li, h_pages]
                    okw["koidx"] = koidx
                if v_out_pool is not None:
                    okw["vo_pages"] = v_out_pool[li, h_pages]
                    okw["voidx"] = voidx
                out_h, lse_h = _history_pages_kernel(
                    q_h, kw, vw, tables, li, pos_offset, scale,
                    pcfg.page_size, **okw,
                )
            else:
                # jnp oracle path (CPU tests / wide codebooks): per-slot
                # python loop — static S, test-scale only
                parts = [
                    _history_partial_pages(
                        q_h[si : si + 1], kw[si], vw[si], kcent, vcent,
                        pos_offset, scale, pcfg.page_size,
                    )
                    for si in range(S)
                ]
                out_h = jnp.concatenate([p[0] for p in parts], axis=0)
                lse_h = jnp.concatenate([p[1] for p in parts], axis=0)
            if Rv_i is not None:
                out_h = _rotate(out_h, Rv_i.T)
            attn, _ = merge_two_partials(out_c, lse_c, out_h, lse_h)
        else:
            attn = out_c

        if last_chunk:
            # ragged real tail (up to 3 tokens) -> exact residual window;
            # a full 4-row slice is written, rows past the tail are masked
            # by seq_r (same contract as paged_prefill_seq). Per-slot tail
            # starts (real lengths may differ within the bucket) -> a
            # 4-row gather per slot.
            start = jnp.clip((nv // 4) * 4 - pos_offset, 0, nc - 4)  # (S,)
            ridx = start[:, None] + jnp.arange(4)[None, :]  # (S, 4)
            kt4 = jnp.take_along_axis(
                k_st, ridx[:, None, :, None], axis=2)  # (S, H, 4, d)
            vt4 = jnp.take_along_axis(v_st, ridx[:, None, :, None], axis=2)
            st["key_residual"] = st["key_residual"].at[li, seq_ids, :, :4].set(
                kt4.astype(st["key_residual"].dtype)
            )
            st["value_residual"] = st["value_residual"].at[li, seq_ids, :, :4].set(
                vt4.astype(st["value_residual"].dtype)
            )

        attn = attn.astype(x.dtype).transpose(0, 2, 1, 3).reshape(S, nc, -1)
        x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
        h2 = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + _mlp(h2, lp).astype(x.dtype)
        return (x, st, li + 1), upd_l

    (x, sub, _), updates = jax.lax.scan(
        layer, (x, sub, jnp.asarray(0, jnp.int32)), params["layers"]
    )
    if not last_chunk:
        return jnp.zeros((S, cfg.vocab_size), jnp.float32), sub, updates
    last = jnp.clip(nv - 1 - pos_offset, 0, nc - 1)  # (S,)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)  # (S, 1, D)
    logits = _logits(params, cfg, x_last)[:, 0]  # (S, V)
    new = dict(sub)
    new["seq_n_codes"] = sub["seq_n_codes"].at[seq_ids].set((nv // 4) * 4)
    new["seq_r"] = sub["seq_r"].at[seq_ids].set(nv - (nv // 4) * 4)
    new["seq_active"] = sub["seq_active"].at[seq_ids].set(1)
    return logits, new, updates


def _admit_chunked_impl(params, cfg, pcfg, seq_ids, prompts, n_valid,
                        state, tables, chunk, use_kernel, mesh=None):
    """Shared chunked-admission loop over S equal-bucket slots.
    seq_ids (S,) host ints; prompts (S, n_pad) host int32 (zero-padded);
    n_valid (S,) host ints (real lengths). Returns (logits (S, V), state).
    With `mesh`, the history partial and the pool commits run per
    sequence shard (parallel/paged_sharded.py); mesh admission requires
    packed tables (the kernel path) — wide codebooks stay single-device.
    """
    import numpy as np

    S, n_pad = prompts.shape
    sids = jnp.asarray(np.asarray(seq_ids, np.int32))
    nvj = jnp.asarray(np.asarray(n_valid, np.int32))
    ps_w = pcfg.page_size // 4
    cap_w = pcfg.pages_per_seq * ps_w
    pools, sub = _split_state(state)
    page_table = state["page_table"]
    if mesh is not None and "kpack" not in tables:
        raise ValueError(
            "mesh chunked admission needs packed decode tables (C <= 256)"
        )
    logits = None
    for s0 in range(0, n_pad, chunk):
        hw = s0 // 4
        hw_b = 1
        while hw_b < hw:
            hw_b *= 2
        hw_b = min(hw_b if hw else 0, cap_w)
        uk = use_kernel
        if mesh is not None:
            uk = bool(hw_b)  # sharded history always runs the kernel path
        elif hw_b:
            from million_tpu.models.chunked_prefill import history_kernel_block

            interp = jax.default_backend() == "cpu"
            nph = -(-hw_b // ps_w)
            legal = ("kpack" in tables) and (
                history_kernel_block(nph * pcfg.page_size, interp) is not None
            )
            uk = (legal and not interp) if uk is None else (uk and legal)
        else:
            uk = False
        logits, sub, updates = _paged_prefill_chunk_core(
            params, cfg, pcfg, sids,
            jnp.asarray(prompts[:, s0 : s0 + chunk]),
            pools["key_pool"], pools["value_pool"],
            pools.get("key_outlier_pool"), pools.get("value_outlier_pool"),
            page_table, sub, tables, jnp.asarray(s0, jnp.int32),
            nvj, hw_bucket=hw_b, last_chunk=(s0 + chunk == n_pad),
            use_kernel=uk, mesh=mesh,
        )
        # commit this chunk's words before the next chunk reads history
        ncw = updates["key_pool"].shape[-1]
        cw = min(ps_w, ncw)
        npc = -(-ncw // cw)
        j = jnp.arange(npc)
        w0 = s0 // 4 + j * cw  # (npc,)
        real = w0[None, :] < ((nvj[:, None] + 3) // 4)
        off = jnp.asarray((s0 // 4) % ps_w if cw < ps_w else 0, jnp.int32)
        if mesh is None:
            raw = page_table[
                sids[:, None],
                jnp.clip(w0 // ps_w, 0, pcfg.pages_per_seq - 1)[None, :],
            ]  # (S, npc)
            pages = jnp.where(real & (raw >= 0), raw, pcfg.n_pages)
            pools = _commit_words_multi(pools, updates, pages, off)
        else:
            from million_tpu.parallel.paged_sharded import (
                sharded_commit_words_multi,
            )

            tpos = jnp.clip(w0 // ps_w, 0, pcfg.pages_per_seq - 1)
            pools = sharded_commit_words_multi(
                mesh, pcfg, pools, updates, page_table, sids, tpos, real,
                off,
            )
    new = dict(sub)
    new.update(pools)
    return logits, new


def paged_admit_chunked(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    seq_id,
    prompt,  # 1-D int array (host), real tokens only
    state: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    *,
    chunk: int = 2048,
    hist_block: int = 2048,  # kept for API compat; history walks pages
    use_kernel: bool | None = None,  # history partial via the Pallas chunk
    # kernel; None = auto (packed tables present + not on CPU)
    mesh=None,  # jax.sharding.Mesh -> sharded history + commits
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Host-scheduled chunked admission of one long prompt into a slot's
    pages. The prompt is padded to a multiple of `chunk`; executables
    specialize on (history bucket, last_chunk) only, so all long
    admissions share ~log2(max_prompt/chunk) compiles. The slot's pages
    must already be allocated (allocate_pages) for the full prompt.
    Per chunk: transformer core (pools read-only) then the argument-fed
    pool writer. Returns (last-real-token logits (1, V), new state)."""
    import numpy as np

    if chunk % 4:
        raise ValueError("chunk must be a multiple of 4")
    if chunk % pcfg.page_size and pcfg.page_size % chunk:
        raise ValueError(
            f"chunk {chunk} must be a multiple of page_size "
            f"{pcfg.page_size} (or divide it)"
        )
    prompt = np.asarray(prompt, np.int32)
    n = len(prompt)
    if n == 0:
        raise ValueError("empty prompt")
    n_pad = -(-n // chunk) * chunk
    ids = np.zeros((1, n_pad), np.int32)
    ids[0, :n] = prompt
    return _admit_chunked_impl(
        params, cfg, pcfg, [int(np.asarray(seq_id))], ids, [n], state,
        tables, chunk, use_kernel, mesh=mesh,
    )


def paged_admit_chunked_batch(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    seq_ids,  # sequence of S slot ids (host ints)
    prompts,  # sequence of S 1-D int arrays padding to the SAME bucket
    state: Dict[str, jax.Array],
    tables: Dict[str, jax.Array],
    *,
    chunk: int = 2048,
    use_kernel: bool | None = None,
    mesh=None,  # jax.sharding.Mesh -> sharded history + commits
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batched chunked admission (round 4): S equal-bucket prompts admit
    TOGETHER, so per-chunk encode/MLP/projection costs amortize over the
    batch (slot-by-slot admission paid them S times). Real lengths may
    differ within the bucket; pages must be pre-allocated per slot.
    Returns (last-real-token logits (S, V), new state)."""
    import numpy as np

    if chunk % 4:
        raise ValueError("chunk must be a multiple of 4")
    lens = [len(p) for p in prompts]
    if min(lens) == 0:
        raise ValueError("empty prompt")
    n_pad = -(-max(lens) // chunk) * chunk
    if any(-(-n // chunk) * chunk != n_pad for n in lens):
        raise ValueError(
            f"batched admission needs one shared bucket: lengths {lens} "
            f"pad to different multiples of chunk={chunk}"
        )
    ids = np.zeros((len(prompts), n_pad), np.int32)
    for i, p in enumerate(prompts):
        ids[i, : len(p)] = np.asarray(p, np.int32)
    return _admit_chunked_impl(
        params, cfg, pcfg, list(seq_ids), ids, lens, state, tables, chunk,
        use_kernel, mesh=mesh,
    )
