"""Batched decode step over the paged PQ cache — the serving-path forward.

This is what continuous batching runs: S sequence slots decode one token
each per step, with per-slot lengths/positions, page-table attention
(pq_paged_attention), per-slot exact residual windows, and per-slot
residual flushes (a lax.cond per slot so only full windows pay the encode).

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


@partial(jax.jit, static_argnames=("cfg", "pcfg", "p_bucket"))
def paged_decode_step(
    params: Params,
    cfg: ModelConfig,
    pcfg: PagedPQCacheConfig,
    tokens: jax.Array,  # (S,) int32 — last sampled token per slot
    positions: jax.Array,  # (S,) int32 — absolute position of `tokens`
    state: Dict[str, jax.Array],  # paged cache state (all layers)
    tables: Dict[str, jax.Array],  # cents + kpack/vpack, stacked (L, ...)
    p_bucket=None,  # STATIC: page-walk bound — the scheduler passes a
    # power-of-two covering the longest allocated table (l2Ns analogue)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decode token for every slot. Returns (logits (S, V) f32, state).

    Inactive slots (seq_active == 0) still compute (lockstep batch) but
    their cache writes are masked out.
    """
    S = tokens.shape[0]
    nh, nh_k, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    G = nh // nh_k
    scale = 1.0 / (dh**0.5)
    C = tables["key"].shape[2]
    inv_freq = _rope_freqs(cfg)
    rope_ms = _rope_mscale(cfg)
    active = state["seq_active"] > 0  # (S,)
    r = state["seq_r"]  # (S,)

    x = params["embed"][tokens][:, None, :]  # (S, 1, D)

    # --- residual window restart (per slot; scalar wheres only — a
    # lax.cond over the pools would defeat in-place aliasing) -------------
    must_flush = (r >= pcfg.Lt) & active  # (S,)
    r_eff = jnp.where(must_flush, 0, r)
    n_codes_eff = state["seq_n_codes"] + jnp.where(must_flush, pcfg.Lt, 0)

    def layer(carry, lp):
        x, st, li = carry
        kres = jax.lax.dynamic_index_in_dim(st["key_residual"], li, 0, False)
        vres = jax.lax.dynamic_index_in_dim(st["value_residual"], li, 0, False)
        krc = jax.lax.dynamic_index_in_dim(st["key_residual_codes"], li, 0, False)
        vrc = jax.lax.dynamic_index_in_dim(st["value_residual_codes"], li, 0, False)
        kcent = jax.lax.dynamic_index_in_dim(tables["key"], li, 0, False)
        vcent = jax.lax.dynamic_index_in_dim(tables["value"], li, 0, False)

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

        # append the new token to the residual window at r_eff (per slot),
        # and encode just this one token into the window-code buffers
        k1 = k[:, :, 0].astype(kres.dtype)  # (S, nh_k, d)
        v1 = v[:, :, 0].astype(vres.dtype)
        wr = jnp.where(active, r_eff, 0)
        kres_new = kres.at[jnp.arange(S), :, wr].set(
            jnp.where(active[:, None, None], k1, kres[jnp.arange(S), :, wr])
        )
        vres_new = vres.at[jnp.arange(S), :, wr].set(
            jnp.where(active[:, None, None], v1, vres[jnp.arange(S), :, wr])
        )
        kc1 = runtime_encode(k1, kcent, SUBSPACE_LAYOUT)  # (S, nh_k, M)
        vc1 = runtime_encode(v1, vcent, SUBSPACE_LAYOUT)

        # set byte (wr % 4) of word (wr // 4) in each slot's window words
        def set_slot_byte(words, code):  # words (S, H, M, Ltw); code (S, H, M)
            w_idx = wr // 4  # (S,)
            shift = ((wr % 4) * 8).astype(jnp.uint32)  # (S,)
            old = jnp.take_along_axis(
                words, w_idx[:, None, None, None], axis=-1
            ).astype(jnp.uint32)  # (S, H, M, 1)
            mask = (jnp.uint32(0xFF) << shift)[:, None, None, None]
            newv = (old & ~mask) | (
                code.astype(jnp.uint32)[..., None] << shift[:, None, None, None]
            )
            newv = jnp.where(active[:, None, None, None], newv, old)
            return words.at[jnp.arange(S), :, :, w_idx].set(
                newv.astype(jnp.int32)[..., 0]
            )

        krc_new = set_slot_byte(krc, kc1)
        vrc_new = set_slot_byte(vrc, vc1)

        # mirror every slot's window-code WORDS into its pages at
        # [n_codes_eff, n_codes_eff + Lt) — beyond the valid region until
        # the counters advance, so partial windows are harmless. Inactive /
        # unallocated slots scatter to the reserved scratch page.
        ps_w = pcfg.page_size // 4
        Ltw = pcfg.Lt // 4
        t_w = n_codes_eff[:, None] // 4 + jnp.arange(Ltw)[None]  # (S, Ltw)
        pages = jnp.take_along_axis(
            state["page_table"],
            jnp.clip(t_w // ps_w, 0, pcfg.pages_per_seq - 1),
            axis=1,
        )  # (S, Ltw)
        offs = t_w % ps_w
        scratch = st["key_pool"].shape[1] - 1  # last slab entry = scratch page
        pages = jnp.where((pages < 0) | ~active[:, None], scratch, pages)

        st = dict(st)
        # stacked-pool scatter at layer li: advanced indices (li, pages,
        # offs) broadcast to (S, Ltw) and move to the front -> (S, Ltw, H, M)
        st["key_pool"] = st["key_pool"].at[li, pages, :, :, offs].set(
            krc_new.transpose(0, 3, 1, 2)
        )
        st["value_pool"] = st["value_pool"].at[li, pages, :, :, offs].set(
            vrc_new.transpose(0, 3, 1, 2)
        )
        st["key_residual"] = jax.lax.dynamic_update_slice(
            st["key_residual"], kres_new[None], (li, 0, 0, 0, 0)
        )
        st["value_residual"] = jax.lax.dynamic_update_slice(
            st["value_residual"], vres_new[None], (li, 0, 0, 0, 0)
        )
        st["key_residual_codes"] = jax.lax.dynamic_update_slice(
            st["key_residual_codes"], krc_new[None], (li, 0, 0, 0, 0)
        )
        st["value_residual_codes"] = jax.lax.dynamic_update_slice(
            st["value_residual_codes"], vrc_new[None], (li, 0, 0, 0, 0)
        )

        # --- attention: paged codes partial + residual partial, LSE merge
        d_k, d_v = direct_flags(tables)
        qg = (q_att[:, :, 0].astype(jnp.float32) * scale).reshape(S, nh_k, G, dh)
        q_pad = jnp.zeros((S, nh_k, GROUP_PAD, dh), jnp.bfloat16)
        q_pad = q_pad.at[:, :, :G].set(qg.astype(jnp.bfloat16))
        out_c, lse_c = pq_paged_attention_stacked(
            q_pad, st["key_pool"], st["value_pool"],
            tables["kpack"], tables["vpack"], li,
            state["page_table"], n_codes_eff,
            direct=d_k, v_direct=d_v, p_bucket=p_bucket,
        )
        # valid residual entries per slot: [0, r_eff] (token just appended)
        rmask = jnp.arange(pcfg.Lt)[None] <= jnp.where(active, r_eff, -1)[:, None]
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
    new["seq_n_codes"] = n_codes_eff
    new["seq_r"] = jnp.where(active, r_eff + 1, r)
    return logits, new


@partial(jax.jit, static_argnames=("cfg", "pcfg"))
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
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Admit one sequence: exact-attention prefill whose K/V are encoded and
    scattered into the slot's (pre-allocated) pages. Returns (last-token
    logits (1, V), new state). The reference's prefill quantizes everything
    and leaves the residual empty (pq_utils.py:222-247); same here.

    `n_valid` enables BUCKETED admission (the scheduler pads prompts to
    power-of-two lengths so the compile count is ~log2(max_prompt), not one
    executable per distinct prompt length — without it, real traffic plus
    preemption-readmission lengths caused a compile storm): padded
    positions sit AFTER every real token so causality masks them out of
    real rows; their code words route to the pool's reserved scratch page;
    the returned logits select position n_valid-1; counters advance by the
    real length only."""
    from million_tpu.ops.pq_attention_pallas import pack_codes

    n = input_ids.shape[1]
    if n_valid is not None and n % 4:
        raise ValueError("bucketed admission requires a 4-aligned bucket")
    n4 = (n // 4) * 4
    tail = n - n4
    nv = None if n_valid is None else jnp.asarray(n_valid, jnp.int32)
    S = state["seq_r"].shape[0]
    pos = jnp.arange(n)
    x = params["embed"][input_ids[0]][None]  # (1, n, D)

    ps_w = pcfg.page_size // 4
    t_w = jnp.arange(n4 // 4)
    raw_row = state["page_table"][seq_id, t_w // ps_w]
    if nv is None:
        pages_row = jnp.maximum(raw_row, 0)
    else:
        # padded (or unallocated) words -> the reserved scratch page
        valid_w = t_w < (nv // 4)
        pages_row = jnp.where(
            jnp.logical_and(valid_w, raw_row >= 0), raw_row, pcfg.n_pages
        )
    offs = t_w % ps_w

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
        st = dict(st)
        if n4:
            st["key_pool"] = st["key_pool"].at[li, pages_row, :, :, offs].set(
                pack_codes(kc[..., :n4]).transpose(2, 0, 1)
            )
            st["value_pool"] = st["value_pool"].at[li, pages_row, :, :, offs].set(
                pack_codes(vc[..., :n4]).transpose(2, 0, 1)
            )
        if tail:
            # ragged tail -> exact residual window + its word-packed codes
            # (rotated space, matching the pools)
            kt = k_st[0, :, n4:].astype(st["key_residual"].dtype)  # (nh_k, tail, d)
            vt = v_st[0, :, n4:].astype(st["value_residual"].dtype)
            st["key_residual"] = st["key_residual"].at[li, seq_id, :, :tail].set(kt)
            st["value_residual"] = st["value_residual"].at[li, seq_id, :, :tail].set(vt)
            pad = jnp.zeros(kc.shape[:-1] + (4 - tail,), kc.dtype)
            krc0 = pack_codes(jnp.concatenate([kc[..., n4:], pad], -1))  # (H, M, 1)
            vrc0 = pack_codes(jnp.concatenate([vc[..., n4:], pad], -1))
            st["key_residual_codes"] = st["key_residual_codes"].at[
                li, seq_id, :, :, :1
            ].set(krc0)
            st["value_residual_codes"] = st["value_residual_codes"].at[
                li, seq_id, :, :, :1
            ].set(vrc0)
        if nv is not None:
            # dynamic ragged tail (bucketed admission): the up-to-3 real
            # tokens past the aligned prefix go to the exact residual
            # window. A full 4-row slice is written; rows past the real
            # tail are garbage masked by seq_r. start is 4-aligned and
            # <= n-4 whenever the tail is non-empty (clamped otherwise,
            # where r=0 masks everything).
            start = jnp.minimum((nv // 4) * 4, n - 4)
            kt4 = jax.lax.dynamic_slice_in_dim(k_st[0], start, 4, axis=1)
            vt4 = jax.lax.dynamic_slice_in_dim(v_st[0], start, 4, axis=1)
            st["key_residual"] = st["key_residual"].at[li, seq_id, :, :4].set(
                kt4.astype(st["key_residual"].dtype)
            )
            st["value_residual"] = st["value_residual"].at[li, seq_id, :, :4].set(
                vt4.astype(st["value_residual"].dtype)
            )
            w_idx = jnp.minimum(nv // 4, n // 4 - 1)
            krc0 = jax.lax.dynamic_slice_in_dim(pack_codes(kc), w_idx, 1, -1)
            vrc0 = jax.lax.dynamic_slice_in_dim(pack_codes(vc), w_idx, 1, -1)
            st["key_residual_codes"] = st["key_residual_codes"].at[
                li, seq_id, :, :, :1
            ].set(krc0)
            st["value_residual_codes"] = st["value_residual_codes"].at[
                li, seq_id, :, :, :1
            ].set(vrc0)
        attn = causal_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(1, n, -1)
        x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
        h2 = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + _mlp(h2, lp).astype(x.dtype)
        return (x, st, li + 1), None

    (x, state, _), _ = jax.lax.scan(
        layer, (x, state, jnp.asarray(0, jnp.int32)), params["layers"]
    )
    # project ONLY the last real token: the full (1, n, V) f32 logit tensor
    # is 2.1 GB at a 4096-token prompt x 128K vocab — materializing it per
    # admission was a per-request HBM spike (the flat path's
    # last_logit_only rationale, models/llama.py prefill docstring)
    if nv is None:
        x_last = x[:, -1:]
    else:
        x_last = jax.lax.dynamic_slice_in_dim(x, nv - 1, 1, axis=1)
    logits = _logits(params, cfg, x_last)[:, 0]  # (1, V)

    n4_eff = n4 if nv is None else (nv // 4) * 4
    tail_eff = tail if nv is None else nv - (nv // 4) * 4
    new = dict(state)
    new["seq_n_codes"] = state["seq_n_codes"].at[seq_id].set(n4_eff)
    new["seq_r"] = state["seq_r"].at[seq_id].set(tail_eff)
    new["seq_active"] = state["seq_active"].at[seq_id].set(1)
    return logits, new
