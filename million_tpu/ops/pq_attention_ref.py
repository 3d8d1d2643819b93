"""Reference (pure-jnp) PQ decode attention — the oracle for the Pallas kernel.

Reproduces the math of the reference CUDA pipeline (Interface.cu:26-120):

  1. LUT: ad_lut[b,h,m,c] = <q_m, key_cents[m,c]>          (Interface.cu:48-51)
  2. split kernel: scores over quantized codes via LUT gather, online softmax,
     PV accumulation decoding V centroids on the fly        (Kernel.cuh:11-166)
  3. residual kernel: exact attention over the <= Lt most recent unquantized
     tokens                                                  (Kernel.cuh:1038-1209)
  4. reduce kernel: log-sum-exp merge of partials            (Kernel.cuh:1211-1270)

Here steps 2-4 are expressed as masked dense jnp ops (no splits needed — the
oracle runs tiny shapes), with softmax statistics in f32. `merge_partials` is
the associative LSE combine reused verbatim by the sharded multi-chip decode
path (SURVEY.md §2.3: this combine is the seam along which the KV sequence
shards across chips).

GQA is handled as in the reference (Kernel.cuh:52): query head h reads KV
head h // (nh // nh_k).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from million_tpu.pq.ops import build_lut, lut_scores, pq_decode

NEG_INF = -1e30


def merge_partials(
    outs: jax.Array, lses: jax.Array, axis: int = 0
) -> Tuple[jax.Array, jax.Array]:
    """LSE-merge partial attention results along `axis`.

    outs  (..., S, ..., d): un-normalized-softmax outputs per split, already
          normalized within their split (i.e. out_s = softmax_s(scores) @ V_s).
    lses  (..., S, ...): log-sum-exp of each split's scores.
    Returns (merged out without the S axis, merged lse).

    This is the reference reduce kernel's math (Kernel.cuh:1250-1269) and the
    cross-chip combine for sequence-sharded decode.
    """
    lse_max = jnp.max(lses, axis=axis, keepdims=True)
    w = jnp.exp(lses - lse_max)  # (..., S, ...)
    denom = jnp.sum(w, axis=axis)
    w_b = jnp.expand_dims(w, -1)
    merged = jnp.sum(outs * w_b, axis=axis) / jnp.expand_dims(denom, -1)
    lse = jnp.squeeze(lse_max, axis) + jnp.log(denom)
    return merged, lse


def merge_two_partials(out_a, lse_a, out_b, lse_b):
    """LSE-merge exactly two partials without a stack axis.

    Same math as merge_partials; the stacked form makes XLA materialize
    (2, ...) temporaries with layout copies on TPU decode shapes (~0.3
    ms/step at 3B/32K), while this expands to pure elementwise fusion."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    denom = wa + wb
    merged = (out_a * wa[..., None] + out_b * wb[..., None]) / denom[..., None]
    return merged, m + jnp.log(denom)


def _gqa_expand(x: jax.Array, nh: int) -> jax.Array:
    """(bs, nh_k, ...) -> (bs, nh, ...) by repeating each KV head nh/nh_k times."""
    bs, nh_k = x.shape[:2]
    rep = nh // nh_k
    return jnp.repeat(x, rep, axis=1) if rep > 1 else x


def pq_decode_attention_ref(
    q: jax.Array,  # (bs, nh, d)
    key_codes: jax.Array,  # (bs, nh_k, M, N) uint8, transposed arena layout
    value_codes: jax.Array,  # (bs, nh_k, M, N) uint8
    key_cents: jax.Array,  # (M, C, d_m)
    value_cents: jax.Array,  # (M, C, d_m)
    key_residual: jax.Array,  # (bs, nh_k, Lt, d)
    value_residual: jax.Array,  # (bs, nh_k, Lt, d)
    n_codes: jax.Array,  # scalar int: valid quantized tokens
    r: jax.Array,  # scalar int: valid residual tokens
    scale: float | None = None,
    layout: str = "strided",
    k_outliers: jax.Array | None = None,  # (bs, nh_k, 4, OK, NW) bf16
    # byte-plane exact outlier channels + their channel indices — the jnp
    # oracle of the kernel's outlier-correction mode
    k_oidx: jax.Array | None = None,  # (OK,)
    v_outliers: jax.Array | None = None,
    v_oidx: jax.Array | None = None,
) -> jax.Array:
    """Fused PQ decode attention, single query token. Returns (bs, nh, d).

    out = softmax([s_q ; s_r] * scale) @ [V_q ; V_r] where s_q are LUT scores
    over quantized codes and s_r exact scores over the residual window; the
    two halves are computed as separate partials and LSE-merged, exactly like
    the reference's split + residual + reduce kernel trio.
    """
    bs, nh, d = q.shape
    nh_k, N = key_codes.shape[1], key_codes.shape[3]
    key_codes = jnp.swapaxes(key_codes, -1, -2)  # -> (bs, nh_k, N, M)
    value_codes = jnp.swapaxes(value_codes, -1, -2)
    if scale is None:
        scale = 1.0 / (d**0.5)

    qf = q.astype(jnp.float32)
    pos = jnp.arange(N)
    code_mask = pos < n_codes  # (N,)

    def from_byte_plane(x):  # (bs, nh_k, 4, O, NW) -> (bs, nh_k, N, O)
        y = jnp.moveaxis(x, -3, -1)  # (bs, nh_k, O, NW, 4)
        lin = y.reshape(*y.shape[:-2], -1)  # (bs, nh_k, O, N), n = 4w+b
        return jnp.moveaxis(lin.astype(jnp.float32), -2, -1)

    # --- quantized partial -------------------------------------------------
    lut = build_lut(qf, key_cents, layout)  # (bs, nh, M, C)
    # group query heads onto KV heads for the codes
    kc = _gqa_expand(key_codes, nh)  # (bs, nh, N, M)
    s_q = lut_scores(lut, kc) * scale  # (bs, nh, N) f32
    if k_outliers is not None:
        # exact-score correction: q[k_oidx] . K_exact (outlier channels
        # decode to 0, so this ADD restores the full inner product)
        ko = _gqa_expand(from_byte_plane(k_outliers), nh)  # (bs, nh, N, OK)
        s_q = s_q + jnp.einsum(
            "bho,bhno->bhn", qf[..., k_oidx], ko
        ) * scale
    s_q = jnp.where(code_mask[None, None, :], s_q, NEG_INF)
    m_q = jnp.max(s_q, axis=-1, keepdims=True)
    # guard fully-masked case (n_codes == 0)
    m_q_safe = jnp.maximum(m_q, NEG_INF / 2)
    p_q = jnp.exp(s_q - m_q_safe)
    p_q = jnp.where(code_mask[None, None, :], p_q, 0.0)
    denom_q = jnp.sum(p_q, axis=-1, keepdims=True)
    v_hat = pq_decode(value_codes, value_cents, layout).astype(jnp.float32)  # (bs,nh_k,N,d)
    if v_outliers is not None:
        vo = from_byte_plane(v_outliers)  # (bs, nh_k, N, OV)
        v_hat = v_hat.at[..., v_oidx].set(vo)
    v_hat = _gqa_expand(v_hat, nh)
    out_q = jnp.einsum("bhn,bhnk->bhk", p_q, v_hat) / jnp.maximum(denom_q, 1e-30)
    lse_q = jnp.where(
        denom_q[..., 0] > 0, m_q_safe[..., 0] + jnp.log(jnp.maximum(denom_q[..., 0], 1e-30)), NEG_INF
    )

    # --- residual partial (exact) -----------------------------------------
    Lt = key_residual.shape[2]
    rpos = jnp.arange(Lt)
    r_mask = rpos < r
    kr = _gqa_expand(key_residual.astype(jnp.float32), nh)  # (bs, nh, Lt, d)
    vr = _gqa_expand(value_residual.astype(jnp.float32), nh)
    s_r = jnp.einsum("bhk,bhnk->bhn", qf, kr) * scale
    s_r = jnp.where(r_mask[None, None, :], s_r, NEG_INF)
    m_r = jnp.maximum(jnp.max(s_r, axis=-1, keepdims=True), NEG_INF / 2)
    p_r = jnp.exp(s_r - m_r)
    p_r = jnp.where(r_mask[None, None, :], p_r, 0.0)
    denom_r = jnp.sum(p_r, axis=-1, keepdims=True)
    out_r = jnp.einsum("bhn,bhnk->bhk", p_r, vr) / jnp.maximum(denom_r, 1e-30)
    lse_r = jnp.where(
        denom_r[..., 0] > 0, m_r[..., 0] + jnp.log(jnp.maximum(denom_r[..., 0], 1e-30)), NEG_INF
    )

    # --- reduce ------------------------------------------------------------
    outs = jnp.stack([out_q, out_r], axis=0)  # (2, bs, nh, d)
    lses = jnp.stack([lse_q, lse_r], axis=0)  # (2, bs, nh)
    merged, _ = merge_partials(outs, lses, axis=0)
    return merged.astype(q.dtype)


def dense_decode_attention(
    q: jax.Array,  # (bs, nh, d)
    k: jax.Array,  # (bs, nh_k, n, d)
    v: jax.Array,  # (bs, nh_k, n, d)
    scale: float | None = None,
) -> jax.Array:
    """Plain exact decode attention over a dense KV — the fp16-KV baseline
    and the end-to-end oracle (decode codes -> this) used by the reference's
    self-check (pq_utils.py:330-381)."""
    bs, nh, d = q.shape
    if scale is None:
        scale = 1.0 / (d**0.5)
    k = _gqa_expand(k, nh).astype(jnp.float32)
    v = _gqa_expand(v, nh).astype(jnp.float32)
    s = jnp.einsum("bhk,bhnk->bhn", q.astype(jnp.float32), k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhn,bhnk->bhk", p, v).astype(q.dtype)


def causal_attention(
    q: jax.Array,  # (bs, nh, n, d)
    k: jax.Array,  # (bs, nh_k, n, d)
    v: jax.Array,  # (bs, nh_k, n, d)
    scale: float | None = None,
) -> jax.Array:
    """Causal SDPA for prefill (reference prefill path, pq_utils.py:249-260).

    Long sequences on TPU go through the stock Pallas flash-attention op —
    the dense jnp form materializes the (nh, n, n) f32 score matrix, which
    at 32K context is ~100 GB and cannot compile (the reference leans on
    torch SDPA's fused kernels for the same reason, pq_utils.py:249-260).
    Short sequences and CPU (interpret/test) runs keep the exact jnp path.
    """
    bs, nh, n, d = q.shape
    if scale is None:
        scale = 1.0 / (d**0.5)
    if n >= 1024 and jax.default_backend() == "tpu":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        kf = _gqa_expand(k, nh).astype(q.dtype)
        vf = _gqa_expand(v, nh).astype(q.dtype)
        # Default BlockSizes are 128x128 — measured 3.4 TFLOP/s at 32K on
        # v5e; 512/1024 blocks reach 108 TFLOP/s (55% MXU), 32x faster.
        blk_q, blk_k = 512, 1024
        n_pad = (-n) % blk_k
        if n_pad:
            pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
            qp, kp, vp = (jnp.pad(x, pad) for x in (q, kf, vf))
        else:
            qp, kp, vp = q, kf, vf
        # padded tail keys sit AFTER every real query, so causality masks
        # them out of real rows; padded query rows are sliced away.
        # Backward blocks make the op differentiable — the quality-anchor
        # LM (benchmarks/tiny_lm.py) trains at ctx >= 1024 through this
        # path; without them jax.grad raises "not all backward blocks are
        # specified".
        blk_bwd = min(blk_k, 512)
        out = flash_attention(
            qp, kp, vp, causal=True, sm_scale=scale,
            block_sizes=BlockSizes(
                block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
                block_q_major_dkv=blk_bwd, block_k_major_dkv=blk_bwd,
                block_k_dkv=blk_bwd, block_q_dkv=blk_bwd,
                block_k_major_dq=blk_bwd, block_k_dq=blk_bwd,
                block_q_dq=blk_bwd,
            ),
        )
        return out[:, :, :n].astype(q.dtype)
    k = _gqa_expand(k, nh).astype(jnp.float32)
    v = _gqa_expand(v, nh).astype(jnp.float32)
    s = jnp.einsum("bhqk,bhnk->bhqn", q.astype(jnp.float32), k) * scale
    mask = jnp.tril(jnp.ones((n, n), bool))
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqn,bhnk->bhqk", p, v).astype(q.dtype)


def masked_partial_attention(
    q: jax.Array,  # (..., G_or_nh, d) single query per head
    k: jax.Array,  # (..., n, d)
    v: jax.Array,  # (..., n, d)
    valid: jax.Array,  # scalar int or (n,) bool mask
    scale: float,
) -> Tuple[jax.Array, jax.Array]:
    """Exact partial attention with a validity mask; returns (out, lse).

    Used for the residual window next to the Pallas code kernel (the
    reference residual kernel's job, Kernel.cuh:1038-1209) and reusable for
    any LSE-mergeable partial. q heads and k heads must already align.
    """
    n = k.shape[-2]
    if valid.ndim == 0:
        mask = jnp.arange(n) < valid
    else:
        mask = valid
    s = jnp.einsum("...gk,...nk->...gn", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG_INF / 2)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("...gn,...nk->...gk", p, v.astype(jnp.float32)) / jnp.maximum(
        l, 1e-30
    )
    lse = jnp.where(l[..., 0] > 0, m[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-30)), NEG_INF)
    return out, lse
