"""Fused PQ decode-attention Pallas kernel — the TPU re-design of the
reference's flash_decoding_split_kernel pipeline (Kernel.cuh:11-166 +
Interface.cu:26-120).

Design (every choice below was measured on v5e; see git history for the
experiment ladder — the first-cut kernel ran at 57 GB/s effective, this one
at ~3x that):

* Codes are stored TRANSPOSED and WORD-PACKED: (bs, nh_k, M, N/4) int32,
  byte t of word w = token 4w+t of subspace m's code row. Mosaic's
  uint8->int32 vector cast is the single slowest op on the chip (measured:
  a block-wide u8 cast alone capped the whole kernel at 23 GB/s); loading
  i32 words and extracting bytes with shift/and runs at full VPU rate on a
  quarter of the lanes. Attention is permutation-invariant within a block,
  so processing tokens in byte-interleaved order (all b=0 tokens of a word
  tile, then b=1, ...) is free — only the position mask must account for it.

* Decode is ONE lane-gather per (word-tile, byte): the codebook lives as a
  (d, 128) f32 table whose row j*M+m is component j of subspace m (the
  "strided" subspace split — for d_m=2, M=d/2 the pair (m, m+M) is exactly
  a RoPE rotation pair). For C=256 each f32 lane packs bf16(code c) |
  bf16(code c+128) << 16; the gather uses (code & 127) and the unpack
  selects the 16-bit half by code >= 128. pltpu.repeat(byte, d_m) tiles the
  index rows to match the d-row table ([all m] * d_m — verified tile, not
  interleave, semantics).

* Block-level double-buffered software pipeline: each grid step DECODES its
  4096-token block into one VMEM scratch pair while the MXU consumes the
  PREVIOUS block's scratch (one (G,d)@(d,block) score matmul + block-level
  online softmax + one (G,block)@(block,d) PV matmul). The two phases have
  no data dependency, so Mosaic overlaps VPU and MXU; an epilogue grid step
  drains the last block. Per-128-token matmuls (the v1 design) spent ~95%
  of MXU time loading K-hat/V-hat tiles for an 8-row q — the big-block
  matmuls amortize that.

* Online softmax stats in f32; the kernel emits the normalized partial and
  its LSE. The exact-residual window and the final merge (reference
  Kernel.cuh:1038-1209, 1211-1270) run in plain XLA — at Lt=128 tokens they
  are microseconds — and the same (partial, lse) pair is the cross-chip
  combine for sequence-sharded decode (parallel/sharded_decode.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
GROUP_PAD = 8  # q-heads-per-kv padded to one sublane tile
WORD = 4  # uint8 codes per packed int32 word


# --------------------------------------------------------------------------
# packing helpers (host/XLA side)
# --------------------------------------------------------------------------

def pack_codes(codes_t: jax.Array) -> jax.Array:
    """Pack transposed uint8 codes (..., M, n) -> (..., M, n//4) int32 words.

    Word w's byte t (little-endian: bits 8t..8t+7) is token 4w+t. This is the
    arena/pool storage format the kernel reads.
    """
    n = codes_t.shape[-1]
    if n % WORD != 0:
        raise ValueError(f"token count {n} not a multiple of {WORD}")
    c = codes_t.astype(jnp.uint32).reshape(*codes_t.shape[:-1], n // WORD, WORD)
    w = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16) | (c[..., 3] << 24)
    return w.astype(jnp.int32)


def unpack_codes(words: jax.Array) -> jax.Array:
    """Inverse of pack_codes: (..., M, nw) int32 -> (..., M, 4*nw) uint8."""
    u = words.astype(jnp.uint32)
    bytes_ = jnp.stack(
        [(u >> (8 * t)) & 0xFF for t in range(WORD)], axis=-1
    )  # (..., M, nw, 4)
    return bytes_.reshape(*words.shape[:-1], words.shape[-1] * WORD).astype(jnp.uint8)


def pack_decode_table(cents: jax.Array) -> jax.Array:
    """Build the kernel's gather table from a codebook (M, C, d_m) f32.

    Returns (d = M*d_m, 128) f32 with row j*M+m = component j of subspace m
    (strided subspace layout):
      C <= 128: plain f32 centroid values (code indexes its lane directly).
      C in (128, 256]: lane c packs bf16(code c) | bf16(code c+128) << 16;
        the kernel gathers with (code & 127) and selects the half by
        (code >= 128).
    """
    M, C, d_m = cents.shape
    if C > 256:
        raise ValueError("kernel supports nbits <= 8 (C <= 256)")
    if C <= 128:
        cb = jnp.zeros((M, 128, d_m), jnp.float32).at[:, :C].set(
            cents.astype(jnp.float32)
        )
        return cb.transpose(2, 0, 1).reshape(d_m * M, 128)
    cb = jnp.zeros((M, 256, d_m), jnp.bfloat16).at[:, :C].set(
        cents.astype(jnp.bfloat16)
    )
    lo = jax.lax.bitcast_convert_type(cb[:, :128], jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(cb[:, 128:], jnp.uint16).astype(jnp.uint32)
    packed = (lo | (hi << 16)).transpose(2, 0, 1).reshape(d_m * M, 128)
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


# backwards-compatible alias used by build_tables
pack_centroid_tables = pack_decode_table


# --------------------------------------------------------------------------
# kernel body building blocks
# --------------------------------------------------------------------------

def _decode_words(tab, w, b, d_m, packed, interpret):
    """Decode one word-tile: words w (M, tw) i32, byte position b ->
    (d, tw) bf16 tile, row j*M+m = component j of subspace m, lane l =
    token 4*(word_base+l)+b."""
    byte = (w >> (8 * b)) & 255
    if interpret:
        idx = jnp.tile(byte, (d_m, 1))
    else:
        idx = pltpu.repeat(byte, d_m, axis=0)  # (d, tw), tile semantics
    if packed:
        hi = idx >= 128
        g = jnp.take_along_axis(tab, idx & 127, axis=1)
        u = pltpu.bitcast(g, jnp.uint32)
        half = jnp.where(hi, u >> 16, u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        return pltpu.bitcast(half, jnp.bfloat16)
    g = jnp.take_along_axis(tab, idx, axis=1)
    return g.astype(jnp.bfloat16)


def _slot_positions(block: int, tw: int):
    """Map scratch slot j in [0, block) to its token offset within the block.

    Slots are written word-tile-major then byte-major: slice (t*4+b) of
    width tw holds byte b of word-tile t, so slot j = (t*4+b)*tw + lane
    corresponds to token 4*(t*tw + lane) + b."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    span = 4 * tw
    t = j // span
    rem = j % span
    b = rem // tw
    lane = rem % tw
    return 4 * (t * tw + lane) + b  # (1, block)


def _make_consume(block, tw, qq, kh_s, vh_s, acc, m_s, l_s, n_codes):
    """One block's score + online-softmax + PV update from scratch buffers."""
    def consume(p_idx, bi):
        s = jax.lax.dot_general(
            qq, kh_s[p_idx], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, block)
        pos = bi * block + _slot_positions(block, tw)
        s = jnp.where(pos < n_codes, s, NEG_INF)
        m_prev = m_s[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_s[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh_s[p_idx], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, d)
        acc[:] = acc[:] * alpha + pv
        m_s[:, :1] = m_new
        l_s[:, :1] = l_new
    return consume


def _make_produce(block, tw, d_m, packed, interpret, kp, vp, kh_s, vh_s):
    """Decode one block of K/V words into the scratch pair p_idx."""
    n_tiles = block // (4 * tw)

    def produce(p_idx, kw, vw):
        for t in range(n_tiles):
            wsl = slice(t * tw, (t + 1) * tw)
            kws, vws = kw[:, wsl], vw[:, wsl]
            for b in range(4):
                osl = slice((t * 4 + b) * tw, (t * 4 + b + 1) * tw)
                kh_s[p_idx, :, osl] = _decode_words(kp, kws, b, d_m, packed, interpret)
                vh_s[p_idx, :, osl] = _decode_words(vp, vws, b, d_m, packed, interpret)
    return produce


def _finish(out_ref, lse_ref, acc, m_s, l_s):
    l = l_s[:, :1]
    safe_l = jnp.maximum(l, 1e-30)
    out_ref[0, 0] = acc[:] / safe_l
    lse = jnp.where(l > 0, m_s[:, :1] + jnp.log(safe_l), NEG_INF)
    lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _block_geometry(block: int, NW: int, interpret: bool):
    """Word-tile width for a block of `block` tokens over NW total words."""
    bw = block // WORD  # words per block
    tw = min(LANES, bw)
    if not interpret and tw != LANES:
        raise ValueError(
            f"compiled kernel needs blocks of >= {4 * LANES} tokens (got {block})"
        )
    return tw


# --------------------------------------------------------------------------
# flat-arena kernel
# --------------------------------------------------------------------------

def _pq_attn_kernel(
    nc_ref,  # (1, 1) int32 SMEM — valid quantized tokens
    q_ref,  # (1, 1, GROUP_PAD, d) bf16, pre-scaled
    kc_ref,  # (1, 1, M, block//4) int32 words
    vc_ref,
    kp_ref,  # (d, 128) f32 decode table
    vp_ref,
    out_ref,  # (1, 1, GROUP_PAD, d) f32
    lse_ref,  # (1, 1, GROUP_PAD, 128) f32, lane-broadcast
    acc_ref,
    m_ref,
    l_ref,
    kh_ref,  # (2, d, block) bf16 double-buffered decode scratch
    vh_ref,
    *,
    block: int,
    tw: int,
    d_m: int,
    packed: bool,
    interpret: bool,
):
    i = pl.program_id(2)
    nb = pl.num_programs(2) - 1  # last step is the pipeline epilogue
    n_codes = nc_ref[0, 0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qq = q_ref[0, 0]
    consume = _make_consume(block, tw, qq, kh_ref, vh_ref, acc_ref, m_ref, l_ref, n_codes)
    produce = _make_produce(block, tw, d_m, packed, interpret, kp_ref[:], vp_ref[:], kh_ref, vh_ref)

    c_live = jnp.logical_and(i > 0, (i - 1) * block < n_codes)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 0))
    def _():
        consume(0, i - 1)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 1))
    def _():
        consume(1, i - 1)

    p_live = jnp.logical_and(i < nb, i * block < n_codes)

    @pl.when(jnp.logical_and(p_live, i % 2 == 0))
    def _():
        produce(0, kc_ref[0, 0], vc_ref[0, 0])

    @pl.when(jnp.logical_and(p_live, i % 2 == 1))
    def _():
        produce(1, kc_ref[0, 0], vc_ref[0, 0])

    @pl.when(i == nb)
    def _():
        _finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)


@functools.partial(
    jax.jit,
    static_argnames=("block", "n_bucket", "interpret", "packed"),
)
def pq_codes_attention(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, PRE-SCALED by 1/sqrt(d)
    key_codes: jax.Array,  # (bs, nh_k, M, N_max//4) int32 packed words
    value_codes: jax.Array,
    kpack: jax.Array,  # (d, 128) f32 decode table (pack_decode_table)
    vpack: jax.Array,
    n_codes: jax.Array,  # () int32
    *,
    block: int = 4096,
    n_bucket: int | None = None,
    interpret: bool | None = None,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Partial attention over the quantized code arena.

    Returns (out (bs, nh_k, GROUP_PAD, d) f32 — normalized within the
    partial, and lse (bs, nh_k, GROUP_PAD) f32) for LSE-merging with the
    residual partial (and, in the sharded path, other chips' partials).

    `n_bucket` bounds how much of the arena is scanned (a static multiple of
    `block` in tokens covering the current sequence); callers re-jit per
    bucket — the analogue of the reference's Ns-by-length kernel selection
    (pq_utils.py:8-22) done by XLA specialization instead of 240 prebuilt
    binaries.
    """
    bs, nh_k, G, d = q.shape
    M, NW = key_codes.shape[2], key_codes.shape[3]
    N_max = NW * WORD
    d_m = d // M
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if n_bucket is None:
        n_bucket = N_max
    n_bucket = min(n_bucket, N_max)
    block = min(block, n_bucket)
    if block % WORD != 0 or n_bucket % block != 0:
        raise ValueError(f"bucket {n_bucket} / block {block} geometry invalid")
    tw = _block_geometry(block, NW, interpret)
    nb = n_bucket // block

    nc = n_codes.astype(jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _pq_attn_kernel, block=block, tw=tw, d_m=d_m, packed=packed,
        interpret=interpret,
    )
    bw = block // WORD
    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, nh_k, nb + 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, M, bw),
                lambda b, h, i, nb=nb: (b, h, 0, jnp.minimum(i, nb - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, M, bw),
                lambda b, h, i, nb=nb: (b, h, 0, jnp.minimum(i, nb - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, LANES), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, d), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((2, d, block), jnp.bfloat16),
            pltpu.VMEM((2, d, block), jnp.bfloat16),
        ],
        interpret=interpret,
    )(nc, q, key_codes, value_codes, kpack, vpack)
    return out, lse[..., 0]


# --------------------------------------------------------------------------
# stacked-arena kernel (layer selected by scalar prefetch)
# --------------------------------------------------------------------------

def _pq_attn_kernel_stacked(
    li_ref,  # (1,) int32 — layer index (consumed by the index maps)
    nc_ref,  # (1,) int32 — valid quantized tokens
    q_ref,  # (1, 1, GROUP_PAD, d)
    kc_ref,  # (1, 1, 1, M, block//4) int32 from (L, bs, nh_k, M, NW)
    vc_ref,
    kp_ref,  # (1, d, 128) f32 from (L, d, 128)
    vp_ref,
    out_ref,
    lse_ref,
    acc_ref,
    m_ref,
    l_ref,
    kh_ref,
    vh_ref,
    *,
    block: int,
    tw: int,
    d_m: int,
    packed: bool,
    interpret: bool,
):
    i = pl.program_id(2)
    nb = pl.num_programs(2) - 1
    n_codes = nc_ref[0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qq = q_ref[0, 0]
    consume = _make_consume(block, tw, qq, kh_ref, vh_ref, acc_ref, m_ref, l_ref, n_codes)
    produce = _make_produce(block, tw, d_m, packed, interpret, kp_ref[0], vp_ref[0], kh_ref, vh_ref)

    c_live = jnp.logical_and(i > 0, (i - 1) * block < n_codes)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 0))
    def _():
        consume(0, i - 1)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 1))
    def _():
        consume(1, i - 1)

    p_live = jnp.logical_and(i < nb, i * block < n_codes)

    @pl.when(jnp.logical_and(p_live, i % 2 == 0))
    def _():
        produce(0, kc_ref[0, 0, 0], vc_ref[0, 0, 0])

    @pl.when(jnp.logical_and(p_live, i % 2 == 1))
    def _():
        produce(1, kc_ref[0, 0, 0], vc_ref[0, 0, 0])

    @pl.when(i == nb)
    def _():
        _finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)


@functools.partial(
    jax.jit, static_argnames=("block", "n_bucket", "interpret", "packed")
)
def pq_codes_attention_stacked(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_codes: jax.Array,  # (L, bs, nh_k, M, NW) int32 — FULL stacked arena
    value_codes: jax.Array,
    kpack: jax.Array,  # (L, d, 128) f32 — stacked decode tables
    vpack: jax.Array,
    layer: jax.Array,  # () int32
    n_codes: jax.Array,  # () int32
    *,
    block: int = 4096,
    n_bucket: int | None = None,
    interpret: bool | None = None,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """pq_codes_attention over one layer of a STACKED cache, the layer chosen
    by a scalar-prefetched index. This exists because slicing the layer out
    of the stacked arena in XLA would materialize a copy of the whole layer
    per decode step; here the kernel's BlockSpec index maps read blocks of
    layer `layer` straight from HBM. Used by the carry-threaded model scan
    (models/llama.py)."""
    bs, nh_k, G, d = q.shape
    L, _, _, M, NW = key_codes.shape
    N_max = NW * WORD
    d_m = d // M
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if n_bucket is None:
        n_bucket = N_max
    n_bucket = min(n_bucket, N_max)
    block = min(block, n_bucket)
    if block % WORD != 0 or n_bucket % block != 0:
        raise ValueError(f"bucket {n_bucket} / block {block} geometry invalid")
    tw = _block_geometry(block, NW, interpret)
    nb = n_bucket // block
    bw = block // WORD

    kernel = functools.partial(
        _pq_attn_kernel_stacked, block=block, tw=tw, d_m=d_m, packed=packed,
        interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs, nh_k, nb + 1),
        in_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, li, nc: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1, M, bw),
                lambda b, h, i, li, nc, nb=nb: (li[0], b, h, 0, jnp.minimum(i, nb - 1)),
            ),
            pl.BlockSpec(
                (1, 1, 1, M, bw),
                lambda b, h, i, li, nc, nb=nb: (li[0], b, h, 0, jnp.minimum(i, nb - 1)),
            ),
            pl.BlockSpec(
                (1,) + kpack.shape[1:], lambda b, h, i, li, nc: (li[0], 0, 0)
            ),
            pl.BlockSpec(
                (1,) + vpack.shape[1:], lambda b, h, i, li, nc: (li[0], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, li, nc: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, G, LANES), lambda b, h, i, li, nc: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((2, d, block), jnp.bfloat16),
            pltpu.VMEM((2, d, block), jnp.bfloat16),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, d), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        n_codes.reshape(1).astype(jnp.int32),
        q, key_codes, value_codes, kpack, vpack,
    )
    return out, lse[..., 0]


# --------------------------------------------------------------------------
# paged kernels (page table via scalar prefetch)
# --------------------------------------------------------------------------

def _pq_paged_attn_kernel(
    pt_ref,  # (bs, P_max) int32 page table
    nc_ref,  # (bs,) int32 per-sequence valid code counts
    q_ref,  # (1, 1, GROUP_PAD, d)
    kc_ref,  # (1, 1, M, ps_w) int32 — the page selected by the index map
    vc_ref,
    kp_ref,  # (d, 128) f32
    vp_ref,
    out_ref,
    lse_ref,
    acc_ref,
    m_ref,
    l_ref,
    kh_ref,
    vh_ref,
    *,
    page_size: int,
    tw: int,
    d_m: int,
    packed: bool,
    interpret: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    nb = pl.num_programs(2) - 1
    n_codes = nc_ref[b]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qq = q_ref[0, 0]
    consume = _make_consume(page_size, tw, qq, kh_ref, vh_ref, acc_ref, m_ref, l_ref, n_codes)
    produce = _make_produce(page_size, tw, d_m, packed, interpret, kp_ref[:], vp_ref[:], kh_ref, vh_ref)

    c_live = jnp.logical_and(i > 0, (i - 1) * page_size < n_codes)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 0))
    def _():
        consume(0, i - 1)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 1))
    def _():
        consume(1, i - 1)

    p_live = jnp.logical_and(i < nb, i * page_size < n_codes)

    @pl.when(jnp.logical_and(p_live, i % 2 == 0))
    def _():
        produce(0, kc_ref[0, 0], vc_ref[0, 0])

    @pl.when(jnp.logical_and(p_live, i % 2 == 1))
    def _():
        produce(1, kc_ref[0, 0], vc_ref[0, 0])

    @pl.when(i == nb)
    def _():
        _finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def pq_paged_attention(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_pool: jax.Array,  # (n_pages, nh_k, M, page_size//4) int32 — ONE layer
    value_pool: jax.Array,
    kpack: jax.Array,  # (d, 128) f32
    vpack: jax.Array,
    page_table: jax.Array,  # (bs, P_max) int32, -1 = unallocated
    n_codes: jax.Array,  # (bs,) int32 per-sequence
    *,
    interpret: bool | None = None,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fused decode attention over a PAGED code pool: the grid walks each
    sequence's page table (scalar-prefetched, so the page id feeds the
    BlockSpec index map — pages stream straight from HBM in table order, the
    TPU equivalent of the reference's paged kernel goal that its CUDA
    variant never stabilized, paged_pq_utils.py:399-681). Same block-level
    double-buffered pipeline as the flat kernel, one page per block."""
    bs, nh_k, G, d = q.shape
    n_pages, _, M, ps_w = key_pool.shape
    page_size = ps_w * WORD
    P_max = page_table.shape[1]
    d_m = d // M
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tw = _block_geometry(page_size, ps_w, interpret)

    kernel = functools.partial(
        _pq_paged_attn_kernel, page_size=page_size, tw=tw, d_m=d_m,
        packed=packed, interpret=interpret,
    )
    pt = jnp.maximum(page_table, 0).astype(jnp.int32)  # clamp -1; masked by n_codes

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs, nh_k, P_max + 1),
        in_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, pt, nc: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, M, ps_w),
                lambda b, h, i, pt, nc, P=P_max: (pt[b, jnp.minimum(i, P - 1)], h, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, M, ps_w),
                lambda b, h, i, pt, nc, P=P_max: (pt[b, jnp.minimum(i, P - 1)], h, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, pt, nc: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, G, LANES), lambda b, h, i, pt, nc: (b, h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((2, d, page_size), jnp.bfloat16),
            pltpu.VMEM((2, d, page_size), jnp.bfloat16),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, d), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(pt, n_codes.astype(jnp.int32), q, key_pool, value_pool, kpack, vpack)
    return out, lse[..., 0]


def _pq_paged_attn_kernel_stacked(
    li_ref,  # (1,) layer index (consumed by the index maps)
    pt_ref,  # (bs, P_max) page table
    nc_ref,  # (bs,) per-sequence valid codes
    q_ref,
    kc_ref,  # (1, 1, 1, M, ps_w) int32
    vc_ref,
    kp_ref,  # (1, d, 128) f32
    vp_ref,
    out_ref,
    lse_ref,
    acc_ref,
    m_ref,
    l_ref,
    kh_ref,
    vh_ref,
    *,
    page_size: int,
    tw: int,
    d_m: int,
    packed: bool,
    interpret: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    nb = pl.num_programs(2) - 1
    n_codes = nc_ref[b]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qq = q_ref[0, 0]
    consume = _make_consume(page_size, tw, qq, kh_ref, vh_ref, acc_ref, m_ref, l_ref, n_codes)
    produce = _make_produce(page_size, tw, d_m, packed, interpret, kp_ref[0], vp_ref[0], kh_ref, vh_ref)

    c_live = jnp.logical_and(i > 0, (i - 1) * page_size < n_codes)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 0))
    def _():
        consume(0, i - 1)

    @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 1))
    def _():
        consume(1, i - 1)

    p_live = jnp.logical_and(i < nb, i * page_size < n_codes)

    @pl.when(jnp.logical_and(p_live, i % 2 == 0))
    def _():
        produce(0, kc_ref[0, 0, 0], vc_ref[0, 0, 0])

    @pl.when(jnp.logical_and(p_live, i % 2 == 1))
    def _():
        produce(1, kc_ref[0, 0, 0], vc_ref[0, 0, 0])

    @pl.when(i == nb)
    def _():
        _finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def pq_paged_attention_stacked(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_pool: jax.Array,  # (L, n_pages+1, nh_k, M, ps_w) int32 — FULL stack
    value_pool: jax.Array,
    kpack: jax.Array,  # (L, d, 128) f32
    vpack: jax.Array,
    layer: jax.Array,  # () int32
    page_table: jax.Array,  # (bs, P_max) int32, -1 = unallocated
    n_codes: jax.Array,  # (bs,) int32 per-sequence
    *,
    interpret: bool | None = None,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """pq_paged_attention over one layer of the stacked page pools, the layer
    selected via scalar prefetch (same rationale as
    pq_codes_attention_stacked: no layer-slice copies in the decode loop)."""
    bs, nh_k, G, d = q.shape
    L, n_pages_p1, _, M, ps_w = key_pool.shape
    page_size = ps_w * WORD
    P_max = page_table.shape[1]
    d_m = d // M
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tw = _block_geometry(page_size, ps_w, interpret)

    kernel = functools.partial(
        _pq_paged_attn_kernel_stacked, page_size=page_size, tw=tw, d_m=d_m,
        packed=packed, interpret=interpret,
    )
    pt = jnp.maximum(page_table, 0).astype(jnp.int32)

    def codes_map(b, h, i, li, pt, nc, P=P_max):
        return (li[0], pt[b, jnp.minimum(i, P - 1)], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bs, nh_k, P_max + 1),
        in_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, li, pt, nc: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, M, ps_w), codes_map),
            pl.BlockSpec((1, 1, 1, M, ps_w), codes_map),
            pl.BlockSpec(
                (1,) + kpack.shape[1:], lambda b, h, i, li, pt, nc: (li[0], 0, 0)
            ),
            pl.BlockSpec(
                (1,) + vpack.shape[1:], lambda b, h, i, li, pt, nc: (li[0], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, li, pt, nc: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, G, LANES), lambda b, h, i, li, pt, nc: (b, h, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((2, d, page_size), jnp.bfloat16),
            pltpu.VMEM((2, d, page_size), jnp.bfloat16),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, d), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        pt,
        n_codes.astype(jnp.int32),
        q, key_pool, value_pool, kpack, vpack,
    )
    return out, lse[..., 0]
