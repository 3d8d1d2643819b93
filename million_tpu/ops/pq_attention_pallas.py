"""Fused PQ decode-attention Pallas kernel — the TPU re-design of the
reference's flash_decoding_split_kernel pipeline (Kernel.cuh:11-166 +
Interface.cu:26-120).

Design (chosen from measured v5e behavior, not a CUDA translation):

* Codes are stored TRANSPOSED, (bs, nh_k, M, N): subspace-major, token-minor.
  Mosaic's `tpu.dynamic_gather` supports per-row lane lookup
  (out[i,j] = tab[i, idx[i,j]]) only for f32 tables of exactly 128 lanes
  with idx.shape == tab.shape, so a (M, 128) tile of transposed codes is
  exactly one gather op per subspace-block: rows are subspaces (each row
  indexes its own codebook), lanes are 128 consecutive tokens. The
  reference's paged-V experiments (paged_pq_utils.py, Kernel.cuh:169-375)
  reached the same transposed layout for column-access reasons on GPU.

* C=256 codebooks don't fit 128 lanes, so each table lane packs TWO bf16
  centroid values (code c and code c+128) into one f32; the kernel gathers
  with (code & 127) and selects the 16-bit half by (code >= 128). One gather
  + cheap bit-ops per value instead of two gathers.

* Unlike the reference (which gathers a per-query LUT for scores and decodes
  V on the fly in scalar CUDA loops), BOTH phases here decode to bf16 tiles
  and hit the MXU: scores = q_group @ khat (serving all GQA query heads of a
  KV head in one matmul — the LUT trick is pointless when the MXU gives the
  q.khat contraction for free), and PV = p @ vhat^T.

* Subspaces use the STRIDED dim split (subspace m owns dims {m, m+M}), so
  decoded per-component rows stack into khat (d, 128) without interleaving —
  and for d_m=2, M=d/2 the pair (m, m+M) is exactly a RoPE rotation pair,
  which couples the correlated dims inside one codebook.

* Online softmax (f32 stats) across sequence blocks; the kernel emits the
  normalized partial and its LSE. The exact-residual window and the final
  merge (reference Kernel.cuh:1038-1209, 1211-1270) run in plain XLA — at
  Lt=128 tokens they are microseconds — and the same (partial, lse) pair is
  the cross-chip combine for sequence-sharded decode.
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


def pack_centroid_tables(cents: jax.Array) -> jax.Array:
    """Build the kernel's gather tables from a codebook.

    C <= 128 (nbits <= 7, the fast path): (M, C, d_m) f32 ->
        (d_m, M, 128) f32 of plain centroid values; a code indexes its lane
        directly — one gather per component, no unpacking.
    C in (128, 256] (nbits == 8, the quality path): each f32 lane packs the
        bf16 centroid component for code c (low 16 bits) and code c+128
        (high 16 bits); the kernel gathers with (code & 127) and selects the
        half by (code >= 128). Measured on v5e, this lo/hi handling costs
        ~1.5x the C<=128 path — the price of the reference's full 8-bit
        codebooks (setup.py C in {128, 256} mirrors the same trade).
    """
    M, C, d_m = cents.shape
    if C > 256:
        raise ValueError("kernel supports nbits <= 8 (C <= 256)")
    if C <= 128:
        cb = jnp.zeros((M, 128, d_m), jnp.float32).at[:, :C].set(
            cents.astype(jnp.float32)
        )
        return cb.transpose(2, 0, 1)  # (d_m, M, 128)
    cb = jnp.zeros((M, 256, d_m), jnp.bfloat16).at[:, :C].set(
        cents.astype(jnp.bfloat16)
    )
    lo = jax.lax.bitcast_convert_type(cb[:, :128], jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(cb[:, 128:], jnp.uint16).astype(jnp.uint32)
    packed = lo | (hi << 16)  # (M, 128, d_m) u32
    return jax.lax.bitcast_convert_type(
        packed.transpose(2, 0, 1), jnp.float32
    )  # (d_m, M, 128)


def _decode_tile(pack_ref, lo, is_hi, d_m, packed):
    """Gather(+unpack) one 128-token tile from block-level hoisted index
    tensors (lo = code & 127 or the full code, is_hi = code >= 128 or None).
    Returns (d, 128) bf16 tile whose row j*M+m is component j of subspace m
    — the strided dim layout."""
    rows = []
    if packed:
        for j in range(d_m):
            g = jnp.take_along_axis(pack_ref[j], lo, axis=1)  # (M,128) f32 packed
            u = pltpu.bitcast(g, jnp.uint32)
            half = jnp.where(is_hi, u >> 16, u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
            rows.append(pltpu.bitcast(half, jnp.bfloat16))
    else:
        for j in range(d_m):
            g = jnp.take_along_axis(pack_ref[j], lo, axis=1)  # (M,128) f32
            rows.append(g.astype(jnp.bfloat16))
    return jnp.concatenate(rows, axis=0)  # (d_m*M, 128)


def _hoist_codes(codes_u8, packed):
    """Block-level u8 -> i32 conversion + lo/hi split (one pass over the
    whole block instead of per 128-token chunk — measured ~30% kernel win
    on v5e from fewer unpack/mask op issues)."""
    ci = codes_u8.astype(jnp.int32)
    if packed:
        return jnp.bitwise_and(ci, 127), ci >= 128
    return ci, None


def _pq_attn_kernel(
    # inputs
    q_ref,  # (1, 1, GROUP_PAD, d) bf16, pre-scaled
    kc_ref,  # (1, 1, M, BLOCK) uint8
    vc_ref,  # (1, 1, M, BLOCK) uint8
    kpack_ref,  # (d_m, M, 128) f32
    vpack_ref,  # (d_m, M, 128) f32
    nc_ref,  # (1, 1) int32 in SMEM — valid quantized tokens
    # outputs
    out_ref,  # (1, 1, GROUP_PAD, d) f32
    lse_ref,  # (1, 1, GROUP_PAD, 128) f32, lane-broadcast
    # scratch
    acc_ref,  # (GROUP_PAD, d) f32
    m_ref,  # (GROUP_PAD, 128) f32
    l_ref,  # (GROUP_PAD, 128) f32
    *,
    block: int,
    d_m: int,
    packed: bool,
):
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[0, 0]

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Skip blocks entirely past the valid length (their DMA still happens;
    # bucketing at the wrapper keeps that waste bounded).
    @pl.when(i * block < n_codes)
    def _compute():
        q = q_ref[0, 0]  # (GROUP_PAD, d) bf16
        k_lo, k_hi = _hoist_codes(kc_ref[0, 0], packed)  # (M, block)
        v_lo, v_hi = _hoist_codes(vc_ref[0, 0], packed)
        for t in range(block // LANES):
            sl = slice(t * LANES, (t + 1) * LANES)
            base = i * block + t * LANES
            khat = _decode_tile(
                kpack_ref, k_lo[:, sl], None if k_hi is None else k_hi[:, sl],
                d_m, packed,
            )  # (d, 128) bf16
            s = jax.lax.dot_general(
                q,
                khat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (GROUP_PAD, 128) f32
            pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < n_codes, s, NEG_INF)

            m_prev = m_ref[:, :1]  # (G, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # (G, 1)
            p = jnp.exp(s - m_new)  # (G, 128)
            p = jnp.where(pos < n_codes, p, 0.0)
            l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

            vhat = _decode_tile(
                vpack_ref, v_lo[:, sl], None if v_hi is None else v_hi[:, sl],
                d_m, packed,
            )  # (d, 128) bf16
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                vhat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (GROUP_PAD, d)
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == nb - 1)
    def _finish():
        l = l_ref[:, :1]
        m = m_ref[:, :1]
        safe_l = jnp.maximum(l, 1e-30)
        out_ref[0, 0] = acc_ref[:] / safe_l
        lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)  # (G, 1)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=("block", "n_bucket", "interpret", "packed"),
)
def pq_codes_attention(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, PRE-SCALED by 1/sqrt(d)
    key_codes: jax.Array,  # (bs, nh_k, M, N_max) uint8, transposed layout
    value_codes: jax.Array,  # (bs, nh_k, M, N_max) uint8
    kpack: jax.Array,  # (d_m, M, 128) f32 packed tables
    vpack: jax.Array,  # (d_m, M, 128) f32
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
    residual partial (and, in the sharded path, with other chips' partials).

    `n_bucket` bounds how much of the arena is scanned (a static multiple of
    `block` covering the current sequence); callers re-jit per bucket, the
    analogue of the reference's Ns-by-length kernel selection
    (pq_utils.py:8-22) done by XLA specialization instead of 240 prebuilt
    binaries.
    """
    bs, nh_k, G, d = q.shape
    M, N_max = key_codes.shape[2], key_codes.shape[3]
    d_m = kpack.shape[0]
    if interpret is None:
        # run interpreted on CPU (tests, debugging), compiled on TPU
        interpret = jax.default_backend() == "cpu"
    if n_bucket is None:
        n_bucket = N_max
    n_bucket = min(n_bucket, N_max)
    block = min(block, n_bucket)
    if block % LANES != 0:
        raise ValueError(f"block {block} must be a multiple of {LANES}")
    if n_bucket % block != 0:
        raise ValueError(f"bucket {n_bucket} not a multiple of block {block}")
    nb = n_bucket // block

    nc = n_codes.astype(jnp.int32).reshape(1, 1)

    kernel = functools.partial(_pq_attn_kernel, block=block, d_m=d_m, packed=packed)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, nh_k, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, M, block), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, M, block), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, G, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, G, LANES), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, d), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, key_codes, value_codes, kpack, vpack, nc)
    return out, lse[..., 0]


def _pq_paged_attn_kernel(
    # scalar prefetch
    pt_ref,  # (bs, P_max) int32 page table
    nc_ref,  # (bs,) int32 per-sequence valid code counts
    # inputs
    q_ref,  # (1, 1, GROUP_PAD, d)
    kc_ref,  # (1, 1, M, page_size) uint8 — the page selected by the index map
    vc_ref,  # (1, 1, M, page_size) uint8
    kpack_ref,  # (d_m, M, 128) f32
    vpack_ref,
    # outputs
    out_ref,  # (1, 1, GROUP_PAD, d) f32
    lse_ref,  # (1, 1, GROUP_PAD, 128) f32
    # scratch
    acc_ref,
    m_ref,
    l_ref,
    *,
    page_size: int,
    d_m: int,
    packed: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[b]

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i * page_size < n_codes)
    def _compute():
        q = q_ref[0, 0]
        k_lo, k_hi = _hoist_codes(kc_ref[0, 0], packed)
        v_lo, v_hi = _hoist_codes(vc_ref[0, 0], packed)
        for t in range(page_size // LANES):
            sl = slice(t * LANES, (t + 1) * LANES)
            base = i * page_size + t * LANES
            khat = _decode_tile(
                kpack_ref, k_lo[:, sl], None if k_hi is None else k_hi[:, sl],
                d_m, packed,
            )
            s = jax.lax.dot_general(
                q, khat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < n_codes, s, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(pos < n_codes, p, 0.0)
            l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            vhat = _decode_tile(
                vpack_ref, v_lo[:, sl], None if v_hi is None else v_hi[:, sl],
                d_m, packed,
            )
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vhat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == nb - 1)
    def _finish():
        l = l_ref[:, :1]
        m = m_ref[:, :1]
        safe_l = jnp.maximum(l, 1e-30)
        out_ref[0, 0] = acc_ref[:] / safe_l
        lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def pq_paged_attention(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_pool: jax.Array,  # (n_pages, nh_k, M, page_size) uint8 — ONE layer's slab
    value_pool: jax.Array,
    kpack: jax.Array,  # (d_m, M, 128) f32
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
    variant never stabilized, paged_pq_utils.py:399-681)."""
    bs, nh_k, G, d = q.shape
    n_pages, _, M, page_size = key_pool.shape
    P_max = page_table.shape[1]
    d_m = kpack.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    kernel = functools.partial(
        _pq_paged_attn_kernel, page_size=page_size, d_m=d_m, packed=packed
    )
    pt = jnp.maximum(page_table, 0).astype(jnp.int32)  # clamp -1; masked by n_codes

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs, nh_k, P_max),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G, d), lambda b, h, i, pt, nc: (b, h, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, M, page_size), lambda b, h, i, pt, nc: (pt[b, i], h, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, M, page_size), lambda b, h, i, pt, nc: (pt[b, i], h, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, pt, nc: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, G, LANES), lambda b, h, i, pt, nc: (b, h, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
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


def _pq_attn_kernel_stacked(
    # scalar prefetch
    li_ref,  # (1,) int32 — layer index into the stacked arenas/tables
    nc_ref,  # (1,) int32 — valid quantized tokens
    # inputs (blocks selected by the index maps)
    q_ref,  # (1, 1, GROUP_PAD, d)
    kc_ref,  # (1, 1, 1, M, BLOCK) uint8 from (L, bs, nh_k, M, N)
    vc_ref,
    kpack_ref,  # (1, d_m, M, 128) f32 from (L, d_m, M, 128)
    vpack_ref,
    # outputs
    out_ref,  # (1, 1, GROUP_PAD, d) f32
    lse_ref,  # (1, 1, GROUP_PAD, 128) f32
    # scratch
    acc_ref,
    m_ref,
    l_ref,
    *,
    block: int,
    d_m: int,
    packed: bool,
):
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[0]

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i * block < n_codes)
    def _compute():
        q = q_ref[0, 0]
        k_lo, k_hi = _hoist_codes(kc_ref[0, 0, 0], packed)
        v_lo, v_hi = _hoist_codes(vc_ref[0, 0, 0], packed)
        for t in range(block // LANES):
            sl = slice(t * LANES, (t + 1) * LANES)
            base = i * block + t * LANES
            khat = _decode_tile(
                kpack_ref[0], k_lo[:, sl], None if k_hi is None else k_hi[:, sl],
                d_m, packed,
            )
            s = jax.lax.dot_general(
                q, khat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < n_codes, s, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(pos < n_codes, p, 0.0)
            l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            vhat = _decode_tile(
                vpack_ref[0], v_lo[:, sl], None if v_hi is None else v_hi[:, sl],
                d_m, packed,
            )
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vhat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == nb - 1)
    def _finish():
        l = l_ref[:, :1]
        m = m_ref[:, :1]
        safe_l = jnp.maximum(l, 1e-30)
        out_ref[0, 0] = acc_ref[:] / safe_l
        lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit, static_argnames=("block", "n_bucket", "interpret", "packed")
)
def pq_codes_attention_stacked(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_codes: jax.Array,  # (L, bs, nh_k, M, N) uint8 — FULL stacked arena
    value_codes: jax.Array,
    kpack: jax.Array,  # (L, d_m, M, 128) f32 — stacked tables
    vpack: jax.Array,
    layer: jax.Array,  # () int32
    n_codes: jax.Array,  # () int32
    *,
    block: int = 4096,
    n_bucket: int | None = None,
    interpret: bool | None = None,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """pq_codes_attention over one layer of a STACKED cache, with the layer
    chosen by a scalar-prefetched index. This exists because slicing the
    layer out of the stacked arena in XLA would materialize a copy of the
    whole layer per decode step; here the kernel's BlockSpec index maps read
    blocks of layer `layer` straight from HBM. Used by the carry-threaded
    model scan (models/llama.py)."""
    bs, nh_k, G, d = q.shape
    L, _, _, M, N_max = key_codes.shape
    d_m = kpack.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if n_bucket is None:
        n_bucket = N_max
    n_bucket = min(n_bucket, N_max)
    block = min(block, n_bucket)
    if block % LANES != 0:
        raise ValueError(f"block {block} must be a multiple of {LANES}")
    if n_bucket % block != 0:
        raise ValueError(f"bucket {n_bucket} not a multiple of block {block}")
    nb = n_bucket // block

    kernel = functools.partial(
        _pq_attn_kernel_stacked, block=block, d_m=d_m, packed=packed
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs, nh_k, nb),
        in_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, li, nc: (b, h, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1, M, block), lambda b, h, i, li, nc: (li[0], b, h, 0, i)
            ),
            pl.BlockSpec(
                (1, 1, 1, M, block), lambda b, h, i, li, nc: (li[0], b, h, 0, i)
            ),
            pl.BlockSpec(
                (1,) + kpack.shape[1:], lambda b, h, i, li, nc: (li[0], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1,) + vpack.shape[1:], lambda b, h, i, li, nc: (li[0], 0, 0, 0)
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


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def pq_paged_attention_stacked(
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_pool: jax.Array,  # (L, n_pages+1, nh_k, M, page_size) uint8 — FULL stack
    value_pool: jax.Array,
    kpack: jax.Array,  # (L, d_m, M, 128) f32
    vpack: jax.Array,
    layer: jax.Array,  # () int32
    page_table: jax.Array,  # (bs, P_max) int32, -1 = unallocated
    n_codes: jax.Array,  # (bs,) int32 per-sequence
    *,
    interpret: bool | None = None,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """pq_paged_attention over one layer of the stacked page pools, the
    layer selected via scalar prefetch (same rationale as
    pq_codes_attention_stacked: no layer-slice copies in the decode loop)."""
    bs, nh_k, G, d = q.shape
    L, n_pages_p1, _, M, page_size = key_pool.shape
    P_max = page_table.shape[1]
    d_m = kpack.shape[1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    kernel = functools.partial(
        _pq_paged_attn_kernel_stacked, page_size=page_size, d_m=d_m, packed=packed
    )
    pt = jnp.maximum(page_table, 0).astype(jnp.int32)

    def codes_map(b, h, i, li, pt, nc):
        return (li[0], pt[b, i], h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bs, nh_k, P_max),
        in_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i, li, pt, nc: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, M, page_size), codes_map),
            pl.BlockSpec((1, 1, 1, M, page_size), codes_map),
            pl.BlockSpec(
                (1,) + kpack.shape[1:], lambda b, h, i, li, pt, nc: (li[0], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1,) + vpack.shape[1:], lambda b, h, i, li, pt, nc: (li[0], 0, 0, 0)
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


def _pq_paged_attn_kernel_stacked(
    li_ref,  # (1,) layer index (consumed by the index maps)
    pt_ref,  # (bs, P_max) page table
    nc_ref,  # (bs,) per-sequence valid codes
    q_ref,  # (1, 1, GROUP_PAD, d)
    kc_ref,  # (1, 1, 1, M, page_size) uint8
    vc_ref,
    kpack_ref,  # (1, d_m, M, 128) f32
    vpack_ref,
    out_ref,
    lse_ref,
    acc_ref,
    m_ref,
    l_ref,
    *,
    page_size: int,
    d_m: int,
    packed: bool,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[b]

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i * page_size < n_codes)
    def _compute():
        q = q_ref[0, 0]
        k_lo, k_hi = _hoist_codes(kc_ref[0, 0, 0], packed)
        v_lo, v_hi = _hoist_codes(vc_ref[0, 0, 0], packed)
        for t in range(page_size // LANES):
            sl = slice(t * LANES, (t + 1) * LANES)
            base = i * page_size + t * LANES
            khat = _decode_tile(
                kpack_ref[0], k_lo[:, sl], None if k_hi is None else k_hi[:, sl],
                d_m, packed,
            )
            s = jax.lax.dot_general(
                q, khat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(pos < n_codes, s, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(pos < n_codes, p, 0.0)
            l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            vhat = _decode_tile(
                vpack_ref[0], v_lo[:, sl], None if v_hi is None else v_hi[:, sl],
                d_m, packed,
            )
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vhat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == nb - 1)
    def _finish():
        l = l_ref[:, :1]
        m = m_ref[:, :1]
        safe_l = jnp.maximum(l, 1e-30)
        out_ref[0, 0] = acc_ref[:] / safe_l
        lse = jnp.where(l > 0, m + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])
