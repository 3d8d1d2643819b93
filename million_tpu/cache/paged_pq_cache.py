"""Paged PQ KV cache: fixed page pool + per-sequence page tables.

Functional re-design of the reference's PageManager + PagedPQCache
(dynamic_paged_pq_utils.py:10-321, 446-854). Differences driven by XLA
static shapes and the serving scheduler:

  * the pool is PREallocated (n_pages fixed) — the reference's 50%-growth
    realloc policy (dynamic_paged_pq_utils.py:216-280) is replaced by
    capacity planning, because reallocation defeats jit buffer donation;
  * allocation state is a pytree: a uint8 `used` bitmap plus int32 page
    tables (max_seqs, pages_per_seq); allocating k pages = take the first
    k free slots of argsort(used) — O(n log n) on device, no host sync;
  * pages are layer-synchronized: all layers of a sequence share one page
    table (sequence lengths are identical across layers), and each layer
    indexes its own slab of the pool — the reference keeps per-(layer,
    batch, head) page lists (dynamic_paged_pq_utils.py:446-456) purely
    because torch tensors can't be stacked per layer; ours can.

Pool layout per layer: (n_pages, nh_k, M, page_size // 4) int32, token-minor
and WORD-PACKED (4 uint8 codes per int32 — see ops/pq_attention_pallas.py for
why Mosaic makes bytes-at-rest/words-in-flight the right layout), the same
transposed layout the fused kernel gathers from, so a page is directly a
kernel block.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from million_tpu.pq.ops import RUNTIME_ENCODE_PRECISION, pq_encode
from million_tpu.ops.pq_attention_pallas import WORD, pack_codes

PagedState = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class PagedPQCacheConfig:
    num_layers: int
    nh_k: int
    d: int
    M: int
    C: int = 256
    Lt: int = 128
    page_size: int = 512  # tokens per page (multiple of 128)
    n_pages: int = 512  # pool capacity per layer
    max_seqs: int = 8
    pages_per_seq: int = 64
    dtype: Any = jnp.bfloat16
    # asymmetric geometry: V-side subspace count (None -> M); see
    # ops/pq_attention_pallas.py header for the quality caveat
    M_v: int | None = None
    # outlier-channel high precision (round 4, the flat path's round-3
    # OK/OV option ported to serving): OK/OV channels per head vector are
    # excluded from PQ and stored exact in bf16 byte-plane POOLS beside
    # the code pools, folded back inside the paged kernel as dense MXU
    # terms (ops/pq_attention_pallas.py header)
    OK: int = 0
    OV: int = 0

    @property
    def m_v(self) -> int:
        return self.M_v or self.M

    @property
    def tokens_capacity(self) -> int:
        return self.n_pages * self.page_size


def init_paged_state(cfg: PagedPQCacheConfig) -> PagedState:
    L = cfg.num_layers
    st_out = {}
    if cfg.OK:
        st_out["key_outlier_pool"] = jnp.zeros(
            (L, cfg.n_pages + 1, cfg.nh_k, WORD, cfg.OK,
             cfg.page_size // WORD), jnp.bfloat16
        )
    if cfg.OV:
        st_out["value_outlier_pool"] = jnp.zeros(
            (L, cfg.n_pages + 1, cfg.nh_k, WORD, cfg.OV,
             cfg.page_size // WORD), jnp.bfloat16
        )
    return {
        **st_out,
        # one slab per layer; K and V pools separate. Slab index n_pages is
        # a reserved SCRATCH page: masked-out scatters (inactive slots,
        # unallocated table entries) are routed there instead of corrupting
        # a real page.
        "key_pool": jnp.zeros(
            (L, cfg.n_pages + 1, cfg.nh_k, cfg.M, cfg.page_size // WORD), jnp.int32
        ),
        "value_pool": jnp.zeros(
            (L, cfg.n_pages + 1, cfg.nh_k, cfg.m_v, cfg.page_size // WORD), jnp.int32
        ),
        "used": jnp.zeros((cfg.n_pages,), jnp.int32),  # 0 free, 1 used
        "page_table": jnp.full((cfg.max_seqs, cfg.pages_per_seq), -1, jnp.int32),
        "seq_n_codes": jnp.zeros((cfg.max_seqs,), jnp.int32),
        "seq_n_pages": jnp.zeros((cfg.max_seqs,), jnp.int32),
        # exact residual windows per sequence (window-flush batching:
        # codes are produced only at flush_paged_slots, so no incremental
        # window-code buffers exist — round-3 redesign, VERDICT r2 item 4)
        "key_residual": jnp.zeros(
            (L, cfg.max_seqs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype
        ),
        "value_residual": jnp.zeros(
            (L, cfg.max_seqs, cfg.nh_k, cfg.Lt, cfg.d), cfg.dtype
        ),
        "seq_r": jnp.zeros((cfg.max_seqs,), jnp.int32),
        "seq_active": jnp.zeros((cfg.max_seqs,), jnp.int32),
    }


def allocate_pages(state: PagedState, seq_id: jax.Array, k: int) -> PagedState:
    """Assign k fresh pages to seq_id's table (static k). Free pages are the
    first slots of argsort(used) — deterministic, no host round-trip.
    Equivalent to PageManager.allocate_pages (dynamic_paged_pq_utils.py:176-214).
    """
    order = jnp.argsort(state["used"], stable=True)  # free (0) pages first
    new_pages = order[:k]  # (k,)
    # fail-soft: if any chosen page is already used, the pool is exhausted;
    # mark via sentinel so callers can detect (used stays consistent).
    ok = state["used"][new_pages].sum() == 0
    used = state["used"].at[new_pages].set(jnp.where(ok, 1, state["used"][new_pages]))
    start = state["seq_n_pages"][seq_id]
    table_row = state["page_table"][seq_id]
    idx = start + jnp.arange(k)
    table_row = table_row.at[idx].set(jnp.where(ok, new_pages, -1))
    new = dict(state)
    new["used"] = used
    new["page_table"] = state["page_table"].at[seq_id].set(table_row)
    new["seq_n_pages"] = state["seq_n_pages"].at[seq_id].add(jnp.where(ok, k, 0))
    return new


def free_sequence(state: PagedState, seq_id: jax.Array) -> PagedState:
    """Release all of seq_id's pages back to the pool
    (PageManager.free_page loop, dynamic_paged_pq_utils.py:282-301)."""
    row = state["page_table"][seq_id]
    valid = row >= 0
    used = state["used"].at[jnp.where(valid, row, 0)].add(
        jnp.where(valid, -1, 0)
    )
    new = dict(state)
    new["used"] = jnp.clip(used, 0, 1)
    new["page_table"] = state["page_table"].at[seq_id].set(-1)
    new["seq_n_pages"] = state["seq_n_pages"].at[seq_id].set(0)
    new["seq_n_codes"] = state["seq_n_codes"].at[seq_id].set(0)
    new["seq_r"] = state["seq_r"].at[seq_id].set(0)
    new["seq_active"] = state["seq_active"].at[seq_id].set(0)
    return new


def write_codes_to_pages(
    state: PagedState,
    seq_id: jax.Array,
    kc: jax.Array,  # (L, nh_k, M, n) uint8 transposed codes, n static
    vc: jax.Array,
    cfg: PagedPQCacheConfig,
) -> PagedState:
    """Append n tokens of codes into seq_id's pages (the paged
    flush_to_pages, dynamic_paged_pq_utils.py:549-666). `start` and n must
    be word-aligned (multiples of 4): each packed word scatters to
    (page_table[word // ps_w], word % ps_w). The scatter is per-flush /
    per-prefill-chunk, not in the decode hot loop, so XLA scatter throughput
    is fine here."""
    n = kc.shape[-1]
    if n % WORD:
        raise ValueError(f"paged code append must be word-aligned (n={n})")
    ps_w = cfg.page_size // WORD
    start = state["seq_n_codes"][seq_id]

    t_w = start // WORD + jnp.arange(n // WORD)
    pages = state["page_table"][seq_id, t_w // ps_w]  # (nw,)
    offs = t_w % ps_w  # (nw,)
    # clamp unallocated (-1) pages to 0; callers must allocate first —
    # n_codes bookkeeping stays correct either way.
    pages = jnp.maximum(pages, 0)

    def scatter(pool, codes):
        # pool (L, P, H, M, ps_w); words (L, H, M, nw). The two advanced
        # indices (pages, offs) are separated by slices, so their broadcast
        # dim moves to the FRONT: target shape (nw, L, H, M).
        vals = pack_codes(codes).transpose(3, 0, 1, 2)
        return pool.at[:, pages, :, :, offs].set(vals)

    new = dict(state)
    new["key_pool"] = scatter(state["key_pool"], kc)
    new["value_pool"] = scatter(state["value_pool"], vc)
    new["seq_n_codes"] = state["seq_n_codes"].at[seq_id].add(n)
    return new


def paged_prefill(
    state: PagedState,
    seq_id: jax.Array,
    k: jax.Array,  # (L, nh_k, n, d)
    v: jax.Array,
    key_cents: jax.Array,  # (L, M, C, d_m)
    value_cents: jax.Array,
    cfg: PagedPQCacheConfig,
    layout: str = "strided",
) -> PagedState:
    """Encode a prefill chunk for all layers and write into pages.

    Pages must already be allocated (allocate_pages with
    cdiv(n, page_size)); the reference's bulk-allocation prefill is
    dynamic_paged_pq_utils.py:668-854. The word-aligned prefix goes to
    pages; a ragged tail of n % 4 tokens goes into the slot's exact
    residual window."""
    n = k.shape[2]
    n4 = (n // WORD) * WORD
    tail = n - n4
    from million_tpu.pq.ops import RUNTIME_FUSED_ENCODE

    if RUNTIME_FUSED_ENCODE:
        from million_tpu.ops.pq_encode_pallas import pq_encode_fused_stacked

        # one launch over all layer banks; the distance/argmin stays in VMEM
        kc = jnp.swapaxes(pq_encode_fused_stacked(
            k, key_cents, layout, precision=RUNTIME_ENCODE_PRECISION), -1, -2)
        vc = jnp.swapaxes(pq_encode_fused_stacked(
            v, value_cents, layout, precision=RUNTIME_ENCODE_PRECISION), -1, -2)
    else:
        _enc = functools.partial(pq_encode, precision=RUNTIME_ENCODE_PRECISION)
        kc = jnp.swapaxes(jax.vmap(_enc, in_axes=(0, 0, None))(k, key_cents, layout), -1, -2)
        vc = jnp.swapaxes(jax.vmap(_enc, in_axes=(0, 0, None))(v, value_cents, layout), -1, -2)
    new = write_codes_to_pages(state, seq_id, kc[..., :n4], vc[..., :n4], cfg)
    if tail:
        # ragged tail -> exact residual window only; its codes are
        # produced by the NEXT window flush (round-3 window-flush design:
        # no incremental window-code buffers exist anymore)
        kt = k[:, :, n4:].astype(new["key_residual"].dtype)  # (L, nh_k, tail, d)
        vt = v[:, :, n4:].astype(new["value_residual"].dtype)
        new["key_residual"] = new["key_residual"].at[:, seq_id, :, :tail].set(kt)
        new["value_residual"] = new["value_residual"].at[:, seq_id, :, :tail].set(vt)
        new["seq_r"] = new["seq_r"].at[seq_id].set(tail)
    new["seq_active"] = new["seq_active"].at[seq_id].set(1)
    return new


def paged_cache_stats(state: PagedState, cfg: PagedPQCacheConfig) -> Dict[str, Any]:
    """Pool observability — the TPU-native analogue of the reference's
    get_cache_stats / PageManager.get_stats / memory-size properties
    (paged_pq_utils.py:898-1078, dynamic_paged_pq_utils.py:303-321,
    pq_utils.py:383-408). One host readback of the small bookkeeping
    arrays; the multi-GB pools are never touched.

    Returns a plain dict: pool occupancy, per-sequence pages/codes/residual
    counts, and the byte accounting that quantifies the compression (code
    bytes held vs the bf16/f32 KV bytes they replace)."""
    used = np.asarray(state["used"])
    active = np.asarray(state["seq_active"])
    n_codes = np.asarray(state["seq_n_codes"])
    n_pages_seq = np.asarray(state["seq_n_pages"])
    seq_r = np.asarray(state["seq_r"])
    L = state["key_pool"].shape[0]

    pages_used = int(used.sum())
    # exhaustion sentinel readback: allocate_pages fail-softs by writing -1
    # into the table (see its docstring); the scheduler's host mirrors are
    # supposed to prevent that ever happening, so any -1 inside an active
    # sequence's allocated range means host/device bookkeeping diverged and
    # codes are being routed to the scratch page (silent data loss).
    table = np.asarray(state["page_table"])
    table_errors = 0
    for i in range(cfg.max_seqs):
        if active[i]:
            table_errors += int((table[i, : n_pages_seq[i]] < 0).sum())
    # bytes of CODES actually holding live tokens (both sides, all layers)
    bytes_per_token_codes = L * cfg.nh_k * (cfg.M + cfg.m_v)  # uint8 each
    dtype_bytes = jnp.dtype(cfg.dtype).itemsize
    bytes_per_token_dense = L * cfg.nh_k * 2 * cfg.d * dtype_bytes
    live_tokens = int((n_codes * active).sum())
    pool_bytes = int(state["key_pool"].nbytes + state["value_pool"].nbytes)
    residual_bytes = int(
        state["key_residual"].nbytes + state["value_residual"].nbytes
    )
    return {
        "pages_total": cfg.n_pages,
        "pages_used": pages_used,
        "pages_free": cfg.n_pages - pages_used,
        "pool_utilization": pages_used / max(cfg.n_pages, 1),
        "tokens_capacity": cfg.tokens_capacity,
        "active_seqs": int(active.sum()),
        "per_seq": [
            {
                "slot": i,
                "active": bool(active[i]),
                "n_codes": int(n_codes[i]),
                "n_pages": int(n_pages_seq[i]),
                "residual_len": int(seq_r[i]),
            }
            for i in range(cfg.max_seqs)
        ],
        "live_code_bytes": live_tokens * bytes_per_token_codes,
        "dense_kv_bytes_replaced": live_tokens * bytes_per_token_dense,
        "compression_x": (
            bytes_per_token_dense / bytes_per_token_codes
            if bytes_per_token_codes
            else float("nan")
        ),
        "pool_reserved_bytes": pool_bytes,
        "residual_reserved_bytes": residual_bytes,
        "page_table_errors": table_errors,
    }
