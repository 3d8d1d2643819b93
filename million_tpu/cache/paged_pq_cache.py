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

Pool layout per layer: (n_pages, nh_k, M, page_size) uint8, token-minor —
the same transposed layout the fused kernel gathers from, so a page is
directly a kernel block.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from million_tpu.pq.ops import pq_encode

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

    @property
    def tokens_capacity(self) -> int:
        return self.n_pages * self.page_size


def init_paged_state(cfg: PagedPQCacheConfig) -> PagedState:
    L = cfg.num_layers
    return {
        # one slab per layer; K and V pools separate. Slab index n_pages is
        # a reserved SCRATCH page: masked-out scatters (inactive slots,
        # unallocated table entries) are routed there instead of corrupting
        # a real page.
        "key_pool": jnp.zeros(
            (L, cfg.n_pages + 1, cfg.nh_k, cfg.M, cfg.page_size), jnp.uint8
        ),
        "value_pool": jnp.zeros(
            (L, cfg.n_pages + 1, cfg.nh_k, cfg.M, cfg.page_size), jnp.uint8
        ),
        "used": jnp.zeros((cfg.n_pages,), jnp.int32),  # 0 free, 1 used
        "page_table": jnp.full((cfg.max_seqs, cfg.pages_per_seq), -1, jnp.int32),
        "seq_n_codes": jnp.zeros((cfg.max_seqs,), jnp.int32),
        "seq_n_pages": jnp.zeros((cfg.max_seqs,), jnp.int32),
        # incremental codes of each slot's current residual window
        "key_residual_codes": jnp.zeros(
            (L, cfg.max_seqs, cfg.nh_k, cfg.M, cfg.Lt), jnp.uint8
        ),
        "value_residual_codes": jnp.zeros(
            (L, cfg.max_seqs, cfg.nh_k, cfg.M, cfg.Lt), jnp.uint8
        ),
        # exact residual windows per sequence
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
    flush_to_pages, dynamic_paged_pq_utils.py:549-666). Arbitrary `start`
    alignment: each token scatters to (page_table[(start+t)//ps],
    (start+t)%ps). The scatter is per-flush / per-prefill-chunk, not in the
    decode hot loop, so XLA scatter throughput is fine here."""
    n = kc.shape[-1]
    ps = cfg.page_size
    start = state["seq_n_codes"][seq_id]

    t = start + jnp.arange(n)
    pages = state["page_table"][seq_id, t // ps]  # (n,)
    offs = t % ps  # (n,)
    # clamp unallocated (-1) pages to 0; callers must allocate first —
    # n_codes bookkeeping stays correct either way.
    pages = jnp.maximum(pages, 0)

    def scatter(pool, codes):
        # pool (L, P, H, M, ps); codes (L, H, M, n). The two advanced
        # indices (pages, offs) are separated by slices, so their broadcast
        # dim moves to the FRONT: target shape (n, L, H, M).
        vals = codes.transpose(3, 0, 1, 2)
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
    dynamic_paged_pq_utils.py:668-854."""
    kc = jnp.swapaxes(jax.vmap(pq_encode, in_axes=(0, 0, None))(k, key_cents, layout), -1, -2)
    vc = jnp.swapaxes(jax.vmap(pq_encode, in_axes=(0, 0, None))(v, value_cents, layout), -1, -2)
    new = write_codes_to_pages(state, seq_id, kc, vc, cfg)
    new["seq_active"] = new["seq_active"].at[seq_id].set(1)
    return new
