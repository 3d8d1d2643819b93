"""Sequence- and head-sharded PAGED PQ serving over a device mesh.

Round 5 (VERDICT r4 item 1): the continuous-batching runtime — page pool,
fused decode tick, window flush, chunked admission — composed with the
mesh, closing the last unbuilt clause of the north star ("128K-context
multi-host serving: KV tensor-sharded across N>=2 hosts, continuous
batching", BASELINE.json config #5). The reference has neither paging nor
any distributed execution (SURVEY.md §2.3); the design below promotes its
intra-GPU split-KV LSE merge (Kernel.cuh:1211-1270) to the page pool the
same way parallel/sharded_decode.py promoted it for the flat arena.

Sharding layout (mesh axes tp x sp, with the dcn multi-slice axis folding
into the sequence shards exactly as in sharded_decode):

  * every sequence shard owns a CONTIGUOUS token super-range of every
    slot: shard s holds table positions [s*pps_l, (s+1)*pps_l) of each
    slot's page table (pps_l = pages_per_seq / n_sp), i.e. tokens
    [s*cap_l, (s+1)*cap_l). Shards fill in order as a slot grows — the
    same "contiguous ranges filled in order" contract the flat sharded
    decode uses, so each shard's valid count is clip(n_codes - s*cap_l,
    0, cap_l), computable on device from the replicated counters with NO
    host routing;
  * each shard has its OWN page-pool slab of P_l = n_pages / n_sp pages
    plus its own scratch page: pool shape (L, n_sp*(P_l+1), H, M, ps_w),
    page axis sharded over ("dcn","sp"), heads over tp. Page-table
    entries hold LOCAL page ids into the owning shard's slab;
  * decode attention: shard_map over (tp, sp) — each shard runs the
    unchanged paged Pallas kernel over its local slab/table and the
    shards combine with the 2-collective LSE merge (_merge_over). TP is
    collective-free inside attention (disjoint heads); sp pays one tiny
    (G, d+1)-per-head psum per layer;
  * pool writes (admission commits, window flushes) route per shard
    INSIDE shard_map: a write whose global table position is not owned
    lands on the shard's scratch page — the same masked-scatter discipline
    the single-chip pool uses for inactive slots;
  * page ALLOCATION is host-side in the sharded scheduler (the scheduler
    already mirrors every counter; argsort-on-device buys nothing once
    the pool is distributed) — see runtime/scheduler.ShardedScheduler.

Load-balance note: contiguous ranges mean short sequences occupy only the
leading shards. This is the right trade for the north-star config (128K
sequences span all shards; the alternative — striping pages round-robin —
needs per-page position metadata inside the kernel). The flat sharded
decode made the same call.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from million_tpu.cache.paged_pq_cache import PagedPQCacheConfig
from million_tpu.ops.pq_attention_pallas import WORD, pq_paged_attention_stacked
from million_tpu.parallel.sharded_decode import (
    _linear_shard_index,
    _merge_over,
    _seq_axes,
)


def paged_shard_info(pcfg: PagedPQCacheConfig, mesh: Mesh):
    """(n_sp, P_l, pps_l, cap_l): sequence-shard count, local pool pages,
    local table width, local token capacity per slot."""
    seq_axes = _seq_axes(mesh)
    n_sp = int(np.prod([mesh.shape[a] for a in seq_axes]))
    tp = mesh.shape.get("tp", 1)
    if pcfg.n_pages % n_sp:
        raise ValueError(f"n_pages={pcfg.n_pages} not divisible by sp={n_sp}")
    if pcfg.pages_per_seq % n_sp:
        raise ValueError(
            f"pages_per_seq={pcfg.pages_per_seq} not divisible by sp={n_sp}"
        )
    if pcfg.nh_k % tp:
        raise ValueError(f"nh_k={pcfg.nh_k} not divisible by tp={tp}")
    P_l = pcfg.n_pages // n_sp
    pps_l = pcfg.pages_per_seq // n_sp
    return n_sp, P_l, pps_l, pps_l * pcfg.page_size


def paged_state_shardings(pcfg: PagedPQCacheConfig, mesh: Mesh) -> Dict:
    """NamedShardings for the sharded paged state pytree."""
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    out = {
        "key_pool": s(None, seq, "tp", None, None),
        "value_pool": s(None, seq, "tp", None, None),
        "page_table": s(None, seq),
        "used": s(seq, None),
        "seq_n_codes": s(None),
        "seq_n_pages": s(None),
        "key_residual": s(None, None, "tp", None, None),
        "value_residual": s(None, None, "tp", None, None),
        "seq_r": s(None),
        "seq_active": s(None),
    }
    if pcfg.OK:
        out["key_outlier_pool"] = s(None, seq, "tp", None, None, None)
    if pcfg.OV:
        out["value_outlier_pool"] = s(None, seq, "tp", None, None, None)
    return out


def init_sharded_paged_state(pcfg: PagedPQCacheConfig, mesh: Mesh) -> Dict:
    """The sharded counterpart of init_paged_state: per-shard pool slabs
    (each with its own local scratch page at local index P_l), a
    (n_sp, P_l) used map, and the page table whose entries are LOCAL ids
    into the owning shard's slab."""
    n_sp, P_l, pps_l, _ = paged_shard_info(pcfg, mesh)
    L = pcfg.num_layers
    ps_w = pcfg.page_size // WORD
    Pp = n_sp * (P_l + 1)
    st = {
        "key_pool": jnp.zeros((L, Pp, pcfg.nh_k, pcfg.M, ps_w), jnp.int32),
        "value_pool": jnp.zeros((L, Pp, pcfg.nh_k, pcfg.m_v, ps_w), jnp.int32),
        "used": jnp.zeros((n_sp, P_l), jnp.int32),
        "page_table": jnp.full(
            (pcfg.max_seqs, pcfg.pages_per_seq), -1, jnp.int32
        ),
        "seq_n_codes": jnp.zeros((pcfg.max_seqs,), jnp.int32),
        "seq_n_pages": jnp.zeros((pcfg.max_seqs,), jnp.int32),
        "key_residual": jnp.zeros(
            (L, pcfg.max_seqs, pcfg.nh_k, pcfg.Lt, pcfg.d), pcfg.dtype
        ),
        "value_residual": jnp.zeros(
            (L, pcfg.max_seqs, pcfg.nh_k, pcfg.Lt, pcfg.d), pcfg.dtype
        ),
        "seq_r": jnp.zeros((pcfg.max_seqs,), jnp.int32),
        "seq_active": jnp.zeros((pcfg.max_seqs,), jnp.int32),
    }
    if pcfg.OK:
        st["key_outlier_pool"] = jnp.zeros(
            (L, Pp, pcfg.nh_k, WORD, pcfg.OK, ps_w), jnp.bfloat16
        )
    if pcfg.OV:
        st["value_outlier_pool"] = jnp.zeros(
            (L, Pp, pcfg.nh_k, WORD, pcfg.OV, ps_w), jnp.bfloat16
        )
    sh = paged_state_shardings(pcfg, mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in st.items()}


def _pool_specs(pools: Dict, seq) -> Dict:
    """Per-key PartitionSpecs for a pools dict (codes 5D, outliers 6D)."""
    out = {}
    for k, v in pools.items():
        extra = (None,) * (v.ndim - 3)
        out[k] = P(None, seq, "tp", *extra)
    return out


def _update_specs(updates: Dict, slot_axis: bool) -> Dict:
    """Specs for commit update slabs: (L[, S], H, ..., w) — heads over tp,
    everything else replicated."""
    out = {}
    for k, v in updates.items():
        lead = (None, None, "tp") if slot_axis else (None, "tp")
        out[k] = P(*lead, *((None,) * (v.ndim - len(lead))))
    return out


# ---------------------------------------------------------------------------
# decode attention
# ---------------------------------------------------------------------------

def sharded_paged_attention_stacked(
    mesh: Mesh,
    pcfg: PagedPQCacheConfig,
    q: jax.Array,  # (S, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_pool: jax.Array,  # (L, n_sp*(P_l+1), H, M, ps_w) — sharded slabs
    value_pool: jax.Array,
    kpack,
    vpack,
    layer: jax.Array,  # () int32
    page_table: jax.Array,  # (S, pps) LOCAL ids, axis 1 sharded over sp
    n_codes: jax.Array,  # (S,) int32 — GLOBAL counts, replicated
    *,
    p_bucket: Optional[int] = None,
    direct: bool = False,
    v_direct: Optional[bool] = None,
    qo: Optional[jax.Array] = None,
    k_outliers: Optional[jax.Array] = None,
    v_outliers: Optional[jax.Array] = None,
) -> Tuple[jax.Array, ...]:
    """pq_paged_attention_stacked with the page pool sequence-sharded:
    each shard runs the unchanged kernel over its local slab and local
    table slice with local_valid = clip(n_codes - s*cap_l, 0, cap_l), then
    the shards LSE-merge (2 collectives; the outlier co output rides the
    same psum as extra channels). Returns (out, lse[, co]) exactly like
    the single-device call."""
    seq_axes = _seq_axes(mesh)
    n_sp, P_l, pps_l, cap_l = paged_shard_info(pcfg, mesh)
    interpret = True if mesh.devices.flat[0].platform == "cpu" else None
    local_pb = None
    if p_bucket is not None and p_bucket < pps_l:
        local_pb = p_bucket
    with_ko = k_outliers is not None
    with_vo = v_outliers is not None

    def local_fn(q, kp, vp, kpk, vpk, li, pt, nc, *opt):
        okw = {}
        it = iter(opt)
        if with_ko:
            okw["qo"] = next(it)
            okw["k_outliers"] = next(it)
        if with_vo:
            okw["v_outliers"] = next(it)
        s = _linear_shard_index(mesh, seq_axes)
        nc_local = jnp.clip(nc - s * cap_l, 0, cap_l).astype(jnp.int32)
        res = pq_paged_attention_stacked(
            q, kp, vp, kpk, vpk, li[0], pt, nc_local,
            interpret=interpret, direct=direct, v_direct=v_direct,
            p_bucket=local_pb, **okw,
        )
        if with_vo:
            out, lse, co = res
            out = jnp.concatenate([out, co], axis=-1)
        else:
            out, lse = res
        merged, lse_m = _merge_over(out, lse, seq_axes)
        if with_vo:
            return merged[..., : q.shape[-1]], lse_m, merged[..., q.shape[-1]:]
        return merged, lse_m

    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    in_specs = [
        P(None, "tp", None, None),  # q
        P(None, seq, "tp", None, None),  # key pool
        P(None, seq, "tp", None, None),  # value pool
        P(),  # kpack
        P(),  # vpack
        P(),  # layer (1,)
        P(None, seq),  # page table
        P(),  # n_codes
    ]
    operands = [q, key_pool, value_pool, kpack, vpack,
                layer.reshape(1).astype(jnp.int32), page_table, n_codes]
    if with_ko:
        in_specs += [P(None, "tp", None, None),
                     P(None, seq, "tp", None, None, None)]
        operands += [qo, k_outliers]
    if with_vo:
        in_specs.append(P(None, seq, "tp", None, None, None))
        operands.append(v_outliers)
    out_specs = (
        (P(None, "tp", None, None), P(None, "tp", None),
         P(None, "tp", None, None))
        if with_vo
        else (P(None, "tp", None, None), P(None, "tp", None))
    )
    shmap = jax.shard_map(
        local_fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_vma=False,
    )
    return shmap(*operands)


# ---------------------------------------------------------------------------
# pool-write routing (commits run per shard; non-owned writes -> scratch)
# ---------------------------------------------------------------------------

def _local_page_ids(pt_local, tpos, valid, s, pps_l, P_l):
    """Map global table positions `tpos` to this shard's local page ids;
    positions not owned by shard s, invalid, or unallocated route to the
    local scratch page P_l. pt_local is the shard's (S?, pps_l) table
    slice; tpos indexes it at tpos - s*pps_l."""
    pos_local = tpos - s * pps_l
    owned = (pos_local >= 0) & (pos_local < pps_l) & valid
    safe = jnp.clip(pos_local, 0, pps_l - 1)
    if pt_local.ndim == 1:
        ids = pt_local[safe]
    else:
        ids = jnp.take_along_axis(pt_local, safe, axis=1)
    return jnp.where(owned & (ids >= 0), ids, P_l)


@functools.partial(
    jax.jit, static_argnames=("mesh", "pcfg"), donate_argnums=(2,)
)
def sharded_commit_flush(mesh, pcfg, pools, updates, page_table, tpos, offs,
                         mask):
    """shard_map form of _commit_flush: per-slot flush windows (one page
    each) route to the owning shard's local page; every other shard writes
    the same slab to its scratch page. tpos/offs/mask are (S,) replicated
    (derived on device from seq_n_codes)."""
    seq_axes = _seq_axes(mesh)
    n_sp, P_l, pps_l, _ = paged_shard_info(pcfg, mesh)
    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    from million_tpu.models.paged_decode import _commit_flush_body

    def local_fn(pools, updates, pt, tpos, offs, mask):
        s = _linear_shard_index(mesh, seq_axes)
        # pt here is this shard's (S, pps_l) slice; its LOCAL column index
        # is tpos - s*pps_l
        pages = _local_page_ids(pt, tpos[:, None], mask[:, None], s,
                                pps_l, P_l)[:, 0]
        return _commit_flush_body(pools, updates, pages, offs)

    shmap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(
            _pool_specs(pools, seq), _update_specs(updates, slot_axis=True),
            P(None, seq), P(), P(), P(),
        ),
        out_specs=_pool_specs(pools, seq),
        check_vma=False,
    )
    return shmap(pools, updates, page_table, tpos.astype(jnp.int32),
                 offs.astype(jnp.int32), mask)


@functools.partial(
    jax.jit, static_argnames=("mesh", "pcfg"), donate_argnums=(2,)
)
def sharded_commit_words(mesh, pcfg, pools, updates, page_table, seq_id,
                         tpos, real, off):
    """shard_map form of _commit_words (one-shot admission): piece j of
    the chunk goes to global table position tpos[j] of `seq_id`; shards
    that don't own a position (or positions past the real length) write
    their scratch page."""
    seq_axes = _seq_axes(mesh)
    n_sp, P_l, pps_l, _ = paged_shard_info(pcfg, mesh)
    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    from million_tpu.models.paged_decode import _commit_words_body

    def local_fn(pools, updates, pt, sid, tpos, real, off):
        s = _linear_shard_index(mesh, seq_axes)
        row = pt[sid[0]]  # (pps_l,) this shard's slice of the slot's table
        pages = _local_page_ids(row, tpos, real, s, pps_l, P_l)
        return _commit_words_body(pools, updates, pages, off[0])

    shmap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(
            _pool_specs(pools, seq), _update_specs(updates, slot_axis=False),
            P(None, seq), P(), P(), P(), P(),
        ),
        out_specs=_pool_specs(pools, seq),
        check_vma=False,
    )
    return shmap(
        pools, updates, page_table,
        jnp.asarray(seq_id, jnp.int32).reshape(1),
        tpos.astype(jnp.int32), real,
        jnp.asarray(off, jnp.int32).reshape(1),
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "pcfg"), donate_argnums=(2,)
)
def sharded_commit_words_multi(mesh, pcfg, pools, updates, page_table,
                               seq_ids, tpos, real, off):
    """shard_map form of _commit_words_multi (batched chunked admission):
    equal-bucket slots share the piece positions tpos (npc,); real is
    (S, npc) per-slot validity."""
    seq_axes = _seq_axes(mesh)
    n_sp, P_l, pps_l, _ = paged_shard_info(pcfg, mesh)
    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    from million_tpu.models.paged_decode import _commit_words_multi_body

    def local_fn(pools, updates, pt, sids, tpos, real, off):
        s = _linear_shard_index(mesh, seq_axes)
        rows = pt[sids]  # (S, pps_l)
        pages = _local_page_ids(rows, tpos[None, :], real, s, pps_l, P_l)
        return _commit_words_multi_body(pools, updates, pages, off[0])

    shmap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(
            _pool_specs(pools, seq), _update_specs(updates, slot_axis=True),
            P(None, seq), P(), P(), P(), P(),
        ),
        out_specs=_pool_specs(pools, seq),
        check_vma=False,
    )
    return shmap(
        pools, updates, page_table, seq_ids.astype(jnp.int32),
        tpos.astype(jnp.int32), real, jnp.asarray(off, jnp.int32).reshape(1),
    )


# ---------------------------------------------------------------------------
# chunked-admission history attention
# ---------------------------------------------------------------------------

def sharded_history_pages_kernel(
    mesh: Mesh,
    pcfg: PagedPQCacheConfig,
    q: jax.Array,  # (S, nh, nc, d) RAW chunk queries
    key_pool: jax.Array,
    value_pool: jax.Array,
    kpack_l,
    vpack_l,
    li: jax.Array,  # () int32 traced layer index
    seq_ids: jax.Array,  # (S,) int32
    page_table: jax.Array,
    n_prev: jax.Array,  # () int32 — GLOBAL quantized-history length
    scale: float,
    nph_g: int,  # STATIC global history page bound (bucketed)
    *,
    direct: bool = False,
    v_direct: Optional[bool] = None,
    ko_pool=None, koidx=None, vo_pool=None, voidx=None,
) -> Tuple[jax.Array, jax.Array]:
    """The chunked-admission history partial with the pool sharded: each
    shard gathers its OWN pages covering the history bucket, runs the
    chunk-history kernel over the local arena with
    n_prev_local = clip(n_prev - s*cap_l, 0, cap_l), and the shards
    LSE-merge. Mirrors _history_pages_kernel (models/paged_decode.py) on
    the local slab."""
    from million_tpu.models.chunked_prefill import history_kernel_block
    from million_tpu.ops.pq_attention_pallas import pq_chunk_history_attention

    seq_axes = _seq_axes(mesh)
    n_sp, P_l, pps_l, cap_l = paged_shard_info(pcfg, mesh)
    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    interpret = mesh.devices.flat[0].platform == "cpu"
    nph_l = min(nph_g, pps_l)
    blk = history_kernel_block(nph_l * pcfg.page_size, interpret)
    if blk is None:
        raise ValueError(
            f"no legal history kernel block for {nph_l} local pages of "
            f"{pcfg.page_size} tokens"
        )
    ps_w = pcfg.page_size // WORD
    with_ko = ko_pool is not None
    with_vo = vo_pool is not None

    def local_fn(q, kp, vp, kpk, vpk, li, sids, pt, npv, *opt):
        it = iter(opt)
        s = _linear_shard_index(mesh, seq_axes)
        n_prev_local = jnp.clip(npv[0] - s * cap_l, 0, cap_l)
        raw = pt[sids][:, :nph_l]  # (S, nph_l) local ids
        pages = jnp.where(raw >= 0, raw, P_l)
        kp_l = jax.lax.dynamic_index_in_dim(kp, li[0], 0, False)
        vp_l = jax.lax.dynamic_index_in_dim(vp, li[0], 0, False)
        kw = kp_l[pages]  # (S, nph_l, H_l, M, ps_w)
        vw = vp_l[pages]
        S, H = kw.shape[0], kw.shape[2]
        arena_k = kw.transpose(0, 2, 3, 1, 4).reshape(S, H, kw.shape[3], -1)
        arena_v = vw.transpose(0, 2, 3, 1, 4).reshape(S, H, vw.shape[3], -1)
        okw = {}
        if with_ko:
            kop, kidx = next(it), next(it)
            kop_l = jax.lax.dynamic_index_in_dim(kop, li[0], 0, False)[pages]
            okw["k_outliers"] = kop_l.transpose(0, 2, 3, 4, 1, 5).reshape(
                S, H, WORD, kop_l.shape[4], -1)
            okw["koidx"] = kidx
        if with_vo:
            vop, vidx = next(it), next(it)
            vop_l = jax.lax.dynamic_index_in_dim(vop, li[0], 0, False)[pages]
            okw["v_outliers"] = vop_l.transpose(0, 2, 3, 4, 1, 5).reshape(
                S, H, WORD, vop_l.shape[4], -1)
            okw["voidx"] = vidx
        out, lse = pq_chunk_history_attention(
            q, arena_k, arena_v, kpk, vpk, n_prev_local, scale, block=blk,
            interpret=interpret, direct=direct, v_direct=v_direct, **okw,
        )
        return _merge_over(out, lse, seq_axes)

    in_specs = [
        P(None, "tp", None, None),  # q
        P(None, seq, "tp", None, None),  # key pool
        P(None, seq, "tp", None, None),  # value pool
        P(),  # kpack
        P(),  # vpack
        P(),  # li (1,)
        P(),  # seq ids
        P(None, seq),  # page table
        P(),  # n_prev (1,)
    ]
    operands = [q, key_pool, value_pool, kpack_l, vpack_l,
                li.reshape(1).astype(jnp.int32),
                seq_ids.astype(jnp.int32), page_table,
                n_prev.reshape(1).astype(jnp.int32)]
    if with_ko:
        in_specs += [P(None, seq, "tp", None, None, None), P()]
        operands += [ko_pool, koidx]
    if with_vo:
        in_specs += [P(None, seq, "tp", None, None, None), P()]
        operands += [vo_pool, voidx]
    shmap = jax.shard_map(
        local_fn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(P(None, "tp", None, None), P(None, "tp", None)),
        check_vma=False,
    )
    return shmap(*operands)
