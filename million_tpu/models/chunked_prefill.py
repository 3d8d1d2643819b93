"""Chunked PQ prefill: long prompts in bounded-memory chunks.

A 128K-token one-shot prefill materializes activations (and flash-attention
workspace) for the whole prompt at once; chunking bounds that to
`chunk` tokens. Each chunk runs the normal transformer stack, but its
attention is the LSE-merge of two partials (the reference's split +
residual + reduce decomposition, Kernel.cuh:11-166/1038-1270, applied at
prefill time):

  * causal attention WITHIN the chunk (exact);
  * full attention against the QUANTIZED history — the code arena the
    earlier chunks already wrote, decoded blockwise (one `hist_block` of
    K/V is reconstructed at a time, so the dense history KV is never
    materialized — the whole point of the compressed cache).

Attending to quantized history is the PQ-native choice: it is the same
approximation the decode path makes for every generated token, and matches
the reference's ppl protocol (`distort_recent`, pq_utils.py:243-247) where
all history is quantized. The reference itself has no chunked prefill (one
HF forward over the full prompt).

Contract: mode "pq", fresh cache at the first chunk, chunk % 4 == 0 (whole
words per chunk; the ragged tail of the LAST chunk goes to the residual
window exactly like the flat prefill).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

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
from million_tpu.cache.pq_cache import stacked_prefix_write
from million_tpu.ops.pq_attention_pallas import (
    DecodeTable,
    WORD,
    pack_codes,
    pq_chunk_history_attention,
    to_byte_plane,
    unpack_codes,
)
from million_tpu.ops.pq_attention_ref import _gqa_expand, merge_two_partials
from million_tpu.pq.ops import pq_decode, runtime_encode

from functools import partial


def history_kernel_block(n_tokens: int, interpret: bool = False) -> int | None:
    """Largest history-block size usable by pq_chunk_attention for an
    n_tokens bucket: a divisor of the bucket, word-aligned, and >= 512 for
    the compiled kernel (interpret mode takes any word-aligned divisor).
    None -> no legal block; callers fall back to the jnp path."""
    if interpret:
        return n_tokens if (n_tokens % WORD == 0) else None
    for b in (4096, 2048, 1024, 512):
        if n_tokens % b == 0:
            return b
    return None


def _table_layer(pack, li):
    """Per-layer slice of a stacked DecodeTable (tab (L, PM, 128), scales
    (L, 4PM))."""
    return DecodeTable(
        *(jax.lax.dynamic_index_in_dim(t, li, 0, False) for t in pack)
    )


def use_history_kernel(cents, n_bucket_tokens: int) -> bool:
    """Static dispatch for the admission history attention: the Pallas
    chunk kernel (VERDICT r3 item 1) when packed tables exist (C <= 256,
    build_tables) and the bucket admits a legal block; the jnp scan path
    (_history_partial) otherwise — wide codebooks and the oracle tests.
    On CPU the kernel runs in interpret mode, which is slower than jnp, so
    auto-dispatch keeps jnp there (tests opt in explicitly)."""
    if "kpack" not in cents:
        return False
    interpret = jax.default_backend() == "cpu"
    if interpret:
        return False
    return history_kernel_block(n_bucket_tokens, interpret) is not None


def _causal_partial(q, k, v, scale, block: int = 1024):
    """Causal SDPA within the chunk, returning (out, lse) for LSE-merging.

    Blockwise over the KEY axis so the score transient is (nc, block), not
    (nc, nc) — the module exists to bound prefill memory, so the in-chunk
    partial must not be quadratic in the chunk either.

    q (bs, nh, nc, d); k/v (bs, nh_k, nc, d) -> out (bs, nh, nc, d) f32,
    lse (bs, nh, nc) f32.
    """
    bs, nh, nc, d = q.shape
    block = min(block, nc)
    if nc % block:
        block = nc  # odd chunk sizes fall back to one block
    # bf16 matmul inputs, f32 accumulation — on TPU only, mirroring
    # causal_attention (the flat flash path runs q/k/v in bf16 there while
    # CPU/test runs keep exact f32): the bf16 MXU pass is ~4x the f32 rate
    # on v5e and this partial was the admission path's second-largest term
    # after the history walk.
    mm_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    kf = _gqa_expand(k, nh).astype(mm_dtype)
    vf = _gqa_expand(v, nh).astype(mm_dtype)
    qf = (q.astype(jnp.float32) * scale).astype(mm_dtype)
    qpos = jnp.arange(nc)[:, None]

    m0 = jnp.full((bs, nh, nc, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bs, nh, nc, 1), jnp.float32)
    acc0 = jnp.zeros((bs, nh, nc, d), jnp.float32)

    def body(carry, bi):
        m, l, acc = carry
        kb = jax.lax.dynamic_slice_in_dim(kf, bi * block, block, axis=2)
        vb = jax.lax.dynamic_slice_in_dim(vf, bi * block, block, axis=2)
        sc = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kb, preferred_element_type=jnp.float32
        )
        kpos = bi * block + jnp.arange(block)[None, :]
        sc = jnp.where((qpos >= kpos)[None, None], sc, -1e30)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(mm_dtype), vb,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(nc // block))
    safe_l = jnp.maximum(l, 1e-30)
    return acc / safe_l, (m + jnp.log(safe_l))[..., 0]


def _history_partial(q, key_codes, value_codes, kcent, vcent, n_prev, scale,
                     nb, hist_block):
    """Full attention of the chunk's queries against the first n_prev
    quantized tokens, decoded one hist_block at a time (bounded memory).

    key_codes/value_codes: (bs, nh_k, M, NW) packed arena words. nb (static)
    blocks of hist_block tokens are scanned; positions >= n_prev mask out.
    Returns (out (bs, nh, nc, d) f32 normalized, lse (bs, nh, nc) f32).
    """
    bs, nh_k = key_codes.shape[0], key_codes.shape[1]
    nh, nc, d = q.shape[1], q.shape[2], q.shape[3]
    qf = q.astype(jnp.float32) * scale
    bw = hist_block // WORD

    m0 = jnp.full((bs, nh, nc, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bs, nh, nc, 1), jnp.float32)
    acc0 = jnp.zeros((bs, nh, nc, d), jnp.float32)

    def body(carry, bi):
        m, l, acc = carry
        kw = jax.lax.dynamic_slice_in_dim(key_codes, bi * bw, bw, axis=3)
        vw = jax.lax.dynamic_slice_in_dim(value_codes, bi * bw, bw, axis=3)
        khat = pq_decode(
            jnp.swapaxes(unpack_codes(kw), -1, -2), kcent, SUBSPACE_LAYOUT
        )  # (bs, nh_k, hist_block, d) f32
        vhat = pq_decode(
            jnp.swapaxes(unpack_codes(vw), -1, -2), vcent, SUBSPACE_LAYOUT
        )
        kf = _gqa_expand(khat, nh)
        vf = _gqa_expand(vhat, nh)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
        kpos = bi * hist_block + jnp.arange(hist_block)
        s = jnp.where((kpos < n_prev)[None, None, None], s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(nb))
    safe_l = jnp.maximum(l, 1e-30)
    lse = jnp.where(l[..., 0] > 0, m[..., 0] + jnp.log(safe_l[..., 0]), -1e30)
    return acc / safe_l, lse


def _causal_partial_sharded(q, k, v, scale, mesh):
    """_causal_partial shard_mapped over (dp, tp): attention is
    embarrassingly parallel across batch and heads (the flat prefill's
    _prefill_causal_attention pattern, models/llama.py)."""
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        lambda q, k, v: _causal_partial(q, k, v, scale),
        mesh=mesh,
        in_specs=(P("dp", "tp", None, None),) * 3,
        out_specs=(P("dp", "tp", None, None), P("dp", "tp", None)),
        check_vma=False,
    )
    return fn(q, k, v)


def _history_partial_sharded(
    q, key_codes, value_codes, kcent, vcent, n_prev, scale, nb, hist_block,
    mesh, kernel_tables=None, outliers=None,
):
    """History attention with the code arena SEQUENCE-SHARDED: each (dcn,
    sp) shard scans only its own contiguous arena slice (the same
    ownership layout as sharded decode) and the per-shard partials merge
    with the associative LSE combine — so chunked admission composes with
    the multi-chip cache without ever gathering the arena.

    kernel_tables = (kpack_l, vpack_l, direct_k, direct_v) routes each
    shard's scan through the Pallas chunk kernel (pq_chunk_history_attention)
    instead of the jnp block scan; None keeps the jnp path (wide codebooks,
    oracle tests). `outliers` (kernel path only) is the per-layer dict
    {k_outliers, koidx, v_outliers, voidx}: the byte-plane arenas shard
    over the sequence axes with the codes and each shard folds its own
    corrections before the merge."""
    from jax.sharding import PartitionSpec as P

    from million_tpu.parallel.sharded_decode import (
        _linear_shard_index,
        _merge_over,
        _seq_axes,
    )

    seq_axes = _seq_axes(mesh)
    n_shards = 1
    for a in seq_axes:
        n_shards *= mesh.shape[a]
    NW = key_codes.shape[3]
    n_local = NW * WORD // n_shards
    if n_local % hist_block:
        raise ValueError(
            f"hist_block {hist_block} must divide the local arena "
            f"({n_local} tokens across {n_shards} sequence shards)"
        )
    nb_loc = max(min(nb, n_local // hist_block), 1)
    interp = True if mesh.devices.flat[0].platform == "cpu" else None
    blk = history_kernel_block(n_local, bool(interp))
    if kernel_tables is not None and blk is None:
        kernel_tables = None  # no legal block for this local span

    use_kernel = kernel_tables is not None
    if use_kernel:
        kpack_l, vpack_l, d_k, d_v = kernel_tables
        tabs = (kpack_l, vpack_l)
    else:
        tabs = (kcent, vcent)  # placeholder slot with matching arity
    if outliers is not None and not use_kernel:
        outliers = None  # corrections ride the kernel path only
    with_ko = outliers is not None and "k_outliers" in outliers
    with_vo = outliers is not None and "v_outliers" in outliers

    def local_fn(q, kc, vc, kcent, vcent, tabs, n_prev, *opt):
        i = _linear_shard_index(mesh, seq_axes)
        local_valid = jnp.clip(n_prev[0] - i * n_local, 0, n_local)
        if use_kernel:
            okw = {}
            it = iter(opt)
            if with_ko:
                okw["k_outliers"], okw["koidx"] = next(it), next(it)
            if with_vo:
                okw["v_outliers"], okw["voidx"] = next(it), next(it)
            # bound the scan like the jnp path's nb_loc — without it the
            # kernel streams the FULL local arena every chunk; round up
            # to a block multiple (pq_chunk_attention's geometry check)
            nbk = min(-(-(nb_loc * hist_block) // blk) * blk, n_local)
            out, lse = pq_chunk_history_attention(
                q, kc, vc, tabs[0], tabs[1], local_valid, scale,
                n_bucket=nbk,
                block=blk, interpret=interp, direct=d_k, v_direct=d_v,
                **okw,
            )
        else:
            out, lse = _history_partial(
                q, kc, vc, kcent, vcent, local_valid, scale, nb_loc,
                hist_block,
            )
        return _merge_over(out, lse, seq_axes)

    in_specs = [
        P("dp", "tp", None, None),       # q (bs, nh, nc, d)
        P("dp", "tp", None, seq_axes),   # arena words
        P("dp", "tp", None, seq_axes),
        P(),
        P(),
        (P(), P()),                      # decode tables (replicated)
        P(),
    ]
    operands = [q, key_codes, value_codes, kcent, vcent, tabs,
                n_prev.reshape(1)]
    if with_ko:
        in_specs += [P("dp", "tp", None, None, seq_axes), P()]
        operands += [outliers["k_outliers"], outliers["koidx"]]
    if with_vo:
        in_specs += [P("dp", "tp", None, None, seq_axes), P()]
        operands += [outliers["v_outliers"], outliers["voidx"]]
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", "tp", None, None), P("dp", "tp", None)),
        check_vma=False,
    )
    return fn(*operands)


@partial(jax.jit, static_argnames=("cfg", "nb", "hist_block", "last_chunk",
                                   "mesh", "use_kernel"),
         donate_argnums=(3,))
def _prefill_one_chunk(
    params: Params,
    cfg: ModelConfig,
    ids: jax.Array,  # (bs, nc)
    cache: Dict[str, jax.Array],
    cents: Dict[str, jax.Array],
    pos_offset: jax.Array,  # () int32 — global position of ids[:, 0]
    nb: int,  # static: history blocks to scan (ceil(prev_tokens/hist_block))
    hist_block: int,
    last_chunk: bool,
    mesh=None,  # jax.sharding.Mesh -> sharded in-chunk/history attention
    use_kernel: bool = False,  # STATIC: Pallas chunk kernel for the history
    # partial (use_history_kernel decides at the chunked_prefill call site)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    bs, nc = ids.shape
    scale = 1.0 / (cfg.head_dim**0.5)
    n4 = (nc // WORD) * WORD if last_chunk else nc
    tail = nc - n4
    x = params["embed"][ids]
    pos = pos_offset + jnp.arange(nc)

    def layer(carry, lp):
        x, cache, li = carry
        h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(h, lp, cfg, pos)
        kcent = jax.lax.dynamic_index_in_dim(cents["key"], li, 0, False)
        vcent = jax.lax.dynamic_index_in_dim(cents["value"], li, 0, False)
        # OPQ: the stored cache lives in rotated space. In-chunk attention
        # is exact in the original space; the HISTORY partial runs entirely
        # in rotated space (q rotates by Rk — orthogonal invariance keeps
        # the scores identical) and its output, which is in rotated-V
        # space, unrotates once per layer — O(nc*d^2), independent of
        # history length (unrotating each decoded history block would
        # scale with n_prev).
        if "Rk" in cents:
            Rk_i = jax.lax.dynamic_index_in_dim(cents["Rk"], li, 0, False)
            Rv_i = jax.lax.dynamic_index_in_dim(cents["Rv"], li, 0, False)
            k_st, v_st, q_h = _rotate(k, Rk_i), _rotate(v, Rv_i), _rotate(q, Rk_i)
        else:
            Rv_i = None
            k_st, v_st, q_h = k, v, q

        if mesh is not None:
            # shard the encode kernel over (dp, tp) — a Pallas custom call
            # under plain SPMD has no partitioning rule (see
            # _prefill_causal_attention, models/llama.py)
            from jax.sharding import PartitionSpec as P

            interp = (
                True if mesh.devices.flat[0].platform == "cpu" else None
            )
            _enc = jax.shard_map(
                lambda x4, c: runtime_encode(x4, c, SUBSPACE_LAYOUT, interp),
                mesh=mesh,
                in_specs=(P("dp", "tp", None, None), P()),
                out_specs=P("dp", "tp", None, None),
                check_vma=False,
            )
        else:
            _enc = lambda x4, c: runtime_encode(x4, c, SUBSPACE_LAYOUT)
        kc = jnp.swapaxes(_enc(k_st[:, :, :n4], kcent), -1, -2)
        vc = jnp.swapaxes(_enc(v_st[:, :, :n4], vcent), -1, -2)
        # exact outlier channels of the chunk -> byte-plane arena slabs
        # (round 5, VERDICT r4 item 5: the OK/OV option reaches the 128K
        # flat chunked path; channels were zeroed before codebook training
        # so the codes spend no mass on them — llama.prefill's contract)
        k_out_t = v_out_t = koidx = voidx = None
        if "k_outlier_idx" in cents:
            koidx = jax.lax.dynamic_index_in_dim(
                cents["k_outlier_idx"], li, 0, False)
            k_out_t = to_byte_plane(
                jnp.swapaxes(k_st[:, :, :n4][..., koidx], -1, -2))
        if "v_outlier_idx" in cents:
            voidx = jax.lax.dynamic_index_in_dim(
                cents["v_outlier_idx"], li, 0, False)
            v_out_t = to_byte_plane(
                jnp.swapaxes(v_st[:, :, :n4][..., voidx], -1, -2))
        n_prev = cache["n_codes"][li]  # history BEFORE this chunk's write
        cache = stacked_prefix_write(
            cache, li, kc, vc,
            k_st[:, :, n4:] if tail else None,
            v_st[:, :, n4:] if tail else None,
            k_out_t=k_out_t, v_out_t=v_out_t,
        )

        if mesh is not None:
            out_c, lse_c = _causal_partial_sharded(q, k, v, scale, mesh)
        else:
            out_c, lse_c = _causal_partial(q, k, v, scale)
        if nb:
            kc_l = jax.lax.dynamic_index_in_dim(cache["key_codes"], li, 0, False)
            vc_l = jax.lax.dynamic_index_in_dim(cache["value_codes"], li, 0, False)
            # outlier history corrections ride the KERNEL path only (the
            # jnp fallback decodes the zeroed channels as 0 — graceful
            # quality fallback for wide-codebook/oracle runs, same policy
            # as the paged admission's jnp route)
            hokw = {}
            if use_kernel and "key_outliers" in cache:
                hokw["k_outliers"] = jax.lax.dynamic_index_in_dim(
                    cache["key_outliers"], li, 0, False)
                hokw["koidx"] = koidx
            if use_kernel and "value_outliers" in cache:
                hokw["v_outliers"] = jax.lax.dynamic_index_in_dim(
                    cache["value_outliers"], li, 0, False)
                hokw["voidx"] = voidx
            if use_kernel:
                ktabs = (
                    _table_layer(cents["kpack"], li),
                    _table_layer(cents["vpack"], li),
                    cents["key"].shape[-2] <= 128,
                    cents["value"].shape[-2] <= 128,
                )
            if mesh is not None:
                out_h, lse_h = _history_partial_sharded(
                    q_h, kc_l, vc_l, kcent, vcent, n_prev, scale, nb,
                    hist_block, mesh,
                    kernel_tables=ktabs if use_kernel else None,
                    outliers=hokw if hokw else None,
                )
            elif use_kernel:
                out_h, lse_h = pq_chunk_history_attention(
                    q_h, kc_l, vc_l, ktabs[0], ktabs[1], n_prev, scale,
                    n_bucket=nb * hist_block,
                    block=history_kernel_block(
                        nb * hist_block, jax.default_backend() == "cpu"
                    ),
                    direct=ktabs[2], v_direct=ktabs[3], **hokw,
                )
            else:
                out_h, lse_h = _history_partial(
                    q_h, kc_l, vc_l, kcent, vcent, n_prev, scale, nb,
                    hist_block,
                )
            if Rv_i is not None:
                out_h = _rotate(out_h, Rv_i.T)
            attn, _ = merge_two_partials(out_c, lse_c, out_h, lse_h)
        else:
            attn = out_c

        attn = attn.astype(x.dtype).transpose(0, 2, 1, 3).reshape(bs, nc, -1)
        x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
        h2 = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + _mlp(h2, lp).astype(x.dtype)
        return (x, cache, li + 1), None

    (x, cache, _), _ = jax.lax.scan(
        layer, (x, cache, jnp.asarray(0, jnp.int32)), params["layers"]
    )
    if not last_chunk:
        # only the final chunk's logits are consumed; skip the lm head
        return jnp.zeros((bs, cfg.vocab_size), jnp.float32), cache
    return _logits(params, cfg, x[:, -1:])[:, 0], cache


def chunked_prefill(
    params: Params,
    cfg: ModelConfig,
    input_ids: jax.Array,  # (bs, n)
    cache: Dict[str, jax.Array],  # fresh stacked PQ cache
    cents: Dict[str, jax.Array],
    *,
    chunk: int = 4096,
    hist_block: int = 4096,
    mesh=None,  # jax.sharding.Mesh -> (dp, tp)-sharded chunk attention +
    # sequence-sharded history scan (the arena stays in its mesh sharding)
    use_kernel: bool | None = None,  # history partial via the Pallas chunk
    # kernel; None = auto (packed tables present + not on CPU)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Prefill `input_ids` in `chunk`-token pieces (host-scheduled loop).

    Returns (last-token logits (bs, V) f32, decode-ready cache). The first
    chunk must start on a fresh cache; chunks except the last are
    word-aligned by construction (chunk % 4 == 0).
    """
    import numpy as np

    if chunk % WORD:
        raise ValueError("chunk must be a multiple of 4")
    bs, n = input_ids.shape
    n_max = cache["key_codes"].shape[-1] * WORD
    n_seq_shards = 1
    if mesh is not None:
        n_seq_shards = mesh.shape.get("sp", 1) * mesh.shape.get("dcn", 1)
        if n_max % n_seq_shards:
            raise ValueError(
                f"arena N_max {n_max} not divisible by {n_seq_shards} "
                "sequence shards"
            )
    # the ENCODED prefix must fit the arena: inside jit an out-of-range
    # dynamic_update_slice CLAMPS and silently overwrites the newest codes
    # (the generate.py capacity-guard hazard)
    if n - n % WORD > n_max:
        raise ValueError(
            f"aligned prompt prefix {n - n % WORD} exceeds arena N_max {n_max}"
        )
    try:  # fresh-cache contract (checkable only with a concrete cache)
        if int(np.asarray(cache["n_codes"][0])) != 0:
            raise ValueError(
                "chunked_prefill requires a FRESH cache (n_codes == 0): "
                "positions and history bookkeeping start at 0"
            )
    except jax.errors.TracerArrayConversionError:
        pass
    # largest WORD-multiple divisor of the (per-shard) arena not exceeding
    # the request, so any arena size works without caller tuning; on a mesh
    # the history scan is per sequence shard, so the divisor target is the
    # LOCAL arena span
    hb_target = n_max // n_seq_shards
    hb = min(hist_block, hb_target)
    hb -= hb % WORD
    while hb > WORD and hb_target % hb:
        hb -= WORD
    hist_block = max(hb, WORD)

    def bucket_pow2(k: int) -> int:
        b = 1
        while b < k:
            b *= 2
        return b

    logits = None
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        # static nb re-specializes the graph; bucket to powers of two so a
        # 128K prompt costs ~6 compiles instead of 32 (masked blocks past
        # n_prev contribute nothing)
        nb_exact = -(-s // hist_block)
        nb = min(bucket_pow2(nb_exact), n_max // hist_block) if nb_exact else 0
        uk = use_kernel
        if uk is None:
            uk = use_history_kernel(cents, nb * hist_block) if nb else False
        elif uk and (
            "kpack" not in cents
            or history_kernel_block(
                nb * hist_block, jax.default_backend() == "cpu"
            ) is None
        ):
            uk = False
        logits, cache = _prefill_one_chunk(
            params, cfg, input_ids[:, s:e], cache, cents,
            jnp.asarray(s, jnp.int32), nb=nb, hist_block=hist_block,
            last_chunk=(e == n), mesh=mesh, use_kernel=uk and nb > 0,
        )
    return logits, cache
