"""Ring causal attention: sequence-sharded prefill attention over a mesh.

The multi-chip generalization of blockwise (flash) PREFILL attention, the
prefill-side sibling of `sharded_decode` (which shards the quantized decode
arena): q, k, v are sharded over the sequence axis; each of the P shards
holds one contiguous block, and over P ring steps the K/V blocks rotate to
the neighbor via `jax.lax.ppermute` while every shard folds the visiting
block into its flash-style online-softmax accumulator. Communication per
step is the (bs, nh_k, n_local, d) K/V block riding ICI concurrently with
compute — the classic ring-attention schedule (Liu et al. '23), and exactly
the associative (partial, lse) combine the reference uses across its
intra-GPU splits (Kernel.cuh:1211-1270), promoted to a collective.

Causality: shard i's queries own global positions [i*n_local, (i+1)*n_local);
a visiting block from shard j is fully attended when j < i, fully masked
when j > i, and triangularly masked when j == i — masking is positional, so
the lax.fori_loop body stays uniform.

Reference scope note: the reference has NO distributed execution
(SURVEY.md §2.3); this module is north-star scope.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _gqa_expand(x: jax.Array, nh: int) -> jax.Array:
    nk = x.shape[1]
    if nk == nh:
        return x
    return jnp.repeat(x, nh // nk, axis=1)


def ring_causal_local(
    q: jax.Array,  # (bs, nh, n_loc, d) — THIS shard's query block
    k: jax.Array,  # (bs, nh_k, n_loc, d)
    v: jax.Array,
    axis,  # mesh axis name or tuple (e.g. ("dcn", "sp")) the ring runs over
    n_shards: int,
    scale: float,
) -> jax.Array:
    """The per-shard ring body, for callers ALREADY inside a shard_map
    (e.g. the sequence-parallel prefill): fold the local K/V block, then
    rotate blocks around `axis` n_shards-1 times with ppermute. A tuple
    axis linearizes (axis-major): jax collectives accept multi-axis names,
    so a ("dcn", "sp") ring hops DCN only at slice boundaries — 1 of every
    sp steps — while the rest ride ICI."""
    bs, nh, n_loc, d = q.shape
    Pn = n_shards
    i = jax.lax.axis_index(axis)  # linearized over tuple axes

    kf = _gqa_expand(k, nh).astype(jnp.float32)
    vf = _gqa_expand(v, nh).astype(jnp.float32)
    qf = q.astype(jnp.float32) * scale
    q_pos = i * n_loc + jax.lax.broadcasted_iota(jnp.int32, (n_loc, n_loc), 0)
    k_off = jax.lax.broadcasted_iota(jnp.int32, (n_loc, n_loc), 1)

    m0 = jnp.full((bs, nh, n_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bs, nh, n_loc, 1), jnp.float32)
    acc0 = jnp.zeros((bs, nh, n_loc, d), jnp.float32)
    perm_axis = axis
    perm = [(j, (j + 1) % Pn) for j in range(Pn)]

    def fold(s, kb, vb, m, l, acc):
        src = (i - s) % Pn  # owner of the visiting block
        sc = jnp.einsum("bhqd,bhkd->bhqk", qf, kb)
        mask = q_pos >= (src * n_loc + k_off)  # (n_loc, n_loc) global causal
        sc = jnp.where(mask[None, None], sc, NEG_INF)
        # step 0 visits the DIAGONAL block (src == i), where every query
        # row attends at least its own position — so m is finite after
        # step 0 and later fully-masked blocks contribute exp(NEG_INF -
        # finite) == 0 cleanly. No extra guard needed.
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, vb)
        return m_new, l, acc

    def step(s, carry):
        kb, vb, m, l, acc = carry
        m, l, acc = fold(s, kb, vb, m, l, acc)
        kb = jax.lax.ppermute(kb, perm_axis, perm)
        vb = jax.lax.ppermute(vb, perm_axis, perm)
        return (kb, vb, m, l, acc)

    # the LAST block folds without a trailing permute — rotating it
    # back would ship a full K/V block over ICI just to drop it
    kb, vb, m, l, acc = jax.lax.fori_loop(0, Pn - 1, step, (kf, vf, m0, l0, acc0))
    m, l, acc = fold(Pn - 1, kb, vb, m, l, acc)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_causal_attention(
    mesh: Mesh,
    q: jax.Array,  # (bs, nh, n, d) — n sharded over `axis`
    k: jax.Array,  # (bs, nh_k, n, d)
    v: jax.Array,
    *,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal SDPA with the sequence sharded over mesh axis `axis`.

    Matches ops.pq_attention_ref.causal_attention numerically (f32 softmax
    stats); returns (bs, nh, n, d) with the same sharding as q.
    """
    bs, nh, n, d = q.shape
    if scale is None:
        scale = 1.0 / (d**0.5)
    Pn = mesh.shape[axis]
    if n % Pn != 0:
        raise ValueError(f"sequence {n} not divisible by {axis}={Pn}")
    n_loc = n // Pn

    def local_fn(q, k, v):
        return ring_causal_local(q, k, v, axis, Pn, scale)

    shmap = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
        ),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return shmap(q, k, v)
