"""Sequence-sharded PQ decode attention over a device mesh.

The multi-chip generalization of the reference's intra-GPU split-KV
flash-decoding (Kernel.cuh:15, 75-77): each `sp` shard owns a contiguous
slice of the quantized code arena, runs the fused Pallas kernel over its
slice to produce a normalized partial and its LSE, and the shards combine
with the associative LSE merge (reference reduce kernel math,
Kernel.cuh:1211-1270) — here as `pmax`/`psum` collectives that ride ICI.
Per merge, each chip contributes only (G, d) floats + a scalar per head:
the communication is tiny compared to the code reads, so scaling efficiency
is set by the slowest shard, not bandwidth.

`tp` shards KV heads (each chip runs the kernel on its local heads — no
communication needed inside attention for TP because head outputs are
disjoint), `dp` shards the batch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import numpy as np

from million_tpu.ops.pq_attention_pallas import (
    pq_codes_attention,
    pq_codes_attention_stacked,
)


def _seq_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Sequence-sharding axes: ("dcn", "sp") on a multi-slice mesh — slice-
    major so each DCN slice owns a contiguous token super-range and shard
    traffic stays on ICI — else just ("sp",)."""
    return ("dcn", "sp") if "dcn" in mesh.shape else ("sp",)


def _linear_shard_index(mesh: Mesh, seq_axes: Tuple[str, ...]) -> jax.Array:
    """This device's linear sequence-shard index, axis-major order."""
    i = jnp.asarray(0, jnp.int32)
    for a in seq_axes:
        i = i * mesh.shape[a] + jax.lax.axis_index(a)
    return i


def _merge_over(out: jax.Array, lse: jax.Array, seq_axes: Tuple[str, ...]):
    """Associative LSE merge across the sequence axes (reference reduce
    kernel math, Kernel.cuh:1211-1270). XLA lowers the psum over ("dcn",
    "sp") hierarchically: ICI reduce within a slice, then the tiny
    (G, d)+scalar per head crosses DCN.

    TWO collectives per merge, not three: the numerator and denominator
    ride ONE psum as a concatenated (..., d+1) tensor. Decode issues a
    merge per layer per step, so per-merge collective latency is the
    sp-scaling ceiling at long context (benchmarks/scaling_bench.py models
    exactly this: COLLECTIVES_PER_MERGE)."""
    mx = jax.lax.pmax(lse, seq_axes)
    w = jnp.exp(lse - mx)
    stacked = jnp.concatenate([out * w[..., None], w[..., None]], axis=-1)
    tot = jax.lax.psum(stacked, seq_axes)
    num, den = tot[..., :-1], jnp.maximum(tot[..., -1], 1e-30)
    return num / den[..., None], mx + jnp.log(den)


def sharded_pq_codes_attention(
    mesh: Mesh,
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled; replicated over sp
    key_codes: jax.Array,  # (bs, nh_k, M, N//4) int32 words, sharded over sp
    value_codes: jax.Array,
    kpack: jax.Array,  # (d, 128) f32, replicated
    vpack: jax.Array,
    n_codes: jax.Array,  # () int32, replicated — GLOBAL valid token count
    *,
    block: int = 16384,
    interpret: bool | None = None,
    direct: bool = False,
    v_direct: bool | None = None,
    n_bucket: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out, lse) exactly like pq_codes_attention, but computed with
    the code arena sequence-sharded across the mesh's "sp" axis (and batch /
    KV heads sharded over "dp" / "tp").

    `n_bucket` is the GLOBAL scan bound (tokens, host-picked — see
    bucket_for_length); shards own contiguous token ranges filled in order,
    so each shard's valid count is at most min(n_bucket, n_local) and the
    local kernel scans that bound."""
    seq_axes = _seq_axes(mesh)
    n_shards = int(np.prod([mesh.shape[a] for a in seq_axes]))
    N = key_codes.shape[3] * 4  # tokens
    if key_codes.shape[3] % n_shards != 0:
        raise ValueError(
            f"arena words {key_codes.shape[3]} not divisible by "
            f"{'x'.join(seq_axes)}={n_shards}"
        )
    n_local = N // n_shards
    local_bucket = (
        None if n_bucket is None or n_bucket >= n_local else n_bucket
    )

    def local_fn(q, kc, vc, kp, vp, nc):
        i = _linear_shard_index(mesh, seq_axes)
        # tokens owned by this shard: [i*n_local, (i+1)*n_local)
        local_valid = jnp.clip(nc[0] - i * n_local, 0, n_local)
        out, lse = pq_codes_attention(
            q, kc, vc, kp, vp, local_valid,
            block=min(block, n_local), interpret=interpret, direct=direct,
            v_direct=v_direct, n_bucket=local_bucket,
        )
        merged, lse_m = _merge_over(out, lse, seq_axes)
        return merged, lse_m

    shmap = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P("dp", "tp", None, None),  # q
            P("dp", "tp", None, seq_axes),  # key codes
            P("dp", "tp", None, seq_axes),  # value codes
            P(),  # kpack
            P(),  # vpack
            P(),  # n_codes (1,)
        ),
        out_specs=(P("dp", "tp", None, None), P("dp", "tp", None)),
        check_vma=False,
    )
    return shmap(q, key_codes, value_codes, kpack, vpack, n_codes.reshape(1))


def sharded_pq_codes_attention_stacked(
    mesh: Mesh,
    q: jax.Array,  # (bs, nh_k, GROUP_PAD, d) bf16, pre-scaled
    key_codes: jax.Array,  # (L, bs, nh_k, M, N//4) int32 words, sharded over sp
    value_codes: jax.Array,
    kpack: jax.Array,  # (L, d, 128) f32, replicated
    vpack: jax.Array,
    layer: jax.Array,  # () int32
    n_codes: jax.Array,  # () int32 — GLOBAL valid token count
    *,
    block: int = 16384,
    interpret: bool | None = None,
    direct: bool = False,
    v_direct: bool | None = None,
    n_bucket: int | None = None,
    qo: jax.Array | None = None,  # (bs, nh_k, GROUP_PAD, OK) exact
    # outlier-channel q (pre-scaled, sliced to this layer's k_outlier_idx)
    k_outliers: jax.Array | None = None,  # (L, bs, nh_k, 4, OK, NW) bf16
    # byte-plane outlier arenas, sequence-sharded like the codes
    v_outliers: jax.Array | None = None,  # (L, bs, nh_k, 4, OV, NW)
) -> Tuple[jax.Array, ...]:
    """Stacked-arena version of sharded_pq_codes_attention: one layer of the
    (L, ...) arenas, sequence-sharded over sp, LSE-merged across shards.
    `n_bucket` is the GLOBAL scan bound (see sharded_pq_codes_attention).

    Outlier-channel mode (round 5, VERDICT r4 item 5): the byte-plane
    arenas shard over the SAME sequence axes as the codes; each shard's
    kernel folds its local corrections and the v-side co output rides the
    LSE-merge psum as extra channels. Returns (out, lse[, co])."""
    seq_axes = _seq_axes(mesh)
    n_shards = int(np.prod([mesh.shape[a] for a in seq_axes]))
    N = key_codes.shape[4] * 4  # tokens
    if key_codes.shape[4] % n_shards != 0:
        raise ValueError(
            f"arena words {key_codes.shape[4]} not divisible by "
            f"{'x'.join(seq_axes)}={n_shards}"
        )
    n_local = N // n_shards
    local_bucket = (
        None if n_bucket is None or n_bucket >= n_local else n_bucket
    )
    with_ko = k_outliers is not None
    with_vo = v_outliers is not None
    d = q.shape[-1]

    def local_fn(q, kc, vc, kp, vp, li, nc, *opt):
        okw = {}
        it = iter(opt)
        if with_ko:
            okw["qo"] = next(it)
            okw["k_outliers"] = next(it)
        if with_vo:
            okw["v_outliers"] = next(it)
        i = _linear_shard_index(mesh, seq_axes)
        local_valid = jnp.clip(nc[0] - i * n_local, 0, n_local)
        res = pq_codes_attention_stacked(
            q, kc, vc, kp, vp, li[0], local_valid,
            block=min(block, n_local), interpret=interpret, direct=direct,
            v_direct=v_direct, n_bucket=local_bucket, **okw,
        )
        if with_vo:
            out, lse, co = res
            out = jnp.concatenate([out, co], axis=-1)
        else:
            out, lse = res
        merged, lse_m = _merge_over(out, lse, seq_axes)
        if with_vo:
            return merged[..., :d], lse_m, merged[..., d:]
        return merged, lse_m

    in_specs = [
        P("dp", "tp", None, None),
        P(None, "dp", "tp", None, seq_axes),
        P(None, "dp", "tp", None, seq_axes),
        P(),
        P(),
        P(),
        P(),
    ]
    operands = [q, key_codes, value_codes, kpack, vpack,
                layer.reshape(1), n_codes.reshape(1)]
    if with_ko:
        in_specs += [P("dp", "tp", None, None),
                     P(None, "dp", "tp", None, None, seq_axes)]
        operands += [qo, k_outliers]
    if with_vo:
        in_specs.append(P(None, "dp", "tp", None, None, seq_axes))
        operands.append(v_outliers)
    out_specs = (
        (P("dp", "tp", None, None), P("dp", "tp", None),
         P("dp", "tp", None, None))
        if with_vo
        else (P("dp", "tp", None, None), P("dp", "tp", None))
    )
    shmap = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return shmap(*operands)
