"""Fused Pallas PQ encode: distance matmul + argmin without an HBM transient.

STATUS: kept as an A/B alternative, NOT the production default
(pq/ops.py RUNTIME_FUSED_ENCODE = False). Measured head-to-head on v5e
(2026-08-20, chained-bench, scratch/exp_encab.py): 19.1 ms/layer-side vs
the chunked jnp path's 12.0 ms at the 32K prefill shape (1.59x slower),
and ~2x slower at the decode flush shape. The design premise — that the
jnp path's (tokens, M, C) distance transient in HBM is the dominant cost —
turned out wrong: the chunked path bounds the transient, and the real
floor is the score computation itself, where the two paths diverge in the
kernel's favor only on paper. At d_m=2 this kernel's matmul pads the
contraction to K=8 sublanes and the MXU streams any k<128 pass at
full-k=128 rate (~1/16 utilization), while XLA lowers the jnp path's k=2
contraction to the VPU — n*M*C multiply-compares at full vector rate,
which is simply faster for narrow subspaces. (The kernel's economics
improve as d_m fills the pad, i.e. d_m >= 8 — quality-degenerate sweep
geometries, not production.) The reference's PyKeOps fused LazyTensor
argmin (pq_utils.py:451-499) solves a GPU-specific version of this
problem; on TPU the idiomatic answer is the chunked XLA formulation.

Design (per grid step (s, token-block b, subspace m)):

  scores = c_aug[m] @ x_aug[m, :, b]          (C, K) @ (K, TB) on the MXU
  codes  = argmax over the C sublanes         (1, TB), VPU reduce

with two layout tricks:

  1. ||c||^2 folds INTO the matmul: the d_m contraction axis is padded to
     K=8 sublanes anyway (a k=2 contraction would lower to the VPU — see
     pq/ops.py:105-108); TWO pad slots of c_aug carry ||c_mc||^2 split into
     bf16 hi/lo halves (~16 mantissa bits — a single bf16 slot loses ~0.4%
     of csq, enough to flip 6% of codes past genuine ties) and the matching
     x_aug rows are the constant -0.5, so
     score[c, t] = <x_t, c> - 0.5*||c||^2 = -0.5 * squared-L2 + const(t),
     making nearest-centroid = argMAX of one fused product. No separate
     c_sq broadcast, no subtraction pass.
  2. scores are computed TRANSPOSED (C on sublanes, tokens on lanes): the
     arg-reduction then lands as a (1, TB) row vector written straight to
     the (M, B) output block — no in-kernel transpose of the reduction
     result.

Ties resolve to the lowest code index (jnp.argmin semantics on distances).
HBM traffic = x read + codes write; the (C, TB) score tile lives and dies
in VMEM. (An earlier ~40 us/layer-side reading that motivated making this
the default was a tunnel-elision timing artifact — repeated identical
dispatches get elided by the remote runtime; the chained-bench numbers in
the STATUS paragraph supersede it.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from million_tpu.pq.ops import subspace_view

LANES = 128


def _encode_kernel(x_ref, c_ref, out_ref, *, prec):
    # x_ref (1, 1, K, TB); c_ref (1, 1, C, K); out_ref (1, 1, 1, 1, TB) i32
    scores = jax.lax.dot_general(
        c_ref[0, 0],
        x_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (C, TB) f32, never leaves VMEM
    C = scores.shape[0]
    mx = jnp.max(scores, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    idx = jnp.min(jnp.where(scores >= mx, iota, C), axis=0, keepdims=True)
    out_ref[0, 0, 0] = idx


@functools.partial(
    jax.jit, static_argnames=("layout", "tb", "interpret", "precision")
)
def pq_encode_fused_stacked(
    x: jax.Array,  # (S, ..., d) — one codebook bank per leading index
    cents: jax.Array,  # (S, M, C, d_m)
    layout: str = "contiguous",
    *,
    tb: int = 512,
    interpret: bool | None = None,
    precision: str = "fast",
) -> jax.Array:
    """Encode S banks in one kernel launch. Returns (S, ..., M) codes.

    The flush path uses S = num_layers (every layer's residual window, one
    launch per side); prefill uses S = 1. `precision` follows pq_encode:
    "fast" = bf16 operands / DEFAULT matmul (the runtime setting), "exact" =
    f32 / HIGHEST (test oracle; ties can still flip vs the jnp path's
    separate c_sq - 2ip rounding, so golden tests assert agreement + equal
    reconstruction error, not bit equality).
    """
    if precision == "fast":
        dt, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    elif precision == "exact":
        dt, prec = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        raise ValueError(f"unknown encode precision {precision!r}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    S, M, C, d_m = cents.shape
    if x.shape[0] != S:
        raise ValueError(f"x banks {x.shape[0]} != cents banks {S}")
    batch_shape = x.shape[1:-1]
    K = ((d_m + 2 + 7) // 8) * 8  # padded contraction: d_m dims + csq hi/lo

    xs = subspace_view(x.astype(jnp.float32), M, layout)  # (S, ..., M, d_m)
    B = 1
    for s in batch_shape:
        B *= s
    xs = xs.reshape(S, B, M, d_m)
    Bp = ((B + tb - 1) // tb) * tb

    # x_aug (S, M, K, Bp): contraction rows = subvector dims, then -0.5
    xt = jnp.transpose(xs, (0, 2, 3, 1)).astype(dt)  # (S, M, d_m, B)
    x_aug = jnp.zeros((S, M, K, Bp), dt)
    x_aug = jax.lax.dynamic_update_slice(x_aug, xt, (0, 0, 0, 0))
    x_aug = x_aug.at[:, :, d_m, :].set(jnp.asarray(-0.5, dt))
    x_aug = x_aug.at[:, :, d_m + 1, :].set(jnp.asarray(-0.5, dt))

    # c_aug (S, M, C, K): centroid dims, then ||c||^2 hi/lo in the matched
    # slots (csq itself in f32 from the rounded centroids, like pq_encode
    # "fast"; the hi/lo split keeps ~f32 precision through bf16 operands)
    cf = cents.astype(dt)
    csq = jnp.sum(
        cf.astype(jnp.float32) * cf.astype(jnp.float32), axis=-1
    )  # (S, M, C) f32
    hi = csq.astype(dt)
    lo = (csq - hi.astype(jnp.float32)).astype(dt)
    c_aug = jnp.zeros((S, M, C, K), dt)
    c_aug = jax.lax.dynamic_update_slice(c_aug, cf, (0, 0, 0, 0))
    c_aug = c_aug.at[:, :, :, d_m].set(hi)
    c_aug = c_aug.at[:, :, :, d_m + 1].set(lo)

    nB = Bp // tb
    grid = (S, nB, M)
    # out is (S, M, nB, 1, tb): the explicit singleton sublane dim lets the
    # compiled BlockSpec carry a (1, tb) row block (the last-two-dims rule
    # requires block dims divisible by (8, 128) or equal to the array dims)
    out = pl.pallas_call(
        functools.partial(_encode_kernel, prec=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, K, tb), lambda s, b, m: (s, m, 0, b)),
            pl.BlockSpec((1, 1, C, K), lambda s, b, m: (s, m, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 1, tb), lambda s, b, m: (s, m, b, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((S, M, nB, 1, tb), jnp.int32),
        interpret=interpret,
    )(x_aug, c_aug)

    out = out.reshape(S, M, Bp)
    codes = jnp.transpose(out[:, :, :B], (0, 2, 1))  # (S, B, M)
    codes = codes.reshape(S, *batch_shape, M)
    return codes.astype(jnp.uint8 if C <= 256 else jnp.int32)


def pq_encode_fused(
    x: jax.Array,  # (..., d)
    cents: jax.Array,  # (M, C, d_m)
    layout: str = "contiguous",
    *,
    tb: int = 512,
    interpret: bool | None = None,
    precision: str = "fast",
) -> jax.Array:
    """Single-codebook fused encode: (..., d) -> (..., M) codes."""
    return pq_encode_fused_stacked(
        x[None], cents[None], layout, tb=tb, interpret=interpret,
        precision=precision,
    )[0]
