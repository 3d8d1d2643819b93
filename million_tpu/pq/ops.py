"""Core product-quantization ops: encode, decode, LUT construction.

Semantics match the reference's torch implementation (sa_encode_4d /
sa_encode_4d_keops, pq_utils.py:410-499; sa_decode_4d, pq_utils.py:501-540;
the host-side LUT matmul, Interface.cu:48-51) but are expressed as pure jnp
functions over arbitrary leading batch dims, shaped for the TPU MXU: the
per-subspace distance computation is one batched matmul instead of a cdist /
LazyTensor reduction, and encode/decode are jit-friendly with static shapes.

Shape vocabulary (SURVEY.md table):
  d    head dim (e.g. 128)
  M    number of subspaces (e.g. 64)
  d_m  = d // M, subspace dim (e.g. 2)
  C    codebook size per subspace (e.g. 256 for nbits=8)
  cents: (M, C, d_m) codebook tensor, one C-entry codebook per subspace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def subspace_view(x: jax.Array, M: int, layout: str = "contiguous") -> jax.Array:
    """Reshape (..., d) -> (..., M, d_m); the PQ subspace split.

    layout "contiguous": subspace m owns dims [m*d_m, (m+1)*d_m) — the
        reference's split (pq_utils.py:429 view(bs,nh,n,M,d/M)).
    layout "strided": subspace m owns dims {m, m+M, m+2M, ...} — the
        TPU-native split: decoded component rows stack into a (d, n) tile
        without interleaving, and for d_m=2, M=d/2 each subspace is exactly
        a RoPE rotation pair (HF rotate_half couples dims (i, i+d/2)), so
        the rotationally-coupled dims share one codebook.
    """
    d = x.shape[-1]
    if d % M != 0:
        raise ValueError(f"head dim {d} not divisible by M={M}")
    d_m = d // M
    if layout == "contiguous":
        return x.reshape(*x.shape[:-1], M, d_m)
    elif layout == "strided":
        return jnp.swapaxes(x.reshape(*x.shape[:-1], d_m, M), -1, -2)
    raise ValueError(f"unknown subspace layout {layout!r}")


def merge_subspaces(xs: jax.Array, layout: str = "contiguous") -> jax.Array:
    """Inverse of subspace_view: (..., M, d_m) -> (..., d)."""
    M, d_m = xs.shape[-2], xs.shape[-1]
    if layout == "contiguous":
        return xs.reshape(*xs.shape[:-2], M * d_m)
    elif layout == "strided":
        return jnp.swapaxes(xs, -1, -2).reshape(*xs.shape[:-2], M * d_m)
    raise ValueError(f"unknown subspace layout {layout!r}")


# Runtime encode precision (prefill/flush/admission call sites). "fast"
# feeds the distance matmul bf16 inputs at DEFAULT precision: measured
# 3.5x faster than f32 HIGHEST on v5e (42.1 -> 11.9 ms/layer-side at the
# 32K bench shape) with 99.1% code agreement and IDENTICAL reconstruction
# MSE (0.020585 vs 0.020582 at the bench shape) — the ~1% flipped codes
# are genuine near-ties where either centroid reconstructs equally well.
# The matmul is the floor term here: the MXU streams a k<=128 pass at the
# same rate regardless of k, so HIGHEST's 6-pass f32 emulation dominated.
# "exact" (f32 HIGHEST) remains the oracle default: golden tests against
# the numpy argmin and the reference-semantics contract use it.
RUNTIME_ENCODE_PRECISION = "fast"

# Runtime encode implementation. The fused Pallas kernel
# (ops/pq_encode_pallas.py) computes the distance matmul and argmin in one
# VMEM-resident pass; it is kept as an A/B switch (golden tests pin both
# paths) but is NOT the default: isolated chained-bench A/B on v5e
# (2026-08-20, scratch/exp_encab.py + exp_flush.py) measured the fused
# kernel 1.59x SLOWER than the chunked jnp path at the 32K prefill shape
# (19.1 vs 12.0 ms/layer-side) and ~2x slower at the decode flush shape
# (all-layer flush 19.1 ms jnp; the fused-kernel flush step regressed the
# bench tail from 61 to 79 ms). Root cause: at d_m=2 the kernel's distance
# matmul pads the contraction to K=8 sublanes and the MXU streams any
# k<128 pass at full-k rate (1/16 utilization), while XLA lowers the jnp
# path's k=2 contraction to the VPU, which is FASTER for this shape — the
# (tokens, M, C) distance transient the kernel avoids was never the
# dominant term (the chunked path bounds it). The kernel could win only
# for wide-d_m geometries (d_m >= 8 fills more of the pad), which are
# quality-degenerate sweeps, not production.
RUNTIME_FUSED_ENCODE = False


def runtime_encode(
    x: jax.Array,
    cents: jax.Array,
    layout: str = "contiguous",
    interpret: bool | None = None,
) -> jax.Array:
    """Production encode for prefill/flush/admission call sites: fused
    Pallas kernel at RUNTIME_ENCODE_PRECISION, falling back to the chunked
    jnp path when RUNTIME_FUSED_ENCODE is off. Same contract as pq_encode:
    x (..., d), cents (M, C, d_m) -> (..., M) codes. `interpret` overrides
    the kernel's backend autodetection — pass True when tracing for a CPU
    mesh while an accelerator owns the default backend (the sharded call
    sites' pattern, models/llama.py)."""
    if RUNTIME_FUSED_ENCODE:
        from million_tpu.ops.pq_encode_pallas import pq_encode_fused

        return pq_encode_fused(
            x, cents, layout, precision=RUNTIME_ENCODE_PRECISION,
            interpret=interpret,
        )
    return pq_encode_chunked(
        x, cents, layout, precision=RUNTIME_ENCODE_PRECISION
    )


def pq_encode(
    x: jax.Array,
    cents: jax.Array,
    layout: str = "contiguous",
    batched_cents: bool = False,
    precision: str = "exact",
) -> jax.Array:
    """Nearest-centroid encode. x (..., d), cents (M, C, d_m) -> (..., M) uint8.

    Equivalent to the reference's sa_encode_4d_keops (pq_utils.py:451-499):
    per-subspace squared-L2 argmin over C centroids, computed in f32.
    Implemented as one batched matmul: argmin_c ||x_m||^2 - 2 x_m.c_mc +
    ||c_mc||^2 == argmin_c (||c_mc||^2 - 2 x_m.c_mc), which keeps the MXU fed
    and avoids materializing a (..., M, C, d_m) difference tensor.

    precision: "exact" — f32 HIGHEST matmul, codes match the numpy oracle
    bit-for-bit. "fast" — bf16 inputs at DEFAULT precision (see
    RUNTIME_ENCODE_PRECISION): 3.5x faster, ~1% near-tie code flips,
    reconstruction error unchanged; c_sq is computed from the SAME
    bf16-rounded centroids so the argmin objective stays consistent.

    batched_cents=True: cents (X, M, C, d_m) with x's LEADING axis a multiple
    of X, pairing x[i] with cents[i * X // x.shape[0]] — used to fuse the K
    and V encodes of a decode step into one argmin kernel (the per-call
    fixed cost dominates at decode shapes; measured ~0.8 ms/step at 3B).
    """
    if precision == "fast":
        mm_dtype, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    elif precision == "exact":
        mm_dtype, prec = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        raise ValueError(f"unknown encode precision {precision!r}")
    M = cents.shape[-3]
    xs = subspace_view(x.astype(jnp.float32), M, layout).astype(mm_dtype)
    c = cents.astype(mm_dtype)
    c_f = c.astype(jnp.float32)
    # The d_m axis is zero-padded to a full 8-sublane tile so XLA maps the
    # contraction onto the MXU: a bare k=2 contraction lowers to a VPU
    # fusion (measured 39.5 ms vs 2.5 ms per (8, 1024)-token chunk on v5e,
    # 16x, bit-identical codes).
    kpad = (-c.shape[-1]) % 8
    if kpad:
        xs_p = jnp.pad(xs, [(0, 0)] * (xs.ndim - 1) + [(0, kpad)])
        c_p = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, kpad)])
    else:
        xs_p, c_p = xs, c
    # The argmin runs in the dot_general's NATIVE output layout (C is
    # already minor; M is a leading batch/concat dim) and only the CODES
    # are transposed back: transposing the (rows, M, C) f32 distance
    # tensor first cost more HBM traffic than the matmul itself
    # (moveaxis of 1.65 GB vs 1.6 MB of uint8 codes at the 3B flush
    # shape — the flush-step tail's dominant term). Same argmin axis and
    # C ordering, so codes are BIT-IDENTICAL to the transposed form.
    C = c.shape[-2]
    if batched_cents:
        X = c.shape[0]
        g = x.shape[0] // X  # rows of x per cents bank
        xg = xs_p.reshape(X, g, *xs_p.shape[1:])  # (X, g, ..., M, k)
        ip = jax.lax.dot_general(
            xg, c_p,
            (((xg.ndim - 1,), (3,)), ((0, xg.ndim - 2), (0, 1))),
            precision=prec,
            preferred_element_type=jnp.float32,
        )  # (X, M, g, ..., C)
        c_sq = jnp.sum(c_f * c_f, axis=-1)  # (X, M, C)
        c_sq = c_sq.reshape(X, c.shape[1], *([1] * (ip.ndim - 3)), C)
        codes = jnp.argmin(c_sq - 2.0 * ip, axis=-1)  # (X, M, g, ...)
        codes = jnp.moveaxis(codes, 1, -1)  # (X, g, ..., M)
        codes = codes.reshape(*xs.shape[:-1])  # (..., M)
    else:
        ip = jax.lax.dot_general(
            xs_p, c_p,
            (((xs_p.ndim - 1,), (2,)), ((xs_p.ndim - 2,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32,
        )  # (M, ..., C)
        c_sq = jnp.sum(c_f * c_f, axis=-1)  # (M, C)
        c_sq = c_sq.reshape(c.shape[0], *([1] * (ip.ndim - 2)), C)
        codes = jnp.argmin(c_sq - 2.0 * ip, axis=-1)  # (M, ...)
        codes = jnp.moveaxis(codes, 0, -1)  # (..., M)
    return codes.astype(jnp.uint8 if cents.shape[-2] <= 256 else jnp.int32)


def pq_encode_chunked(
    x: jax.Array,  # (..., n, d) with tokens on axis -2
    cents: jax.Array,  # (M, C, d_m)
    layout: str = "contiguous",
    chunk: int = 1024,
    precision: str = "exact",
) -> jax.Array:
    """pq_encode over the token axis in bounded chunks.

    pq_encode materializes a (..., n, M, C) f32 distance tensor; at 32K-token
    prefill that is ~17 GB per layer side (OOM / 65+ ms of pure HBM traffic
    per layer). Chunking bounds the transient to (..., chunk, M, C) — the
    chunk loop is static under jit (prefill lengths are static)."""
    n = x.shape[-2]
    if n <= chunk:
        return pq_encode(x, cents, layout, precision=precision)
    parts = [
        pq_encode(
            jax.lax.slice_in_dim(x, s, min(s + chunk, n), axis=-2), cents,
            layout, precision=precision,
        )
        for s in range(0, n, chunk)
    ]
    return jnp.concatenate(parts, axis=-2)


def pq_decode(
    codes: jax.Array, cents: jax.Array, layout: str = "contiguous"
) -> jax.Array:
    """Reconstruct vectors from codes. codes (..., M), cents (M, C, d_m) -> (..., d).

    Equivalent to the reference's sa_decode_4d gather (pq_utils.py:501-540).
    """
    M, C, d_m = cents.shape
    batch_shape = codes.shape[:-1]
    idx = codes.astype(jnp.int32).reshape(-1, M)  # (B, M)
    # out[b, m, :] = cents[m, codes[b, m], :]
    gathered = cents[jnp.arange(M)[None, :], idx]  # (B, M, d_m)
    merged = merge_subspaces(gathered, layout)  # (B, d)
    return merged.reshape(*batch_shape, M * d_m).astype(cents.dtype)


def build_lut(q: jax.Array, cents: jax.Array, layout: str = "contiguous") -> jax.Array:
    """Asymmetric-distance (inner-product) lookup table.

    q (..., d), cents (M, C, d_m) -> lut (..., M, C) with
    lut[..., m, c] = <q_m, cents[m, c]>.

    This is the host-side "simple matmul" of the reference
    (Interface.cu:48-51) — tiny (M*C*d_m flops per query) and done in f32.
    The fused decode kernel then evaluates scores as
    s[n] = sum_m lut[m, key_codes[n, m]].
    """
    M = cents.shape[0]
    qs = subspace_view(q.astype(jnp.float32), M, layout)
    return jnp.einsum(
        "...mk,mck->...mc",
        qs,
        cents.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


def lut_scores(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """Evaluate PQ scores through the LUT.

    lut (..., M, C), codes (..., n, M) -> scores (..., n) with
    s[..., n] = sum_m lut[..., m, codes[..., n, m]].

    Batch dims of `lut` and `codes` must broadcast. This is the jnp oracle
    for the Pallas kernel's gather phase (reference Kernel.cuh:89-106).
    """
    M, C = lut.shape[-2], lut.shape[-1]
    flat_lut = lut.reshape(*lut.shape[:-2], M * C)  # (..., M*C)
    offs = jnp.arange(M, dtype=jnp.int32) * C
    idx = codes.astype(jnp.int32) + offs  # (..., n, M)
    gathered = jnp.take_along_axis(
        flat_lut[..., None, :], idx, axis=-1
    )  # (..., n, M)
    return jnp.sum(gathered, axis=-1)


# ---------------------------------------------------------------------------
# Outlier-channel high precision (the north star's "outlier channels kept
# in high precision", BASELINE.json): channels whose magnitude dominates a
# coarse subspace's centroid budget are excluded from PQ (zeroed before
# training/encoding) and stored exactly alongside the codes. This is what
# rescues the kernel-fast V d_m=4 geometry: the reference gets outlier
# immunity from k-means non-uniformity + the residual window alone
# (pq_utils.py:110,127-135), which suffices at d_m=2 but not at d_m=4
# (quality ladder: +1.83 Δppl vs +0.47 symmetric at round-2 scale).
# ---------------------------------------------------------------------------

def select_outlier_channels(samples: jax.Array, k: int) -> jax.Array:
    """Pick the k channels PQ hurts most: ranked by mean-square magnitude
    (heavy channels dominate the L2 objective inside their subspace and
    drag centroids away from the bulk). samples (n, d) -> (k,) int32,
    sorted ascending for deterministic layouts."""
    energy = jnp.mean(jnp.square(samples.astype(jnp.float32)), axis=0)  # (d,)
    _, idx = jax.lax.top_k(energy, k)
    return jnp.sort(idx.astype(jnp.int32))


def zero_channels(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Zero channels idx (k,) of x (..., d) — the PQ-side view of
    outlier-split vectors (codebooks then spend no centroid mass on them)."""
    d = x.shape[-1]
    mask = jnp.zeros((d,), bool).at[idx].set(True)
    return jnp.where(mask, 0, x)


def restore_channels(x_hat: jax.Array, x_exact: jax.Array, idx: jax.Array) -> jax.Array:
    """Overwrite channels idx of the reconstruction x_hat with their exact
    values from x_exact (same trailing shape)."""
    d = x_hat.shape[-1]
    mask = jnp.zeros((d,), bool).at[idx].set(True)
    return jnp.where(mask, x_exact.astype(x_hat.dtype), x_hat)
