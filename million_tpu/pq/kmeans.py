"""Product-quantizer codebook training: vmapped Lloyd k-means in JAX.

Replaces the reference's faiss dependency (train_pq, pq_utils.py:586-609:
faiss.IndexPQ with 25 k-means iterations producing (M, 2^nbits, d/M)
centroids). Design differences, deliberately TPU/JAX-idiomatic:

  * all M subspaces train simultaneously via vmap (faiss trains them
    serially on CPU threads);
  * Lloyd updates are batched matmul assign + segment-sum update, so the
    whole trainer jits and runs on accelerator;
  * empty clusters are re-seeded by splitting the most populated cluster
    with a small deterministic perturbation (faiss does the same with
    random signs, Clustering.cpp split_clusters semantics);
  * initialization samples C distinct training points per subspace
    (faiss default init).

Matching faiss bit-for-bit is impossible and unnecessary; what matters
(SURVEY.md §6 hard part (d)) is reconstruction error / downstream ppl
parity, which the regression tests pin.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _assign(x: jax.Array, cents: jax.Array, chunk_n: int = 0) -> jax.Array:
    """x (n, k), cents (C, k) -> (n,) index of nearest centroid (L2).

    chunk_n > 0 bounds the materialized distance block to (chunk_n, C)
    instead of (n, C) — required at the reference's codebook sample budget
    (256 * 2^nbits rows, main_pq.py:197: n=1M at nbits=12 would need a
    16 GB distance matrix per subspace). Chunks run under lax.map, which
    stays sequential under the train_pq vmap over subspaces.
    """
    c_sq = jnp.sum(cents * cents, axis=-1)
    n = x.shape[0]
    if chunk_n <= 0 or n <= chunk_n:
        ip = jnp.matmul(x, cents.T, precision=jax.lax.Precision.HIGHEST)
        return jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=-1)
    # fori_loop + dynamic_slice, NOT reshape+lax.map: reshaping (n, d_m)
    # to (nb, chunk, d_m) under the train_pq vmap makes XLA materialize a
    # relayout copy tiled T(8,128) over the tiny minor dim — 64x padding,
    # 16 GB at the nbits=12 sample budget (observed OOM).
    pad = (-n) % chunk_n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    def body(i, out):
        xb = jax.lax.dynamic_slice_in_dim(xp, i * chunk_n, chunk_n, 0)
        ip = jnp.matmul(xb, cents.T, precision=jax.lax.Precision.HIGHEST)
        a = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=-1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(out, a, i * chunk_n, 0)

    out = jnp.zeros((n + pad,), jnp.int32)
    return jax.lax.fori_loop(0, (n + pad) // chunk_n, body, out)[:n]


def _update(x: jax.Array, assign: jax.Array, C: int) -> Tuple[jax.Array, jax.Array]:
    """Mean of assigned points per cluster; returns (centroids, counts)."""
    counts = jnp.zeros((C,), jnp.float32).at[assign].add(1.0)
    sums = jnp.zeros((C, x.shape[-1]), jnp.float32).at[assign].add(x)
    return sums / jnp.maximum(counts, 1.0)[:, None], counts


def _split_empty(x, assign, cents, counts):
    """Re-seed empty clusters at the data points worst served by the current
    centroids (largest distance to their assigned centroid) — the
    deterministic analogue of faiss's split_clusters, but stronger: a
    far-away under-covered region is claimed immediately instead of waiting
    for a perturbed duplicate centroid to drift there."""
    C = cents.shape[0]
    d2 = jnp.sum((x - cents[assign]) ** 2, axis=-1)  # (n,)
    _, order = jax.lax.top_k(d2, C)  # worst-served points (O(n log C), not a full sort)
    donors = x[order]  # (C, k)
    empty = counts == 0
    rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # slot among empties
    donor_for_slot = donors[jnp.clip(rank, 0, C - 1)]
    return jnp.where(empty[:, None], donor_for_slot, cents)


def _kmeanspp_init(x: jax.Array, key: jax.Array, C: int) -> jax.Array:
    """k-means++ (D^2-sampling) initialization.

    Random init loses whole clusters on well-separated data (Lloyd cannot
    migrate a duplicated centroid across a void, and empty-cluster
    re-seeding never fires for non-empty duplicates); D^2 sampling covers
    the support, which is also what gives PQ codebooks their outlier
    coverage — outlying KV directions get centroids with high probability.
    """
    n = x.shape[0]
    # D^2-sample on an evenly-strided subset when n is huge: init cost is
    # a C-step sequential scan over all points, and coverage from 128K
    # spread-out points matches full-set coverage for k-means++ purposes
    # (Lloyd then runs on the FULL set).
    init_cap = 1 << 17
    if n > init_cap:
        stride = n // init_cap
        x = x[:: stride][:init_cap]
        n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    min_d2 = jnp.sum((x - first) ** 2, axis=-1)

    def pick(carry, k):
        min_d2, = carry
        idx = jax.random.categorical(k, jnp.log(jnp.maximum(min_d2, 1e-30)))
        c = x[idx]
        min_d2 = jnp.minimum(min_d2, jnp.sum((x - c) ** 2, axis=-1))
        return (min_d2,), c

    (_,), rest = jax.lax.scan(pick, (min_d2,), jax.random.split(key, C - 1))
    return jnp.concatenate([first[None], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("C", "iters", "chunk_n"))
def kmeans(
    x: jax.Array, key: jax.Array, C: int, iters: int = 25, chunk_n: int = 0
) -> Tuple[jax.Array, jax.Array]:
    """Single-subspace k-means. x (n, k) f32 -> (centroids (C, k), inertia).

    25 iterations by default, matching faiss's niter in the reference
    (pq_utils.py:600 cp.niter semantics / faiss default).

    chunk_n > 0 selects the large-n path: Lloyd statistics (counts, sums)
    accumulate per chunk inside a fori_loop, so no (n,)-assignment vector,
    no (n, C) distance matrix, and — critically — no op ever consumes the
    full (n, d_m) array in a padded layout: a gather/scatter over the
    2-wide rows made XLA materialize a T(8,128) relayout copy of the
    sample set — 64x padding, 16 GB at the nbits=12 budget (observed
    OOM). Empty-cluster donors come from an evenly-strided subsample
    (same coverage argument as the k-means++ init cap).
    """
    x = x.astype(jnp.float32)
    n = x.shape[0]
    cents0 = _kmeanspp_init(x, key, C)

    if chunk_n <= 0 or n <= chunk_n:
        def body(it, cents):
            a = _assign(x, cents)
            cents_new, counts = _update(x, a, C)
            # keep old centroid where a cluster went empty, then re-seed
            cents_new = jnp.where((counts == 0)[:, None], cents, cents_new)
            return _split_empty(x, a, cents_new, counts)

        cents = jax.lax.fori_loop(0, iters, body, cents0)
        a = _assign(x, cents)
        inertia = jnp.sum((x - cents[a]) ** 2)
        return cents, inertia

    # ---------------- large-n fused-chunk path ----------------
    def body(it, cents):
        return _lloyd_iter_large(x, x, cents, n=n, C=C, chunk_n=chunk_n)

    cents = jax.lax.fori_loop(0, iters, body, cents0)
    inertia = _inertia_large(x, cents, n=n, chunk_n=chunk_n)
    return cents, inertia


def _pad_rows(x, chunk_n):
    pad = (-x.shape[0]) % chunk_n
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


@functools.partial(jax.jit, static_argnames=("n", "C", "chunk_n"))
def _lloyd_iter_large(
    x: jax.Array,      # (n_any >= n, k) — rows past n are padding
    x_sub: jax.Array,  # (ns, k) evenly-strided subsample (donor pool)
    cents: jax.Array,  # (C, k)
    *,
    n: int,
    C: int,
    chunk_n: int,
) -> jax.Array:
    """One Lloyd iteration for the large-n regime. Counts/sums accumulate
    per chunk inside a fori_loop, so no (n,) assignment vector, no (n, C)
    distance matrix, and no op ever consumes the full (n, d_m) array in a
    padded layout (a gather/scatter over the 2-wide rows made XLA
    materialize a T(8,128) relayout copy of the sample set — 64x padding,
    16 GB at the nbits=12 budget; observed OOM). Empty clusters re-seed at
    the SUBSAMPLE's worst-served points (same coverage argument as the
    k-means++ init cap). train_pq drives the iterations from the host —
    25 chunked iterations in one XLA program exceeded the remote runtime's
    execution window at the 1M x C=4096 shape (worker killed mid-run).
    """
    k = x.shape[1]
    xp = _pad_rows(x, chunk_n)
    nb = xp.shape[0] // chunk_n
    x_sub_p = _pad_rows(x_sub, chunk_n)
    ns = x_sub.shape[0]
    nsb = x_sub_p.shape[0] // chunk_n
    c_sq = jnp.sum(cents * cents, axis=-1)

    def stats_body(i, carry):
        counts, sums = carry
        xb = jax.lax.dynamic_slice_in_dim(xp, i * chunk_n, chunk_n, 0)
        ip = jnp.matmul(xb, cents.T, precision=jax.lax.Precision.HIGHEST)
        a = jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=-1)
        w = ((i * chunk_n + jnp.arange(chunk_n)) < n).astype(jnp.float32)
        return counts.at[a].add(w), sums.at[a].add(xb * w[:, None])

    counts, sums = jax.lax.fori_loop(
        0, nb, stats_body,
        (jnp.zeros((C,), jnp.float32), jnp.zeros((C, k), jnp.float32)),
    )
    cents_new = sums / jnp.maximum(counts, 1.0)[:, None]
    cents_new = jnp.where((counts == 0)[:, None], cents, cents_new)

    # subsample min-distances (chunked: (ns, C) whole would be GBs at
    # C=4096 under the train_pq vmap)
    cn_sq = jnp.sum(cents_new * cents_new, axis=-1)

    def d2_body(i, out):
        xb = jax.lax.dynamic_slice_in_dim(x_sub_p, i * chunk_n, chunk_n, 0)
        ip = jnp.matmul(xb, cents_new.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(xb * xb, -1) + jnp.min(cn_sq[None, :] - 2.0 * ip, -1)
        return jax.lax.dynamic_update_slice_in_dim(out, d2, i * chunk_n, 0)

    d2 = jax.lax.fori_loop(
        0, nsb, d2_body, jnp.full((x_sub_p.shape[0],), -1.0, jnp.float32)
    )[:ns]
    _, order = jax.lax.top_k(d2, min(C, ns))
    donors = x_sub[order]
    if donors.shape[0] < C:
        donors = jnp.pad(donors, ((0, C - donors.shape[0]), (0, 0)))
    empty = counts == 0
    rank = jnp.cumsum(empty.astype(jnp.int32)) - 1
    donor_for_slot = donors[jnp.clip(rank, 0, C - 1)]
    return jnp.where(empty[:, None], donor_for_slot, cents_new)


@functools.partial(jax.jit, static_argnames=("n", "chunk_n"))
def _inertia_large(x, cents, *, n: int, chunk_n: int):
    xp = _pad_rows(x, chunk_n)
    nb = xp.shape[0] // chunk_n
    c_sq = jnp.sum(cents * cents, axis=-1)

    def body(i, acc):
        xb = jax.lax.dynamic_slice_in_dim(xp, i * chunk_n, chunk_n, 0)
        ip = jnp.matmul(xb, cents.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(xb * xb, axis=-1) + jnp.min(c_sq[None, :] - 2.0 * ip, axis=-1)
        valid = (i * chunk_n + jnp.arange(chunk_n)) < n
        return acc + jnp.sum(jnp.where(valid, d2, 0.0))

    return jax.lax.fori_loop(0, nb, body, jnp.zeros((), jnp.float32))


def train_pq(
    samples: jax.Array,
    M: int,
    nbits: int = 8,
    iters: int = 25,
    seed: int = 0,
    layout: str = "contiguous",
) -> jax.Array:
    """Train the PQ codebook. samples (n, d) -> cents (M, C=2^nbits, d/M) f32.

    Functional equivalent of the reference's train_pq (pq_utils.py:586-609),
    which feeds faiss.IndexPQ and reads back pq.centroids reshaped to
    (M, 2^nbits, d/M). All subspaces train in parallel under vmap.
    """
    n, d = samples.shape
    if d % M != 0:
        raise ValueError(f"d={d} not divisible by M={M}")
    C = 2**nbits
    if n < C:
        raise ValueError(f"need at least C={C} samples, got {n}")
    from million_tpu.pq.ops import subspace_view

    xs = subspace_view(samples.astype(jnp.float32), M, layout).transpose(1, 0, 2)  # (M, n, d_m)
    keys = jax.random.split(jax.random.PRNGKey(seed), M)
    if n * C * M <= (1 << 28):
        cents, _ = jax.vmap(lambda xm, km: kmeans(xm, km, C, iters))(xs, keys)
        return cents  # (M, C, d_m)

    # Large-n regime (the reference's 256*2^nbits budgets at nbits >= 11):
    # chunked Lloyd iterations driven from the HOST — one jitted vmapped
    # iteration per call. A single program with all 25 iterations at the
    # 1M x C=4096 shape exceeded the remote runtime's execution window
    # (worker killed); per-iteration programs run ~seconds each. The
    # chunk bounds the vmapped distance block (M, chunk_n, C) to ~512MB.
    chunk_n = max(512, (1 << 27) // (M * C) // 8 * 8)
    sub_cap = 1 << 17
    xs_sub = xs[:, :: max(n // sub_cap, 1)][:, :sub_cap] if n > sub_cap else xs
    init = jax.jit(
        jax.vmap(lambda xm, km: _kmeanspp_init(xm, km, C)),
        static_argnames=(),
    )
    cents = init(xs, keys)
    step = jax.jit(jax.vmap(
        lambda xm, xsub, c: _lloyd_iter_large(
            xm, xsub, c, n=n, C=C, chunk_n=chunk_n
        )
    ))
    for _ in range(iters):
        cents = step(xs, xs_sub, cents)
    return cents  # (M, C, d_m)


def train_opq(
    samples: jax.Array,
    M: int,
    nbits: int = 8,
    iters: int = 25,
    opq_iters: int = 10,
    seed: int = 0,
    layout: str = "contiguous",
) -> Tuple[jax.Array, jax.Array]:
    """Optimized Product Quantization: learn a rotation R that minimizes the
    PQ reconstruction error of X @ R, then codebooks on the rotated data.

    Functional equivalent of the reference's train_opq (pq_utils.py:554-584:
    faiss.OPQMatrix + IndexPQ — which the reference CLI rejects at
    main_pq.py:67-68; here the trainer is fully wired). Algorithm is OPQ-NP
    (Ge et al., CVPR'13), the same non-parametric alternation faiss uses:

        repeat: train PQ on X @ R  ->  X_hat = decode(encode(X @ R))
                R <- argmin_R ||X R - X_hat||_F   (orthogonal Procrustes:
                R = U V^T from SVD(X^T X_hat))

    Returns (R (d, d) f32, cents (M, 2^nbits, d/M) f32). Encode with
    pq_encode(x @ R, cents, layout); reconstruct with
    pq_decode(codes, cents, layout) @ R.T. R orthogonal means inner
    products are preserved: q.K == (q R).(K R), so attention kernels run
    unchanged on rotated codes with a rotated query.
    """
    from million_tpu.pq.ops import pq_encode, pq_decode

    X = samples.astype(jnp.float32)
    n, d = X.shape
    R = jnp.eye(d, dtype=jnp.float32)
    # cheap inner PQ during alternation; full-strength final train below
    inner_iters = max(4, iters // 4)
    for it in range(opq_iters):
        cents = train_pq(X @ R, M, nbits, iters=inner_iters, seed=seed + it, layout=layout)
        codes = pq_encode(X @ R, cents, layout)
        X_hat = pq_decode(codes, cents, layout)
        # orthogonal Procrustes: min_R ||X R - X_hat||, R^T R = I
        u, _, vt = jnp.linalg.svd(X.T @ X_hat, full_matrices=False)
        R = u @ vt
    cents = train_pq(X @ R, M, nbits, iters=iters, seed=seed, layout=layout)
    return R, cents
