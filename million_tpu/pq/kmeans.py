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
    pad = (-n) % chunk_n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    xc = xp.reshape(-1, chunk_n, x.shape[1])

    def one(xb):
        ip = jnp.matmul(xb, cents.T, precision=jax.lax.Precision.HIGHEST)
        return jnp.argmin(c_sq[None, :] - 2.0 * ip, axis=-1)

    return jax.lax.map(one, xc).reshape(-1)[:n]


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
    (pq_utils.py:600 cp.niter semantics / faiss default). chunk_n bounds
    assignment memory for large sample budgets (see _assign).
    """
    x = x.astype(jnp.float32)
    n = x.shape[0]
    cents0 = _kmeanspp_init(x, key, C)

    def body(it, cents):
        a = _assign(x, cents, chunk_n)
        cents_new, counts = _update(x, a, C)
        # keep old centroid where a cluster went empty, then re-seed
        cents_new = jnp.where((counts == 0)[:, None], cents, cents_new)
        return _split_empty(x, a, cents_new, counts)

    cents = jax.lax.fori_loop(0, iters, body, cents0)
    a = _assign(x, cents, chunk_n)
    inertia = jnp.sum((x - cents[a]) ** 2)
    return cents, inertia


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
    # bound the vmapped distance block (M, chunk_n, C) to ~256MB f32: XLA
    # schedules the lax.map body with double buffering and (at HIGHEST
    # precision) multi-pass matmul temporaries, so the live footprint is
    # several times the block — a 2GB block OOM'd a 16GB chip at C=2048
    chunk_n = 0
    if n * C * M > (1 << 28):
        chunk_n = max(512, (1 << 26) // (M * C) // 8 * 8)
    cents, _ = jax.vmap(lambda xm, km: kmeans(xm, km, C, iters, chunk_n))(xs, keys)
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
