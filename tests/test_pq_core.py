"""Golden tests for PQ encode/decode/LUT vs a plain numpy reference.

Analogue of the reference's kernel-vs-sa_decode checks
(bindings/test_kernel.py:86-97), but as a real pytest suite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.pq import ops as pq
from million_tpu.pq.kmeans import train_pq, kmeans


def np_encode(x, cents):
    n, d = x.shape
    M, C, d_m = cents.shape
    xs = x.reshape(n, M, d_m)
    codes = np.empty((n, M), np.int64)
    for m in range(M):
        d2 = ((xs[:, m, None, :] - cents[m][None]) ** 2).sum(-1)
        codes[:, m] = d2.argmin(-1)
    return codes


def np_decode(codes, cents):
    n, M = codes.shape
    _, C, d_m = cents.shape
    out = np.empty((n, M * d_m), np.float32)
    for m in range(M):
        out[:, m * d_m : (m + 1) * d_m] = cents[m, codes[:, m]]
    return out


@pytest.mark.parametrize("d,M,C", [(32, 16, 16), (64, 32, 256), (128, 64, 256)])
def test_encode_matches_numpy(rng, d, M, C):
    n = 200
    x = rng.standard_normal((n, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    got = np.asarray(pq.pq_encode(jnp.asarray(x), jnp.asarray(cents)))
    want = np_encode(x, cents)
    assert (got.astype(np.int64) == want).mean() > 0.999  # ties may differ


def test_encode_batch_dims(rng):
    bs, nh, n, d, M, C = 2, 3, 17, 32, 16, 64
    x = rng.standard_normal((bs, nh, n, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    got = np.asarray(pq.pq_encode(jnp.asarray(x), jnp.asarray(cents)))
    assert got.shape == (bs, nh, n, M)
    flat = np_encode(x.reshape(-1, d), cents).reshape(bs, nh, n, M)
    assert (got.astype(np.int64) == flat).mean() > 0.999


def test_decode_matches_numpy(rng):
    n, d, M, C = 100, 64, 32, 256
    codes = rng.integers(0, C, (n, M)).astype(np.uint8)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    got = np.asarray(pq.pq_decode(jnp.asarray(codes), jnp.asarray(cents)))
    np.testing.assert_allclose(got, np_decode(codes.astype(np.int64), cents), rtol=1e-6)


def test_roundtrip_on_codebook_points(rng):
    """Encoding exact centroid points must reconstruct exactly."""
    d, M, C = 64, 32, 16
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    codes = rng.integers(0, C, (50, M)).astype(np.uint8)
    x = np_decode(codes.astype(np.int64), cents)
    codes2 = np.asarray(pq.pq_encode(jnp.asarray(x), jnp.asarray(cents)))
    x2 = np.asarray(pq.pq_decode(jnp.asarray(codes2), jnp.asarray(cents)))
    np.testing.assert_allclose(x2, x, atol=1e-5)


def test_lut_scores_match_decoded_dot(rng):
    """sum_m lut[m, code_m] == <q, decode(code)> (the PQ identity)."""
    bs, nh, n, d, M, C = 1, 2, 33, 64, 32, 256
    q = rng.standard_normal((bs, nh, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    codes = rng.integers(0, C, (bs, nh, n, M)).astype(np.uint8)
    lut = pq.build_lut(jnp.asarray(q), jnp.asarray(cents))
    s = np.asarray(pq.lut_scores(lut, jnp.asarray(codes)))
    khat = np.asarray(pq.pq_decode(jnp.asarray(codes), jnp.asarray(cents)))
    want = np.einsum("bhk,bhnk->bhn", q, khat)
    np.testing.assert_allclose(s, want, rtol=1e-4, atol=1e-4)


def test_kmeans_clusters_separated_data(rng):
    """k-means must recover well-separated cluster centers."""
    C, k = 8, 4
    true = rng.standard_normal((C, k)).astype(np.float32) * 20
    x = np.concatenate([true[i] + 0.01 * rng.standard_normal((50, k)) for i in range(C)])
    x = x.astype(np.float32)
    cents, inertia = kmeans(jnp.asarray(x), jax.random.PRNGKey(0), C, iters=25)
    cents = np.asarray(cents)
    # every true center has a learned centroid within 0.1
    d2 = ((true[:, None] - cents[None]) ** 2).sum(-1)
    assert (d2.min(1) < 0.1).all()
    assert float(inertia) < 1.0


def test_train_pq_reconstruction_beats_random(rng):
    n, d, M, nbits = 2048, 32, 16, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    cents = train_pq(jnp.asarray(x), M=M, nbits=nbits, iters=10)
    assert cents.shape == (M, 2**nbits, d // M)
    codes = pq.pq_encode(jnp.asarray(x), cents)
    xhat = np.asarray(pq.pq_decode(codes, cents))
    err = ((xhat - x) ** 2).mean()
    rand_cents = jnp.asarray(rng.standard_normal((M, 2**nbits, d // M)), dtype=jnp.float32)
    rand_codes = pq.pq_encode(jnp.asarray(x), rand_cents)
    rand_err = ((np.asarray(pq.pq_decode(rand_codes, rand_cents)) - x) ** 2).mean()
    # On isotropic gaussian data random codebooks (same distribution) are a
    # decent quantizer, so the trained margin is modest; structured-data
    # quality is covered by test_kmeans_clusters_separated_data.
    assert err < 0.65 * rand_err


def test_train_pq_empty_cluster_robust(rng):
    """Degenerate data (many duplicate points) must not produce NaNs."""
    n, d, M, nbits = 600, 16, 8, 4
    x = np.repeat(rng.standard_normal((10, d)).astype(np.float32), 60, axis=0)
    cents = train_pq(jnp.asarray(x), M=M, nbits=nbits, iters=5)
    assert np.isfinite(np.asarray(cents)).all()


def test_train_opq_improves_reconstruction(rng):
    """OPQ must (a) produce an orthogonal rotation and (b) beat plain PQ's
    reconstruction error on correlated data (where rotation matters) —
    the reference's faiss.OPQMatrix semantics (pq_utils.py:554-584)."""
    import jax.numpy as jnp
    from million_tpu.pq.kmeans import train_pq, train_opq
    from million_tpu.pq.ops import pq_encode, pq_decode

    # strongly correlated dims: random covariance with decaying spectrum
    n, d = 2048, 16
    A = rng.standard_normal((d, d)).astype(np.float32)
    scales = np.logspace(0, -1.2, d).astype(np.float32)
    X = (rng.standard_normal((n, d)).astype(np.float32) * scales) @ A
    Xj = jnp.asarray(X)

    M, nbits = 8, 4
    cents_pq = train_pq(Xj, M, nbits, iters=15)
    err_pq = float(jnp.mean((pq_decode(pq_encode(Xj, cents_pq), cents_pq) - Xj) ** 2))

    R, cents_opq = train_opq(Xj, M, nbits, iters=15, opq_iters=6)
    # R orthogonal
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(d), atol=1e-4)
    Xr = Xj @ R
    rec = pq_decode(pq_encode(Xr, cents_opq), cents_opq) @ R.T
    err_opq = float(jnp.mean((rec - Xj) ** 2))
    assert err_opq < err_pq * 0.95, f"OPQ {err_opq} not better than PQ {err_pq}"


def test_opq_preserves_inner_products(rng):
    """Rotation invariance: q.k == (qR).(kR) — the property that lets the
    attention kernel run unchanged on OPQ-rotated codes."""
    import jax.numpy as jnp
    from million_tpu.pq.kmeans import train_opq

    X = jnp.asarray(rng.standard_normal((512, 16)).astype(np.float32))
    R, _ = train_opq(X, M=8, nbits=3, iters=5, opq_iters=2)
    q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jnp.sum(q * k, -1)),
        np.asarray(jnp.sum((q @ R) * (k @ R), -1)),
        rtol=1e-4, atol=1e-4,
    )


def test_pq_encode_chunked_matches_unchunked(rng):
    import jax.numpy as jnp
    from million_tpu.pq.ops import pq_encode, pq_encode_chunked

    x = jnp.asarray(rng.standard_normal((2, 3, 50, 16)), jnp.float32)
    cents = jnp.asarray(rng.standard_normal((8, 32, 2)), jnp.float32)
    a = pq_encode(x, cents, "strided")
    b = pq_encode_chunked(x, cents, "strided", chunk=16)
    import numpy as np

    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_outlier_channels_improve_reconstruction(rng):
    """Outlier-channel split (north star): zero-before-train + exact
    restore must beat plain PQ reconstruction on data with heavy channels,
    and the selection must find the heavy channels."""
    import jax.numpy as jnp
    from million_tpu.pq.kmeans import train_pq
    from million_tpu.pq.ops import (
        pq_decode,
        pq_encode,
        restore_channels,
        select_outlier_channels,
        zero_channels,
    )

    n, d = 4096, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    heavy = [3, 11]
    x[:, heavy] *= 12.0  # dominant channels break a d_m=4 subspace budget
    xj = jnp.asarray(x)

    idx = select_outlier_channels(xj, 2)
    assert sorted(np.asarray(idx).tolist()) == heavy

    M, nbits = 4, 5  # d_m=4, coarse: outliers must hurt
    c_plain = train_pq(xj, M=M, nbits=nbits, iters=10, layout="strided")
    xhat_plain = pq_decode(pq_encode(xj, c_plain, "strided"), c_plain, "strided")
    mse_plain = float(jnp.mean((xhat_plain - xj) ** 2))

    xz = zero_channels(xj, idx)
    c_o = train_pq(xz, M=M, nbits=nbits, iters=10, layout="strided")
    xhat_o = pq_decode(pq_encode(xz, c_o, "strided"), c_o, "strided")
    xhat_o = restore_channels(xhat_o, xj, idx)
    mse_o = float(jnp.mean((xhat_o - xj) ** 2))

    assert mse_o < 0.5 * mse_plain, (mse_plain, mse_o)
    # restored channels are bit-exact
    np.testing.assert_array_equal(
        np.asarray(xhat_o[:, np.asarray(idx)]), x[:, heavy]
    )
