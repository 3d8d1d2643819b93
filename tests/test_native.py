"""Native C++ PQ library vs the JAX implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from million_tpu import native
from million_tpu.pq import ops as pq
from million_tpu.pq.kmeans import train_pq

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def test_native_encode_matches_jax(rng):
    n, d, M, C = 500, 32, 16, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    got = native.encode_native(x, cents)
    want = np.asarray(pq.pq_encode(jnp.asarray(x), jnp.asarray(cents)))
    assert (got == want).mean() > 0.999  # fp tie-breaks may differ


def test_native_encode_strided_layout(rng):
    n, d, M, C = 200, 32, 16, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    got = native.encode_native(x, cents, layout="strided")
    want = np.asarray(pq.pq_encode(jnp.asarray(x), jnp.asarray(cents), "strided"))
    assert (got == want).mean() > 0.999


def test_native_train_quality(rng):
    """Native trainer must reach reconstruction error comparable to the JAX
    trainer (both k-means++ + Lloyd; different RNG streams)."""
    n, d, M, nbits = 3000, 32, 16, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    c_native = native.train_pq_native(x, M=M, nbits=nbits, iters=12)
    c_jax = np.asarray(train_pq(jnp.asarray(x), M=M, nbits=nbits, iters=12))

    def recon_err(cents):
        codes = native.encode_native(x, cents)
        xhat = np.asarray(pq.pq_decode(jnp.asarray(codes), jnp.asarray(cents)))
        return ((xhat - x) ** 2).mean()

    e_native, e_jax = recon_err(c_native), recon_err(c_jax)
    assert np.isfinite(c_native).all()
    assert e_native < 1.3 * e_jax, (e_native, e_jax)


def test_native_train_rejects_bad_args(rng):
    x = rng.standard_normal((10, 32)).astype(np.float32)
    with pytest.raises(ValueError):
        native.train_pq_native(x, M=16, nbits=8)  # n < C
