"""Fused Pallas encode vs the jnp/numpy oracle (interpret mode).

The fused kernel computes argmax of <x,c> - 0.5||c||^2 in one MXU pass;
the jnp path computes argmin of ||c||^2 - 2<x,c> with a separate c_sq
subtraction. Same objective, different rounding order — golden tests assert
(a) near-total code agreement, (b) disagreeing codes are genuine near-ties
(equal reconstruction error), (c) exact equality on integer-valued inputs
where no rounding exists.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.ops.pq_encode_pallas import (
    pq_encode_fused,
    pq_encode_fused_stacked,
)
from million_tpu.pq.ops import pq_decode, pq_encode


@pytest.mark.parametrize("layout", ["contiguous", "strided"])
@pytest.mark.parametrize("d_m", [2, 4])
def test_fused_encode_matches_oracle(rng, layout, d_m):
    d, C = 32, 256
    M = d // d_m
    x = rng.standard_normal((3, 2, 100, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d_m)).astype(np.float32)
    got = np.asarray(
        pq_encode_fused(
            jnp.asarray(x), jnp.asarray(cents), layout,
            interpret=True, precision="exact",
        )
    )
    want = np.asarray(
        pq_encode(jnp.asarray(x), jnp.asarray(cents), layout, precision="exact")
    )
    assert got.shape == want.shape and got.dtype == np.uint8
    agree = (got == want).mean()
    assert agree >= 0.999, f"agreement {agree}"
    # disagreements must be ties: reconstructions equally close
    if agree < 1.0:
        xr_got = np.asarray(pq_decode(jnp.asarray(got), jnp.asarray(cents), layout))
        xr_want = np.asarray(pq_decode(jnp.asarray(want), jnp.asarray(cents), layout))
        e_got = ((xr_got - x) ** 2).mean()
        e_want = ((xr_want - x) ** 2).mean()
        np.testing.assert_allclose(e_got, e_want, rtol=1e-4)


def test_fused_encode_integer_inputs_exact(rng):
    """Integer-valued inputs: no rounding anywhere, codes must match the
    numpy argmin bit-for-bit (tie-break = lowest index)."""
    d, M, C = 16, 8, 64
    x = rng.integers(-4, 5, (40, d)).astype(np.float32)
    cents = rng.integers(-4, 5, (M, C, d // M)).astype(np.float32)
    got = np.asarray(
        pq_encode_fused(
            jnp.asarray(x), jnp.asarray(cents), interpret=True,
            precision="exact",
        )
    )
    xs = x.reshape(40, M, d // M)
    dists = ((xs[:, :, None, :] - cents[None]) ** 2).sum(-1)  # (40, M, C)
    want = dists.argmin(-1)
    np.testing.assert_array_equal(got, want)


def test_fused_encode_stacked_matches_per_bank(rng):
    """Stacked (S banks in one launch) == per-bank single calls."""
    S, d, M, C = 3, 16, 8, 32
    x = rng.standard_normal((S, 2, 50, d)).astype(np.float32)
    cents = rng.standard_normal((S, M, C, d // M)).astype(np.float32)
    got = np.asarray(
        pq_encode_fused_stacked(
            jnp.asarray(x), jnp.asarray(cents), "strided",
            interpret=True, precision="exact",
        )
    )
    for s in range(S):
        one = np.asarray(
            pq_encode_fused(
                jnp.asarray(x[s]), jnp.asarray(cents[s]), "strided",
                interpret=True, precision="exact",
            )
        )
        np.testing.assert_array_equal(got[s], one)


def test_fused_encode_fast_reconstruction_parity(rng):
    """bf16 "fast" codes reconstruct as well as the jnp "fast" path (the
    runtime contract from pq/ops.py:56-66: near-tie flips only)."""
    d, M, C = 32, 16, 256
    x = rng.standard_normal((2, 4, 200, d)).astype(np.float32)
    cents = rng.standard_normal((M, C, d // M)).astype(np.float32)
    got = np.asarray(
        pq_encode_fused(
            jnp.asarray(x), jnp.asarray(cents), "strided",
            interpret=True, precision="fast",
        )
    )
    want = np.asarray(
        pq_encode(jnp.asarray(x), jnp.asarray(cents), "strided", precision="fast")
    )
    agree = (got == want).mean()
    assert agree >= 0.98, f"fast-path agreement {agree}"
    xr_got = np.asarray(pq_decode(jnp.asarray(got), jnp.asarray(cents), "strided"))
    xr_want = np.asarray(pq_decode(jnp.asarray(want), jnp.asarray(cents), "strided"))
    e_got = ((xr_got - x) ** 2).mean()
    e_want = ((xr_want - x) ** 2).mean()
    np.testing.assert_allclose(e_got, e_want, rtol=2e-3)
