"""Oracle tests: PQ decode attention vs exact attention on decoded KV.

Mirrors the reference's embedded self-check (pq_utils.py:330-381): decode the
full quantized cache, concatenate the residual window, run exact attention,
and require the fused path to match.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from million_tpu.pq import ops as pq
from million_tpu.ops.pq_attention_ref import (
    pq_decode_attention_ref,
    dense_decode_attention,
    merge_partials,
    causal_attention,
)


def make_case(rng, bs=1, nh=4, nh_k=4, d=32, M=16, C=64, N=64, n_codes=40, Lt=16, r=7):
    q = rng.standard_normal((bs, nh, d)).astype(np.float32)
    # codes in the transposed arena layout (bs, nh_k, M, N)
    kc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    vc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    kcent = rng.standard_normal((M, C, d // M)).astype(np.float32)
    vcent = rng.standard_normal((M, C, d // M)).astype(np.float32)
    kr = rng.standard_normal((bs, nh_k, Lt, d)).astype(np.float32)
    vr = rng.standard_normal((bs, nh_k, Lt, d)).astype(np.float32)
    return q, kc, vc, kcent, vcent, kr, vr, n_codes, r


def oracle(q, kc, vc, kcent, vcent, kr, vr, n_codes, r):
    """Exact attention over [decoded codes ; residual] — the ground truth."""
    kc_tok = np.swapaxes(kc, -1, -2)
    vc_tok = np.swapaxes(vc, -1, -2)
    khat = np.asarray(pq.pq_decode(jnp.asarray(kc_tok), jnp.asarray(kcent)))[:, :, :n_codes]
    vhat = np.asarray(pq.pq_decode(jnp.asarray(vc_tok), jnp.asarray(vcent)))[:, :, :n_codes]
    k = np.concatenate([khat, kr[:, :, :r]], axis=2)
    v = np.concatenate([vhat, vr[:, :, :r]], axis=2)
    return np.asarray(
        dense_decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    )


@pytest.mark.parametrize("nh,nh_k", [(4, 4), (8, 2)])
def test_pq_attention_matches_oracle(rng, nh, nh_k):
    case = make_case(rng, nh=nh, nh_k=nh_k)
    q, kc, vc, kcent, vcent, kr, vr, n_codes, r = case
    got = np.asarray(
        pq_decode_attention_ref(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(kcent), jnp.asarray(vcent),
            jnp.asarray(kr), jnp.asarray(vr),
            jnp.asarray(n_codes), jnp.asarray(r),
            layout="contiguous",
        )
    )
    want = oracle(*case)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pq_attention_empty_residual(rng):
    case = make_case(rng, r=0)
    got = np.asarray(
        pq_decode_attention_ref(
            *[jnp.asarray(a) for a in case[:7]], jnp.asarray(case[7]), jnp.asarray(0),
            layout="contiguous",
        )
    )
    want = oracle(*case)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert np.isfinite(got).all()


def test_pq_attention_empty_codes(rng):
    """All mass in the residual (decode right after a short prompt)."""
    case = make_case(rng, n_codes=0, r=9)
    got = np.asarray(
        pq_decode_attention_ref(
            *[jnp.asarray(a) for a in case[:7]], jnp.asarray(0), jnp.asarray(case[8]),
            layout="contiguous",
        )
    )
    want = oracle(*case)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert np.isfinite(got).all()


def test_merge_partials_is_exact_softmax_merge(rng):
    """Splitting scores into S chunks and LSE-merging == one softmax."""
    S, n, d = 4, 32, 16
    scores = rng.standard_normal((S, n)).astype(np.float32)
    v = rng.standard_normal((S, n, d)).astype(np.float32)
    outs, lses = [], []
    for s in range(S):
        m = scores[s].max()
        p = np.exp(scores[s] - m)
        outs.append((p / p.sum()) @ v[s])
        lses.append(m + np.log(p.sum()))
    merged, lse = merge_partials(jnp.asarray(np.stack(outs)), jnp.asarray(np.stack(lses)))
    flat = scores.reshape(-1)
    p = np.exp(flat - flat.max())
    want = (p / p.sum()) @ v.reshape(-1, d)
    np.testing.assert_allclose(np.asarray(merged), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(lse), flat.max() + np.log(p.sum()), rtol=1e-5)


def test_causal_attention_matches_loop(rng):
    bs, nh, nh_k, n, d = 1, 4, 2, 10, 16
    q = rng.standard_normal((bs, nh, n, d)).astype(np.float32)
    k = rng.standard_normal((bs, nh_k, n, d)).astype(np.float32)
    v = rng.standard_normal((bs, nh_k, n, d)).astype(np.float32)
    got = np.asarray(causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    for t in range(n):
        want_t = np.asarray(
            dense_decode_attention(
                jnp.asarray(q[:, :, t]), jnp.asarray(k[:, :, : t + 1]), jnp.asarray(v[:, :, : t + 1])
            )
        )
        # default matmul precision may be bf16 on accelerator backends
        np.testing.assert_allclose(got[:, :, t], want_t, rtol=5e-3, atol=5e-3)
