"""Pallas PQ decode-attention kernel vs the jnp oracle (interpret mode).

The TPU analogue of the reference's test_kernel.py protocol
(bindings/test_kernel.py:86-97): random codes/centroids, fused kernel vs
decode + exact softmax, MAE/max-err assertions. Runs the kernel in
interpreter mode so the suite works on CPU; the same parity is re-checked on
real TPU by benchmarks/kernel_bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    pack_codes,
    pack_decode_table,
    pq_codes_attention,
    unpack_codes,
)
from million_tpu.pq.ops import pq_decode
from million_tpu.ops.pq_attention_ref import merge_partials


def oracle_codes_attention(q, key_codes_t, value_codes_t, kcent, vcent, n_codes, scale):
    """q (bs,nh_k,G,d) f32; codes transposed (bs,nh_k,M,N) uint8. bf16 decode
    to match kernel precision. Returns (out, lse) partial over valid codes."""
    bs, nh_k, G, d = q.shape
    kc = np.swapaxes(key_codes_t, -1, -2)[:, :, :n_codes]  # (bs,nh_k,n,M)
    vc = np.swapaxes(value_codes_t, -1, -2)[:, :, :n_codes]
    khat = np.asarray(
        pq_decode(jnp.asarray(kc), jnp.asarray(kcent).astype(jnp.bfloat16), "strided")
    ).astype(np.float32)
    vhat = np.asarray(
        pq_decode(jnp.asarray(vc), jnp.asarray(vcent).astype(jnp.bfloat16), "strided")
    ).astype(np.float32)
    s = np.einsum("bhgk,bhnk->bhgn", q * scale, khat)  # (bs,nh_k,G,n)
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(-1, keepdims=True)
    out = np.einsum("bhgn,bhnk->bhgk", p / l, vhat)
    lse = (m + np.log(l))[..., 0]
    return out, lse


def make_inputs(rng, bs=1, nh_k=2, d=32, M=16, C=256, N=512, n_codes=300):
    q = rng.standard_normal((bs, nh_k, GROUP_PAD, d)).astype(np.float32)
    kc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    vc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    kcent = rng.standard_normal((M, C, d // M)).astype(np.float32)
    vcent = rng.standard_normal((M, C, d // M)).astype(np.float32)
    return q, kc, vc, kcent, vcent, n_codes


def test_pack_unpack_roundtrip(rng):
    codes = rng.integers(0, 256, (2, 3, 8, 64)).astype(np.uint8)
    words = pack_codes(jnp.asarray(codes))
    assert words.shape == (2, 3, 8, 16) and words.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(unpack_codes(words)), codes)


@pytest.mark.parametrize("n_codes", [300, 512, 130, 3])
def test_kernel_matches_oracle(rng, n_codes):
    q, kc, vc, kcent, vcent, _ = make_inputs(rng, n_codes=n_codes)
    d = q.shape[-1]
    scale = 1.0 / d**0.5
    kpack = pack_decode_table(jnp.asarray(kcent))
    vpack = pack_decode_table(jnp.asarray(vcent))
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)),
        pack_codes(jnp.asarray(vc)),
        kpack,
        vpack,
        jnp.asarray(n_codes, jnp.int32),
        block=128,
        interpret=True,
    )
    want_out, want_lse = oracle_codes_attention(q, kc, vc, kcent, vcent, n_codes, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=0.05, atol=0.05)


def test_kernel_small_codebook(rng):
    """C=64 (nbits=6) — plain f32 table, codes never hit the hi half."""
    q, kc, vc, kcent, vcent, n = make_inputs(rng, C=64, N=256, n_codes=200)
    kc, vc = kc % 64, vc % 64
    d = q.shape[-1]
    scale = 1.0 / d**0.5
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        pack_decode_table(jnp.asarray(kcent)),
        pack_decode_table(jnp.asarray(vcent)),
        jnp.asarray(n, jnp.int32),
        block=128,
        interpret=True,  # C=64 -> plain-table fast path
    )
    want_out, want_lse = oracle_codes_attention(q, kc, vc, kcent, vcent, n, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)


def test_kernel_merge_with_residual_matches_full(rng):
    """Kernel partial + residual partial, LSE-merged == attention over the
    concatenated sequence (validates the partial/lse contract end to end)."""
    q, kc, vc, kcent, vcent, n_codes = make_inputs(rng, N=256, n_codes=200)
    bs, nh_k, G, d = q.shape
    scale = 1.0 / d**0.5
    out_q, lse_q = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        pack_decode_table(jnp.asarray(kcent)),
        pack_decode_table(jnp.asarray(vcent)),
        jnp.asarray(n_codes, jnp.int32),
        block=128,
        interpret=True,
    )
    # residual window of 16 exact tokens
    r = 16
    kr = rng.standard_normal((bs, nh_k, r, d)).astype(np.float32)
    vr = rng.standard_normal((bs, nh_k, r, d)).astype(np.float32)
    s_r = np.einsum("bhgk,bhnk->bhgn", q * scale, kr)
    m_r = s_r.max(-1, keepdims=True)
    p_r = np.exp(s_r - m_r)
    l_r = p_r.sum(-1, keepdims=True)
    out_r = np.einsum("bhgn,bhnk->bhgk", p_r / l_r, vr)
    lse_r = (m_r + np.log(l_r))[..., 0]

    merged, _ = merge_partials(
        jnp.stack([jnp.asarray(out_q), jnp.asarray(out_r)]),
        jnp.stack([jnp.asarray(lse_q), jnp.asarray(lse_r)]),
    )

    # ground truth: attention over decoded codes ++ residual
    kc_tok = np.swapaxes(kc, -1, -2)[:, :, :n_codes]
    vc_tok = np.swapaxes(vc, -1, -2)[:, :, :n_codes]
    khat = np.asarray(
        pq_decode(jnp.asarray(kc_tok), jnp.asarray(kcent).astype(jnp.bfloat16), "strided")
    ).astype(np.float32)
    vhat = np.asarray(
        pq_decode(jnp.asarray(vc_tok), jnp.asarray(vcent).astype(jnp.bfloat16), "strided")
    ).astype(np.float32)
    k_all = np.concatenate([khat, kr], axis=2)
    v_all = np.concatenate([vhat, vr], axis=2)
    s = np.einsum("bhgk,bhnk->bhgn", q * scale, k_all)
    p = np.exp(s - s.max(-1, keepdims=True))
    want = np.einsum("bhgn,bhnk->bhgk", p / p.sum(-1, keepdims=True), v_all)
    np.testing.assert_allclose(np.asarray(merged), want, rtol=0.05, atol=0.05)


def test_pack_decode_table_layout(rng):
    """Table (M, 128) i32: lane l of row m packs int8
    [c0(2l), c1(2l), c0(2l+1), c1(2l+1)] scaled by 127/scale[m, comp];
    dequantize_table must invert it (up to the int8 rounding step)."""
    from million_tpu.ops.pq_attention_pallas import dequantize_table

    M, C, d_m = 8, 256, 2
    cents = rng.standard_normal((M, C, d_m)).astype(np.float32)
    table = pack_decode_table(jnp.asarray(cents))
    assert table.tab.shape == (M, 128) and table.tab.dtype == jnp.int32
    assert table.q_scale.shape == (4 * M,)
    # scales: row 4m+j = per-(subspace, component) absmax; fillers zero
    sc = np.abs(cents).max(axis=1)
    qs = np.asarray(table.q_scale)
    for m in range(M):
        assert np.allclose(qs[4 * m], sc[m, 0], rtol=1e-6)
        assert np.allclose(qs[4 * m + 1], sc[m, 1], rtol=1e-6)
        assert qs[4 * m + 2] == 0 and qs[4 * m + 3] == 0
    # round trip: dequantized codebook within half an int8 step of cents
    deq = np.asarray(dequantize_table(table, C))
    step = sc[:, None, :] / 127.0
    assert np.all(np.abs(deq - cents) <= 0.5 * step + 1e-7)


def test_decode_row_maps():
    from million_tpu.ops.pq_attention_pallas import decode_row_maps

    for M in (16, 64):
        gidx, sidx = decode_row_maps(M)
        d = 2 * M
        # every head dim is selected from the kernel row that gathered it
        for m in range(M):
            for j in range(2):
                assert gidx[4 * m + j] == m + j * M
                assert sidx[m + j * M] == 4 * m + j
        assert sorted(sidx.tolist()) == sorted(
            {4 * m + j for m in range(M) for j in range(2)}
        )


def test_kernel_direct_table_matches_oracle(rng):
    """C=128 direct-index tables (the nbits=7 fast path) vs the oracle on
    the kernel's effective int8 codebook."""
    from million_tpu.ops.pq_attention_pallas import dequantize_table

    q, kc, vc, kcent, vcent, n = make_inputs(rng, C=128, N=256, n_codes=200)
    kc, vc = kc % 128, vc % 128
    d = q.shape[-1]
    scale = 1.0 / d**0.5
    kp = pack_decode_table(jnp.asarray(kcent), direct=True)
    vp = pack_decode_table(jnp.asarray(vcent), direct=True)
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        kp, vp, jnp.asarray(n, jnp.int32),
        block=128, interpret=True, direct=True,
    )
    keff = np.asarray(dequantize_table(kp, 128, direct=True))
    veff = np.asarray(dequantize_table(vp, 128, direct=True))
    want_out, want_lse = oracle_codes_attention(q, kc, vc, keff, veff, n, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=0.05, atol=0.05)


def test_kernel_dm4_direct_matches_oracle(rng):
    """d_m=4 (M=d/4, the reference's M=32-at-d=128 kernel shape,
    setup.py:13) with C=128 direct tables: all four packed bytes are real
    components, half the gathers and code bytes of d_m=2."""
    from million_tpu.ops.pq_attention_pallas import dequantize_table

    q, kc, vc, kcent, vcent, n = make_inputs(
        rng, d=32, M=8, C=128, N=256, n_codes=200
    )
    d = q.shape[-1]
    scale = 1.0 / d**0.5
    kp = pack_decode_table(jnp.asarray(kcent), direct=True)
    vp = pack_decode_table(jnp.asarray(vcent), direct=True)
    assert kp.q_scale.shape == (4 * 8,)
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        kp, vp, jnp.asarray(n, jnp.int32),
        block=128, interpret=True, direct=True,
    )
    keff = np.asarray(dequantize_table(kp, 128, direct=True, d_m=4))
    veff = np.asarray(dequantize_table(vp, 128, direct=True, d_m=4))
    want_out, want_lse = oracle_codes_attention(q, kc, vc, keff, veff, n, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=0.05, atol=0.05)


def test_decode_row_maps_dm4():
    from million_tpu.ops.pq_attention_pallas import decode_row_maps

    gidx, sidx = decode_row_maps(4, d_m=4, direct=True)  # M=4, d=16
    # kernel row 4m+j <-> head dim m + j*M (single direct plane)
    for m in range(4):
        for j in range(4):
            assert gidx[4 * m + j] == m + j * 4
            assert sidx[m + j * 4] == 4 * m + j


def test_decode_row_maps_multiplane():
    """Plane-stacked geometries: every head dim maps to exactly one kernel
    row and back, for all (d_m, direct) combos."""
    from million_tpu.ops.pq_attention_pallas import decode_row_maps, table_planes

    for d_m, direct in [(4, False), (8, False), (8, True), (6, False)]:
        M = 48 // d_m * 2  # any M; keep d = d_m*M small
        P = table_planes(d_m, direct)
        gidx, sidx = decode_row_maps(M, d_m, direct)
        assert gidx.shape == (4 * P * M,)
        d = d_m * M
        assert sorted(gidx[sidx].tolist()) == list(range(d))
        for m in range(M):
            for c in range(d_m):
                row = sidx[m + c * M]
                p, j = (c // 4, c % 4) if direct else (c // 2, c % 2)
                assert row == 4 * (p * M + m) + j


@pytest.mark.parametrize(
    "d,M,C,direct",
    [
        (32, 8, 256, False),  # d_m=4, pair planes P=2 (ref M=32@d=128, C=256)
        (32, 4, 128, True),  # d_m=8, direct planes P=2 (ref M=16@d=128, C=128)
        (32, 4, 256, False),  # d_m=8, pair planes P=4 (ref M=16@d=128, C=256)
    ],
)
def test_kernel_multiplane_matches_oracle(rng, d, M, C, direct):
    """Wide-subspace geometries (d_m in {4, 8}) on the plane-stacked tables:
    the FULL reference compiled-shape matrix (M in {16,32,64} x C in
    {128,256} at d=128, setup.py:10-15) now runs on the fused kernel.
    Parity vs the oracle on the effective int8 codebook."""
    from million_tpu.ops.pq_attention_pallas import dequantize_table, table_planes

    d_m = d // M
    q, kc, vc, kcent, vcent, n = make_inputs(
        rng, d=d, M=M, C=C, N=256, n_codes=200
    )
    scale = 1.0 / d**0.5
    kp = pack_decode_table(jnp.asarray(kcent), direct=direct)
    vp = pack_decode_table(jnp.asarray(vcent), direct=direct)
    P = table_planes(d_m, direct)
    assert kp.tab.shape == (P * M, 128)
    assert kp.q_scale.shape == (4 * P * M,)
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        kp, vp, jnp.asarray(n, jnp.int32),
        block=128, interpret=True, direct=direct,
    )
    assert out.shape == q.shape
    keff = np.asarray(dequantize_table(kp, C, direct=direct, d_m=d_m))
    veff = np.asarray(dequantize_table(vp, C, direct=direct, d_m=d_m))
    # the dequantized effective codebook must invert pack up to int8 rounding
    step = np.abs(kcent).max(axis=1)[:, None, :] / 127.0
    assert np.all(np.abs(keff - kcent) <= 0.5 * step + 1e-7)
    want_out, want_lse = oracle_codes_attention(q, kc, vc, keff, veff, n, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=0.05, atol=0.05)


def test_kernel_asymmetric_kv_geometry(rng):
    """Asymmetric K:d_m=2/C=256 (pair tables) + V:d_m=4/C=128 (direct):
    scores keep the quality-critical K resolution while the V side runs
    with half the gathers and code bytes. Parity vs an oracle decoding
    each side with its own effective codebook."""
    from million_tpu.ops.pq_attention_pallas import dequantize_table

    bs, nh_k, d, N, n = 1, 2, 32, 256, 200
    M_k, C_k, M_v, C_v = 16, 256, 8, 128
    q = rng.standard_normal((bs, nh_k, GROUP_PAD, d)).astype(np.float32)
    kc = rng.integers(0, C_k, (bs, nh_k, M_k, N)).astype(np.uint8)
    vc = rng.integers(0, C_v, (bs, nh_k, M_v, N)).astype(np.uint8)
    kcent = rng.standard_normal((M_k, C_k, d // M_k)).astype(np.float32)
    vcent = rng.standard_normal((M_v, C_v, d // M_v)).astype(np.float32)
    scale = 1.0 / d**0.5
    kp = pack_decode_table(jnp.asarray(kcent), direct=False)
    vp = pack_decode_table(jnp.asarray(vcent), direct=True)
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        kp, vp, jnp.asarray(n, jnp.int32),
        block=128, interpret=True, direct=False, v_direct=True,
    )
    assert out.shape == (bs, nh_k, GROUP_PAD, d)
    keff = np.asarray(dequantize_table(kp, C_k, direct=False, d_m=2))
    veff = np.asarray(dequantize_table(vp, C_v, direct=True, d_m=4))
    want_out, want_lse = oracle_codes_attention(q, kc, vc, keff, veff, n, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=0.05, atol=0.05)


def test_bucket_for_length_ladder():
    """Host bucket ladder (l2Ns analogue, pq_utils.py:8-22): powers of two
    from min_bucket, None once the arena is covered."""
    from million_tpu.ops.pq_attention_pallas import bucket_for_length

    assert bucket_for_length(0, 32768) == 4096
    assert bucket_for_length(4096, 32768) == 4096
    assert bucket_for_length(4097, 32768) == 8192
    assert bucket_for_length(9000, 32768) == 16384
    assert bucket_for_length(17000, 32768) is None  # covering pow2 == N_max
    assert bucket_for_length(100, 2048) is None  # min_bucket >= N_max
    # ladder rungs always divide by the kernel block constraint
    for n in (1, 5000, 12000):
        b = bucket_for_length(n, 1 << 20)
        assert b % 4 == 0 and b % min(b, 16384) == 0 and b >= n


def test_kernel_bucketed_matches_full(rng):
    """A bucket covering n_codes returns bit-identical partials to the full
    arena scan (the skipped blocks are all masked anyway) — the contract
    that lets generate() shrink the scan by context length."""
    q, kc, vc, kcent, vcent, n_codes = make_inputs(rng, N=1024, n_codes=300)
    d = q.shape[-1]
    scale = 1.0 / d**0.5
    kp = pack_decode_table(jnp.asarray(kcent))
    vp = pack_decode_table(jnp.asarray(vcent))
    args = (
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)),
        pack_codes(jnp.asarray(vc)),
        kp, vp, jnp.asarray(n_codes, jnp.int32),
    )
    out_full, lse_full = pq_codes_attention(*args, block=128, interpret=True)
    out_b, lse_b = pq_codes_attention(
        *args, block=128, n_bucket=512, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_full))
    np.testing.assert_array_equal(np.asarray(lse_b), np.asarray(lse_full))


def test_decode_step_bucketed_matches_full(rng):
    """decode_step(n_bucket=...) == decode_step(full scan) token-for-token
    through the model (the runtime wiring the reference routes through
    KernelRegistry.get_kernel, pq_utils.py:43-47)."""
    import dataclasses

    from million_tpu.models.llama import (
        PRESETS, init_params, build_tables, decode_step,
    )
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state

    cfg = dataclasses.replace(
        PRESETS["test-tiny"], num_layers=2, dtype=jnp.float32
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(
            rng.standard_normal((cfg.num_layers, M, 256, 2)), jnp.float32
        ),
        "value": jnp.asarray(
            rng.standard_normal((cfg.num_layers, M, 256, 2)), jnp.float32
        ),
    }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=256, Lt=16,
        N_max=1024, dtype=jnp.float32,
    )
    cache = dict(init_state(pq_cfg, cfg.num_layers))
    cache["key_codes"] = jnp.asarray(
        rng.integers(-(2**31), 2**31, cache["key_codes"].shape), jnp.int32
    )
    cache["value_codes"] = jnp.asarray(
        rng.integers(-(2**31), 2**31, cache["value_codes"].shape), jnp.int32
    )
    cache["n_codes"] = jnp.full_like(cache["n_codes"], 200)
    cache["r"] = jnp.full_like(cache["r"], 2)
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.asarray(202, jnp.int32)
    lf, cf = decode_step(
        params, cfg, tok, pos, cache, tables, mode="pq_pallas"
    )
    lb, cb = decode_step(
        params, cfg, tok, pos, cache, tables, mode="pq_pallas", n_bucket=256
    )
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lb))
    for k in cf:
        np.testing.assert_array_equal(np.asarray(cf[k]), np.asarray(cb[k]))


def test_kernel_outlier_correction_matches_oracle(rng):
    """Outlier-channel mode (north star): K outliers correct the scores
    with a dense exact matmul, V outliers return a separate normalized
    numerator `co`. Parity vs an oracle that attends with corrected scores
    and exact outlier values."""
    from million_tpu.ops.pq_attention_pallas import (
        pq_codes_attention_stacked,
        to_byte_plane,
    )

    bs, nh_k, d, M, C = 1, 2, 32, 8, 128  # d_m=4 direct tables (coarse)
    L, N, n_codes = 2, 512, 300
    OK = OV = 8
    scale = 1.0 / np.sqrt(d)
    q = rng.standard_normal((bs, nh_k, GROUP_PAD, d)).astype(np.float32)
    kc = rng.integers(0, C, (L, bs, nh_k, M, N)).astype(np.uint8)
    vc = rng.integers(0, C, (L, bs, nh_k, M, N)).astype(np.uint8)
    kcent = rng.standard_normal((L, M, C, d // M)).astype(np.float32)
    vcent = rng.standard_normal((L, M, C, d // M)).astype(np.float32)
    ko = (rng.standard_normal((L, bs, nh_k, OK, N)) * 2).astype(np.float32)
    vo = (rng.standard_normal((L, bs, nh_k, OV, N)) * 2).astype(np.float32)
    koidx = np.sort(rng.choice(d, OK, replace=False)).astype(np.int32)
    voidx = np.sort(rng.choice(d, OV, replace=False)).astype(np.int32)

    kpack = jax.vmap(lambda c: pack_decode_table(c, direct=True))(jnp.asarray(kcent))
    vpack = jax.vmap(lambda c: pack_decode_table(c, direct=True))(jnp.asarray(vcent))
    kw = pack_codes(jnp.asarray(kc))
    vw = pack_codes(jnp.asarray(vc))
    li = 1
    qj = jnp.asarray(q * scale, jnp.bfloat16)
    qo = qj[..., jnp.asarray(koidx)]

    out, lse, co = pq_codes_attention_stacked(
        qj, kw, vw, kpack, vpack, jnp.asarray(li), jnp.asarray(n_codes),
        block=256, direct=True, interpret=True,
        qo=qo,
        k_outliers=to_byte_plane(jnp.asarray(ko, jnp.bfloat16)),
        v_outliers=to_byte_plane(jnp.asarray(vo, jnp.bfloat16)),
    )
    merged = np.array(out)
    merged[..., voidx] = np.asarray(co)

    # oracle (f32 decode at bf16 table precision, exact corrections)
    kc_n = np.swapaxes(kc[li], -1, -2)[:, :, :n_codes]
    vc_n = np.swapaxes(vc[li], -1, -2)[:, :, :n_codes]
    khat = np.asarray(pq_decode(
        jnp.asarray(kc_n), jnp.asarray(kcent[li]).astype(jnp.bfloat16), "strided"
    )).astype(np.float32)
    vhat = np.asarray(pq_decode(
        jnp.asarray(vc_n), jnp.asarray(vcent[li]).astype(jnp.bfloat16), "strided"
    )).astype(np.float32)
    s = np.einsum("bhgk,bhnk->bhgn", q * scale, khat)
    s = s + np.einsum(
        "bhgo,bhon->bhgn", (q * scale)[..., koidx], ko[li][..., :n_codes]
    )
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(-1, keepdims=True)
    want = np.einsum("bhgn,bhnk->bhgk", p / l, vhat)
    corr = np.einsum("bhgn,bhon->bhgo", p / l, vo[li][..., :n_codes])
    want[..., voidx] = corr
    want_lse = (m + np.log(l))[..., 0]

    mae = np.abs(merged - want).mean()
    assert mae < 2e-2, f"outlier kernel MAE {mae}"
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=2e-2, atol=2e-2)


# --------------------------------------------------------------------------
# chunk-query kernel (admission history attention)
# --------------------------------------------------------------------------

def oracle_chunk_history(q, kc, vc, kcent, vcent, n_prev, scale):
    """Many-query oracle: q (bs, nh, nc, d) f32 raw; codes transposed
    (bs, nh_k, M, N) uint8; attends to the first n_prev tokens. Returns
    (out (bs, nh, nc, d), lse (bs, nh, nc)) with bf16-decoded tables."""
    from million_tpu.ops.pq_attention_ref import _gqa_expand

    bs, nh, nc, d = q.shape
    kcn = np.swapaxes(kc, -1, -2)[:, :, :n_prev]
    vcn = np.swapaxes(vc, -1, -2)[:, :, :n_prev]
    khat = np.asarray(pq_decode(
        jnp.asarray(kcn), jnp.asarray(kcent).astype(jnp.bfloat16), "strided"
    )).astype(np.float32)
    vhat = np.asarray(pq_decode(
        jnp.asarray(vcn), jnp.asarray(vcent).astype(jnp.bfloat16), "strided"
    )).astype(np.float32)
    kf = np.asarray(_gqa_expand(jnp.asarray(khat), nh))
    vf = np.asarray(_gqa_expand(jnp.asarray(vhat), nh))
    s = np.einsum("bhqk,bhnk->bhqn", q * scale, kf)
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(-1, keepdims=True)
    out = np.einsum("bhqn,bhnk->bhqk", p / l, vf)
    return out, (m + np.log(l))[..., 0]


@pytest.mark.parametrize("n_prev", [384, 512, 4])
def test_chunk_kernel_matches_oracle(rng, n_prev):
    from million_tpu.ops.pq_attention_pallas import pq_chunk_history_attention

    bs, nh_k, d, M, C, N = 1, 2, 32, 16, 256, 512
    nh, nc = 4, 24  # G = 2, odd row count exercises q-block padding
    q = rng.standard_normal((bs, nh, nc, d)).astype(np.float32)
    kc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    vc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    kcent = rng.standard_normal((M, C, d // M)).astype(np.float32)
    vcent = rng.standard_normal((M, C, d // M)).astype(np.float32)
    scale = 1.0 / d**0.5
    out, lse = pq_chunk_history_attention(
        jnp.asarray(q),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        pack_decode_table(jnp.asarray(kcent)),
        pack_decode_table(jnp.asarray(vcent)),
        jnp.asarray(n_prev, jnp.int32), scale,
        block=128, q_block=16, interpret=True,
    )
    want_out, want_lse = oracle_chunk_history(q, kc, vc, kcent, vcent, n_prev, scale)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(lse), want_lse, rtol=0.05, atol=0.05)


def test_chunk_kernel_matches_jnp_history_partial(rng):
    """Kernel vs the jnp _history_partial it replaces in chunked_prefill —
    same inputs, same (out, lse) contract (history masked at n_prev)."""
    from million_tpu.models.chunked_prefill import _history_partial
    from million_tpu.ops.pq_attention_pallas import (
        dequantize_table,
        pq_chunk_history_attention,
    )

    bs, nh_k, d, M, C, N = 1, 2, 32, 16, 256, 512
    nh, nc, n_prev = 4, 32, 400
    d_m = d // M
    q = rng.standard_normal((bs, nh, nc, d)).astype(np.float32)
    kc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    vc = rng.integers(0, C, (bs, nh_k, M, N)).astype(np.uint8)
    kcent = rng.standard_normal((M, C, d_m)).astype(np.float32)
    vcent = rng.standard_normal((M, C, d_m)).astype(np.float32)
    scale = 1.0 / d**0.5
    kpack = pack_decode_table(jnp.asarray(kcent))
    vpack = pack_decode_table(jnp.asarray(vcent))
    out, lse = pq_chunk_history_attention(
        jnp.asarray(q),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        kpack, vpack, jnp.asarray(n_prev, jnp.int32), scale,
        block=128, q_block=16, interpret=True,
    )
    # jnp path decoding with the kernel's effective (int8-quantized) tables
    want_out, want_lse = _history_partial(
        jnp.asarray(q),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        dequantize_table(kpack, C=C, d_m=d_m),
        dequantize_table(vpack, C=C, d_m=d_m),
        jnp.asarray(n_prev), scale, nb=4, hist_block=128,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kpp", [2, 4])
def test_paged_mp_kernel_matches_single_page(rng, kpp):
    """Multi-page paged kernel (manual double-buffered page-group DMA)
    vs the single-page BlockSpec variant — identical inputs, same
    results (they share the block-step interior)."""
    from million_tpu.ops.pq_attention_pallas import (
        pq_paged_attention_stacked,
        pq_paged_attention_stacked_mp,
    )

    L, bs, nh_k, d, M, C = 3, 2, 2, 32, 16, 256
    page_size, P_seq = 128, 6
    ps_w = page_size // 4
    n_pages = bs * P_seq
    q = rng.standard_normal((bs, nh_k, GROUP_PAD, d)).astype(np.float32) * 0.3
    kcent = rng.standard_normal((L, M, C, d // M)).astype(np.float32)
    vcent = rng.standard_normal((L, M, C, d // M)).astype(np.float32)
    kpack = jax.vmap(pack_decode_table)(jnp.asarray(kcent))
    vpack = jax.vmap(pack_decode_table)(jnp.asarray(vcent))
    kp = jnp.asarray(
        rng.integers(-(2**31), 2**31, (L, n_pages + 1, nh_k, M, ps_w)),
        jnp.int32)
    vp = jnp.asarray(
        rng.integers(-(2**31), 2**31, (L, n_pages + 1, nh_k, M, ps_w)),
        jnp.int32)
    # shuffled page tables + ragged per-seq lengths
    perm = rng.permutation(n_pages)
    pt = jnp.asarray(perm.reshape(bs, P_seq), jnp.int32)
    n_codes = jnp.asarray([5 * page_size + 37, 2 * page_size], jnp.int32)
    li = jnp.asarray(1, jnp.int32)
    qj = jnp.asarray(q, jnp.bfloat16)

    out_a, lse_a = pq_paged_attention_stacked(
        qj, kp, vp, kpack, vpack, li, pt, n_codes, interpret=True)
    out_b, lse_b = pq_paged_attention_stacked_mp(
        qj, kp, vp, kpack, vpack, li, pt, n_codes, interpret=True, kpp=kpp)
    # the wider block changes online-softmax accumulation order and the
    # p-plane quantization boundaries -> ~1e-4 noise, not exact equality
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(lse_b), np.asarray(lse_a),
                               rtol=1e-3, atol=1e-3)
