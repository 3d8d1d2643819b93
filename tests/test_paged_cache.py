"""Paged PQ cache + paged attention kernel tests (reference PageManager /
PagedPQCache semantics, dynamic_paged_pq_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.cache.paged_pq_cache import (
    PagedPQCacheConfig,
    init_paged_state,
    allocate_pages,
    free_sequence,
    write_codes_to_pages,
    paged_prefill,
)
from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    pack_codes,
    pack_decode_table,
    pq_codes_attention,
    pq_paged_attention,
    unpack_codes,
)


CFG = PagedPQCacheConfig(
    num_layers=2, nh_k=2, d=32, M=16, C=64, Lt=16,
    page_size=128, n_pages=16, max_seqs=3, pages_per_seq=4, dtype=jnp.float32,
)


def test_allocate_and_free():
    st = init_paged_state(CFG)
    st = allocate_pages(st, jnp.asarray(0), 2)
    st = allocate_pages(st, jnp.asarray(1), 3)
    assert int(st["seq_n_pages"][0]) == 2
    assert int(st["seq_n_pages"][1]) == 3
    assert int(st["used"].sum()) == 5
    pages0 = set(np.asarray(st["page_table"][0, :2]).tolist())
    pages1 = set(np.asarray(st["page_table"][1, :3]).tolist())
    assert not pages0 & pages1, "sequences must not share pages"
    st = free_sequence(st, jnp.asarray(0))
    assert int(st["used"].sum()) == 3
    assert int(st["seq_n_pages"][0]) == 0
    # freed pages are reusable
    st = allocate_pages(st, jnp.asarray(2), 4)
    assert int(st["used"].sum()) == 7


def test_write_codes_roundtrip(rng):
    st = init_paged_state(CFG)
    sid = jnp.asarray(0)
    st = allocate_pages(st, sid, 3)
    n = 256  # 2 pages worth
    kc = jnp.asarray(rng.integers(0, 64, (CFG.num_layers, CFG.nh_k, CFG.M, n)), jnp.uint8)
    vc = jnp.asarray(rng.integers(0, 64, (CFG.num_layers, CFG.nh_k, CFG.M, n)), jnp.uint8)
    st = write_codes_to_pages(st, sid, kc, vc, CFG)
    assert int(st["seq_n_codes"][0]) == n
    # read back through the page table (pools hold packed words)
    pt = np.asarray(st["page_table"][0])
    got = np.concatenate(
        [np.asarray(unpack_codes(st["key_pool"]))[:, pt[p]] for p in range(2)], axis=-1
    )
    np.testing.assert_array_equal(got, np.asarray(kc))
    # second append lands in page 3
    n2 = 128
    kc2 = jnp.asarray(rng.integers(0, 64, (CFG.num_layers, CFG.nh_k, CFG.M, n2)), jnp.uint8)
    st = write_codes_to_pages(st, sid, kc2, kc2, CFG)
    got3 = np.asarray(unpack_codes(st["key_pool"]))[:, pt[2]]
    np.testing.assert_array_equal(got3, np.asarray(kc2))


def test_write_codes_unaligned_append(rng):
    """Appends that straddle a page boundary must split correctly."""
    st = init_paged_state(CFG)
    sid = jnp.asarray(0)
    st = allocate_pages(st, sid, 2)
    a = jnp.asarray(rng.integers(0, 64, (CFG.num_layers, CFG.nh_k, CFG.M, 96)), jnp.uint8)
    b = jnp.asarray(rng.integers(0, 64, (CFG.num_layers, CFG.nh_k, CFG.M, 96)), jnp.uint8)
    st = write_codes_to_pages(st, sid, a, a, CFG)
    st = write_codes_to_pages(st, sid, b, b, CFG)
    pt = np.asarray(st["page_table"][0])
    page0 = np.asarray(unpack_codes(st["key_pool"]))[:, pt[0]]
    page1 = np.asarray(unpack_codes(st["key_pool"]))[:, pt[1]]
    np.testing.assert_array_equal(page0[..., :96], np.asarray(a))
    np.testing.assert_array_equal(page0[..., 96:128], np.asarray(b)[..., :32])
    np.testing.assert_array_equal(page1[..., :64], np.asarray(b)[..., 32:])


def test_paged_attention_matches_flat(rng):
    """Paged kernel over scattered pages == flat kernel over the same codes."""
    bs, nh_k, d, M, C = 2, 2, 32, 16, 64
    ps, P_max, n_pages = 128, 4, 16
    kcent = rng.standard_normal((M, C, 2)).astype(np.float32)
    vcent = rng.standard_normal((M, C, 2)).astype(np.float32)
    kpack = pack_decode_table(jnp.asarray(kcent))
    vpack = pack_decode_table(jnp.asarray(vcent))

    # build a scattered page table and matching pools
    pt = np.full((bs, P_max), -1, np.int32)
    pt[0, :3] = [7, 2, 11]
    pt[1, :2] = [5, 9]
    n_codes = np.asarray([300, 200], np.int32)  # seq0 spans 3 pages, seq1 two
    kpool = rng.integers(0, C, (n_pages, nh_k, M, ps)).astype(np.uint8)
    vpool = rng.integers(0, C, (n_pages, nh_k, M, ps)).astype(np.uint8)

    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, d)) / d**0.5, jnp.bfloat16)
    out_p, lse_p = pq_paged_attention(
        q, pack_codes(jnp.asarray(kpool)), pack_codes(jnp.asarray(vpool)), kpack, vpack,
        jnp.asarray(pt), jnp.asarray(n_codes),
    )

    # flat reference: materialize each sequence's codes contiguously
    for b in range(bs):
        pages = [p for p in pt[b] if p >= 0]
        kc = np.concatenate([kpool[p] for p in pages], axis=-1)[None]  # (1,nh,M,n)
        vc = np.concatenate([vpool[p] for p in pages], axis=-1)[None]
        pad = 512 - kc.shape[-1]
        kc = np.pad(kc, ((0, 0), (0, 0), (0, 0), (0, pad)))
        vc = np.pad(vc, ((0, 0), (0, 0), (0, 0), (0, pad)))
        out_f, lse_f = pq_codes_attention(
            q[b : b + 1], pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
            kpack, vpack,
            jnp.asarray(n_codes[b]), block=128,
        )
        np.testing.assert_allclose(
            np.asarray(out_p[b]), np.asarray(out_f[0]), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(lse_p[b]), np.asarray(lse_f[0]), rtol=2e-3, atol=2e-3
        )


def test_paged_attention_matches_flat_multiplane(rng):
    """Paged kernel with a plane-stacked wide-subspace geometry (d_m=8,
    C=256 -> 4 pair planes): paged == flat over the same scattered codes.
    Covers the page-walk path of the round-2 multi-plane tables."""
    bs, nh_k, d, M, C = 1, 2, 32, 4, 256  # d_m = 8
    ps, P_max, n_pages = 128, 4, 8
    kcent = rng.standard_normal((M, C, 8)).astype(np.float32)
    vcent = rng.standard_normal((M, C, 8)).astype(np.float32)
    kpack = pack_decode_table(jnp.asarray(kcent))
    vpack = pack_decode_table(jnp.asarray(vcent))
    assert kpack.tab.shape == (4 * M, 128)  # 4 pair planes

    pt = np.full((bs, P_max), -1, np.int32)
    pt[0, :3] = [6, 1, 3]
    n_codes = np.asarray([300], np.int32)
    kpool = rng.integers(0, C, (n_pages, nh_k, M, ps)).astype(np.uint8)
    vpool = rng.integers(0, C, (n_pages, nh_k, M, ps)).astype(np.uint8)

    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, d)) / d**0.5, jnp.bfloat16)
    out_p, lse_p = pq_paged_attention(
        q, pack_codes(jnp.asarray(kpool)), pack_codes(jnp.asarray(vpool)),
        kpack, vpack, jnp.asarray(pt), jnp.asarray(n_codes),
    )
    pages = [p for p in pt[0] if p >= 0]
    kc = np.concatenate([kpool[p] for p in pages], axis=-1)[None]
    vc = np.concatenate([vpool[p] for p in pages], axis=-1)[None]
    pad = 512 - kc.shape[-1]
    kc = np.pad(kc, ((0, 0), (0, 0), (0, 0), (0, pad)))
    vc = np.pad(vc, ((0, 0), (0, 0), (0, 0), (0, pad)))
    out_f, lse_f = pq_codes_attention(
        q, pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)),
        kpack, vpack, jnp.asarray(n_codes[0]), block=128,
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_f), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(lse_p), np.asarray(lse_f), rtol=2e-3, atol=2e-3
    )


def test_paged_prefill_encodes(rng):
    st = init_paged_state(CFG)
    sid = jnp.asarray(1)
    st = allocate_pages(st, sid, 2)
    n = 128
    k = jnp.asarray(rng.standard_normal((CFG.num_layers, CFG.nh_k, n, CFG.d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((CFG.num_layers, CFG.nh_k, n, CFG.d)), jnp.float32)
    kcent = jnp.asarray(rng.standard_normal((CFG.num_layers, CFG.M, CFG.C, 2)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((CFG.num_layers, CFG.M, CFG.C, 2)), jnp.float32)
    st = paged_prefill(st, sid, k, v, kcent, vcent, CFG)
    assert int(st["seq_n_codes"][1]) == n
    assert int(st["seq_active"][1]) == 1
    from million_tpu.pq.ops import RUNTIME_ENCODE_PRECISION, pq_encode
    # the pool path encodes at the runtime precision; the oracle must too
    want = np.swapaxes(
        np.asarray(
            pq_encode(k[0], kcent[0], "strided", precision=RUNTIME_ENCODE_PRECISION)
        ),
        -1, -2,
    )
    page = int(st["page_table"][1, 0])
    np.testing.assert_array_equal(
        np.asarray(unpack_codes(st["key_pool"]))[0, page], want
    )
