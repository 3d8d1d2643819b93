"""Unit tests for the functional PQ cache state machine."""

import numpy as np
import jax
import jax.numpy as jnp

from million_tpu.cache.pq_cache import (
    PQCacheConfig,
    init_layer_state,
    init_state,
    prefill_update,
    decode_update,
    cache_memory_bytes,
)
from million_tpu.ops.pq_attention_pallas import unpack_codes
from million_tpu.pq.ops import pq_encode


def mk(rng, cfg):
    kcent = jnp.asarray(rng.standard_normal((cfg.M, cfg.C, cfg.d // cfg.M)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((cfg.M, cfg.C, cfg.d // cfg.M)), jnp.float32)
    return kcent, vcent


def arena_codes(st):
    """Unpack the word arena back to transposed uint8 codes."""
    return np.asarray(unpack_codes(st["key_codes"]))


def test_prefill_writes_codes(rng):
    cfg = PQCacheConfig(bs=1, nh_k=2, d=16, M=8, C=32, Lt=8, N_max=64, dtype=jnp.float32)
    kcent, vcent = mk(rng, cfg)
    st = init_layer_state(cfg)
    k = jnp.asarray(rng.standard_normal((1, 2, 12, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 12, 16)), jnp.float32)
    st = prefill_update(st, k, v, kcent, vcent)
    assert int(st["n_codes"]) == 12
    assert int(st["r"]) == 0
    want = np.swapaxes(np.asarray(pq_encode(k, kcent, "strided")), -1, -2)
    np.testing.assert_array_equal(arena_codes(st)[:, :, :, :12], want)


def test_prefill_ragged_tail_goes_to_residual(rng):
    """A prompt of n % 4 != 0: the aligned prefix is quantized into the word
    arena; the tail tokens stay EXACT in the residual window (strictly better
    than the reference, which quantizes everything)."""
    cfg = PQCacheConfig(bs=1, nh_k=2, d=16, M=8, C=32, Lt=8, N_max=64, dtype=jnp.float32)
    kcent, vcent = mk(rng, cfg)
    st = init_layer_state(cfg)
    k = jnp.asarray(rng.standard_normal((1, 2, 10, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 10, 16)), jnp.float32)
    st = prefill_update(st, k, v, kcent, vcent)
    assert int(st["n_codes"]) == 8
    assert int(st["r"]) == 2
    want = np.swapaxes(np.asarray(pq_encode(k[:, :, :8], kcent, "strided")), -1, -2)
    np.testing.assert_array_equal(arena_codes(st)[:, :, :, :8], want)
    np.testing.assert_allclose(
        np.asarray(st["key_residual"])[:, :, :2], np.asarray(k)[:, :, 8:], rtol=1e-6
    )
    # the tail's codes are NOT in the arena yet — they are produced by the
    # batched flush_window encode when the residual window fills
    got_tail = np.asarray(unpack_codes(st["key_codes"]))[:, :, :, 8:10]
    np.testing.assert_array_equal(got_tail, np.zeros_like(got_tail))


def test_chunked_prefill_appends(rng):
    cfg = PQCacheConfig(bs=1, nh_k=1, d=16, M=8, C=32, Lt=8, N_max=64, dtype=jnp.float32)
    kcent, vcent = mk(rng, cfg)
    k = jnp.asarray(rng.standard_normal((1, 1, 12, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 12, 16)), jnp.float32)
    st = init_layer_state(cfg)
    st = prefill_update(st, k[:, :, :4], v[:, :, :4], kcent, vcent)
    st = prefill_update(st, k[:, :, 4:], v[:, :, 4:], kcent, vcent)
    st2 = prefill_update(init_layer_state(cfg), k, v, kcent, vcent)
    np.testing.assert_array_equal(
        np.asarray(st["key_codes"]), np.asarray(st2["key_codes"])
    )
    assert int(st["n_codes"]) == 12


def test_decode_residual_then_flush(rng):
    cfg = PQCacheConfig(bs=1, nh_k=1, d=16, M=8, C=32, Lt=4, N_max=64, dtype=jnp.float32)
    kcent, vcent = mk(rng, cfg)
    st = init_layer_state(cfg)
    ks = rng.standard_normal((6, 1, 1, 1, 16)).astype(np.float32)
    vs = rng.standard_normal((6, 1, 1, 1, 16)).astype(np.float32)
    for t in range(4):
        st = decode_update(st, jnp.asarray(ks[t]), jnp.asarray(vs[t]), kcent, vcent)
        assert int(st["r"]) == t + 1
        assert int(st["n_codes"]) == 0
    # 5th token triggers the flush of the 4 residual tokens first
    st = decode_update(st, jnp.asarray(ks[4]), jnp.asarray(vs[4]), kcent, vcent)
    assert int(st["n_codes"]) == 4
    assert int(st["r"]) == 1
    want = np.swapaxes(
        np.asarray(pq_encode(jnp.asarray(ks[:4, 0].transpose(1, 2, 0, 3)), kcent, "strided")),
        -1, -2,
    )
    np.testing.assert_array_equal(arena_codes(st)[:, :, :, :4], want)
    # residual slot 0 now holds token 4
    np.testing.assert_allclose(
        np.asarray(st["key_residual"])[0, 0, 0], ks[4, 0, 0, 0], rtol=1e-6
    )
    st = decode_update(st, jnp.asarray(ks[5]), jnp.asarray(vs[5]), kcent, vcent)
    assert int(st["r"]) == 2


def test_decode_update_jits_and_donates(rng):
    cfg = PQCacheConfig(bs=1, nh_k=1, d=16, M=8, C=32, Lt=4, N_max=64, dtype=jnp.float32)
    kcent, vcent = mk(rng, cfg)
    step = jax.jit(decode_update, donate_argnums=(0,))
    st = init_layer_state(cfg)
    for t in range(9):
        k = jnp.asarray(rng.standard_normal((1, 1, 1, 16)), jnp.float32)
        st = step(st, k, k, kcent, vcent)
    assert int(st["n_codes"]) == 8
    assert int(st["r"]) == 1


def test_stacked_init_and_memory():
    cfg = PQCacheConfig(bs=1, nh_k=4, d=128, M=64, C=256, Lt=128, N_max=8192)
    st = init_state(cfg, num_layers=3)
    assert st["key_codes"].shape == (3, 1, 4, 64, 8192 // 4)
    assert st["key_codes"].dtype == jnp.int32
    mem = cache_memory_bytes(cfg, 3)
    # 4-bit effective: codes are ~4x smaller than dense bf16 KV on the arena
    assert 3.0 < mem["compression"] < 4.5
