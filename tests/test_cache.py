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


class TestWideCodes:
    """nbits > 8 (C > 256): int16 arena, jnp attention path — the BASELINE
    nbits 9-12 sensitivity ladder's storage (reference nbits2dtype,
    pq_utils.py:542-552; pure-torch path modeling_llama.py:218-343)."""

    def test_store_load_roundtrip_int16(self, rng):
        from million_tpu.cache.pq_cache import load_codes_t, store_codes_t

        codes = jnp.asarray(rng.integers(0, 512, (2, 3, 8, 64)), jnp.int32)
        arena = store_codes_t(codes, True)
        assert arena.dtype == jnp.int16 and arena.shape == codes.shape
        np.testing.assert_array_equal(np.asarray(load_codes_t(arena)), np.asarray(codes))

    def test_wide_cache_shapes(self):
        from million_tpu.cache.pq_cache import (
            PQCacheConfig, arena_tokens, init_layer_state,
        )

        cfg = PQCacheConfig(bs=1, nh_k=2, d=16, M=8, C=1024, Lt=8, N_max=64)
        st = init_layer_state(cfg)
        assert st["key_codes"].dtype == jnp.int16
        assert st["key_codes"].shape == (1, 2, 8, 64)
        assert arena_tokens(st["key_codes"]) == 64

    def test_wide_flush_and_decode_update(self, rng):
        """flush_window writes int16 codes at token granularity; contents
        decode back through the arena exactly as encoded."""
        from million_tpu.cache.pq_cache import (
            PQCacheConfig, flush_window, init_layer_state, load_codes_t,
        )
        from million_tpu.pq.ops import pq_encode

        cfg = PQCacheConfig(
            bs=1, nh_k=2, d=16, M=8, C=512, Lt=8, N_max=64, dtype=jnp.float32
        )
        st = dict(init_layer_state(cfg))
        res = rng.standard_normal((1, 2, 8, 16)).astype(np.float32)
        st["key_residual"] = jnp.asarray(res)
        st["value_residual"] = jnp.asarray(res)
        kcent = jnp.asarray(rng.standard_normal((8, 512, 2)), jnp.float32)
        vcent = jnp.asarray(rng.standard_normal((8, 512, 2)), jnp.float32)
        st2 = flush_window(st, kcent, vcent)
        assert int(st2["n_codes"]) == 8 and int(st2["r"]) == 0
        want = np.asarray(
            pq_encode(jnp.asarray(res), kcent, "strided", precision="fast")
        )  # (1, 2, 8 tokens, M)
        got = np.swapaxes(
            np.asarray(load_codes_t(st2["key_codes"]))[:, :, :, :8], -1, -2
        )
        # runtime fused encode vs jnp fast: near-ties only — check high
        # agreement rather than bit equality
        assert (got == want).mean() > 0.97

    def test_wide_generate_e2e(self, rng):
        """Tiny-model generation with nbits=9: pq_pallas auto-demotes to the
        jnp path; pq and pq_pallas modes produce IDENTICAL tokens (same
        route), and generation crosses a flush boundary."""
        import dataclasses

        from million_tpu.cache.pq_cache import PQCacheConfig, init_state
        from million_tpu.models.llama import PRESETS, build_tables, init_params
        from million_tpu.runtime.generate import generate
        from million_tpu.runtime.sampling import SamplingConfig

        cfg = dataclasses.replace(PRESETS["test-tiny"], num_layers=2)
        params = init_params(cfg, jax.random.PRNGKey(0))
        M, C = cfg.head_dim // 2, 512
        cents = {
            "key": jnp.asarray(
                rng.standard_normal((2, M, C, 2)), jnp.float32
            ),
            "value": jnp.asarray(
                rng.standard_normal((2, M, C, 2)), jnp.float32
            ),
        }
        tables = build_tables(cents)
        assert "kpack" not in tables  # wide: no kernel tables
        pq_cfg = PQCacheConfig(
            bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C, Lt=8,
            N_max=128, dtype=jnp.float32,
        )
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
        outs = {}
        for mode in ("pq", "pq_pallas"):
            res, cache = generate(
                params, cfg, ids, init_state(pq_cfg, 2), tables, mode=mode,
                max_new_tokens=16, sampling=SamplingConfig(temperature=0.0),
            )
            outs[mode] = res.tokens
            assert cache["key_codes"].dtype == jnp.int16
            assert int(cache["n_codes"][0]) > 12  # flushed past the prompt
        np.testing.assert_array_equal(outs["pq"], outs["pq_pallas"])
