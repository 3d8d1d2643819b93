"""End-to-end model tests: PQ path vs dense path.

The strongest check: while total tokens < Lt, the PQ decode path keeps every
token in the exact residual window, so its logits must match the dense-cache
baseline to numerical precision — this validates the entire wiring
(projections, RoPE, cache state machine, LSE merge) independent of
codebook quality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.models.llama import (
    PRESETS,
    init_params,
    prefill,
    decode_step,
)
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
from million_tpu.pq.kmeans import train_pq


CFG = PRESETS["test-tiny"]


def make_model(rng):
    params = init_params(CFG, jax.random.PRNGKey(0))
    M = CFG.head_dim // 2
    kc = jnp.asarray(rng.standard_normal((CFG.num_layers, M, 32, 2)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((CFG.num_layers, M, 32, 2)), jnp.float32)
    cents = {"key": kc, "value": vc}
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=CFG.num_kv_heads, d=CFG.head_dim, M=M, C=32, Lt=8, N_max=128,
        dtype=jnp.float32,
    )
    dense_cfg = DenseCacheConfig(
        bs=1, nh_k=CFG.num_kv_heads, d=CFG.head_dim, N_max=136, dtype=jnp.float32
    )
    return params, cents, pq_cfg, dense_cfg


def test_decode_in_residual_matches_dense(rng):
    """< Lt tokens, no prefill: PQ == dense exactly (residual is exact)."""
    params, cents, pq_cfg, dense_cfg = make_model(rng)
    pq_cache = init_state(pq_cfg, CFG.num_layers)
    dn_cache = init_dense_state(dense_cfg, CFG.num_layers)
    toks = rng.integers(0, CFG.vocab_size, 6)
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([tok], jnp.int32)
        pos = jnp.asarray(t, jnp.int32)
        lp, pq_cache = decode_step(params, CFG, tok_a, pos, pq_cache, cents, mode="pq")
        ld, dn_cache = decode_step(params, CFG, tok_a, pos, dn_cache, None, mode="dense")
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ld), rtol=1e-3, atol=1e-3)


def test_prefill_pq_matches_dense_logits(rng):
    """Prefill attention is exact in both modes (distort_recent=False)."""
    params, cents, pq_cfg, dense_cfg = make_model(rng)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 12)), jnp.int32)
    lp, pq_cache = prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers), cents, mode="pq")
    ld, _ = prefill(params, CFG, ids, init_dense_state(dense_cfg, CFG.num_layers), None, mode="dense")
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld), rtol=1e-3, atol=1e-3)
    assert int(pq_cache["n_codes"][0]) == 12


def test_generate_with_trained_codebooks_tracks_dense(rng):
    """With codebooks trained on the model's own KV vectors, PQ decode after a
    prefill should produce logits close to dense (the ppl-parity property,
    scaled down). Uses enough decode steps to cross a residual flush."""
    params, cents_rand, pq_cfg, dense_cfg = make_model(rng)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 24)), jnp.int32)

    # Collect KV samples by running a dense prefill and capturing k/v via the
    # cache (the "sampling stage" analogue, modeling_llama.py:21-125).
    dn_cache0 = init_dense_state(dense_cfg, CFG.num_layers)
    _, dn_filled = prefill(params, CFG, ids, dn_cache0, None, mode="dense")
    M = pq_cfg.M
    key_cents, val_cents = [], []
    for layer in range(CFG.num_layers):
        ksamp = np.asarray(dn_filled["k"][layer, 0, :, :24]).reshape(-1, CFG.head_dim)
        vsamp = np.asarray(dn_filled["v"][layer, 0, :, :24]).reshape(-1, CFG.head_dim)
        key_cents.append(
            np.asarray(train_pq(jnp.asarray(ksamp), M=M, nbits=5, iters=8, layout="strided"))
        )
        val_cents.append(
            np.asarray(train_pq(jnp.asarray(vsamp), M=M, nbits=5, iters=8, layout="strided"))
        )
    cents = {
        "key": jnp.asarray(np.stack(key_cents)),
        "value": jnp.asarray(np.stack(val_cents)),
    }

    pq_cache = init_state(pq_cfg, CFG.num_layers)
    dn_cache = init_dense_state(dense_cfg, CFG.num_layers)
    lp, pq_cache = prefill(params, CFG, ids, pq_cache, cents, mode="pq")
    ld, dn_cache = prefill(params, CFG, ids, dn_cache, None, mode="dense")

    agree = 0
    r_host = 24 % 4  # host-side flush schedule (see runtime/generate.py)
    for t in range(10):  # crosses the Lt=8 residual flush
        tok = jnp.asarray([int(np.argmax(np.asarray(ld)[0, -1] if t == 0 else ld_step))], jnp.int32)
        pos = jnp.asarray(24 + t, jnp.int32)
        flush = r_host >= 8
        if flush:
            r_host = 0
        r_host += 1
        lp_step, pq_cache = decode_step(
            params, CFG, tok, pos, pq_cache, cents, mode="pq", flush=flush
        )
        ld_full, dn_cache = decode_step(params, CFG, tok, pos, dn_cache, None, mode="dense")
        ld_step = np.asarray(ld_full)[0]
        agree += int(np.argmax(np.asarray(lp_step)[0]) == np.argmax(ld_step))
    assert np.isfinite(np.asarray(lp_step)).all()
    assert agree >= 6  # top-1 agreement on most steps (tiny random model,
    # nbits=5 codebooks — loose by construction; real-ppl parity is the
    # benchmark suite's job)
    assert int(pq_cache["n_codes"][0]) > 24  # flush happened


@pytest.mark.parametrize("preset", ["llama-3.1-8b", "tinyllama-1.1b"])
def test_presets_construct(preset):
    cfg = PRESETS[preset]
    assert cfg.num_heads % cfg.num_kv_heads == 0


def test_pallas_mode_matches_ref_mode(rng):
    """mode="pq_pallas" (fused kernel + residual merge) must match mode="pq"
    (jnp oracle) closely — same cache state machine, same math. Tolerance
    covers the kernel's int8 centroid quantization (DecodeTable), which the
    f32-centroid oracle does not model."""
    from million_tpu.models.llama import build_tables

    params, cents, pq_cfg, dense_cfg = make_model(rng)
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)), jnp.int32)
    cache_a = init_state(pq_cfg, CFG.num_layers)
    cache_b = init_state(pq_cfg, CFG.num_layers)
    la, cache_a = prefill(params, CFG, ids, cache_a, cents, mode="pq")
    lb, cache_b = prefill(params, CFG, ids, cache_b, tables, mode="pq")
    toks = rng.integers(0, CFG.vocab_size, 4)
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([tok], jnp.int32)
        pos = jnp.asarray(16 + t, jnp.int32)
        la, cache_a = decode_step(params, CFG, tok_a, pos, cache_a, cents, mode="pq")
        lb, cache_b = decode_step(params, CFG, tok_a, pos, cache_b, tables, mode="pq_pallas")
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=5e-2, atol=5e-2)


def test_pallas_mode_matches_ref_mode_dm4(rng):
    """Same agreement with the M=d/4 (d_m=4) layout — the reference's M=32
    kernel shape at d=128 (setup.py:13), served here by the direct-table
    fast path (C<=128 implies direct in build_tables)."""
    from million_tpu.models.llama import build_tables

    params = init_params(CFG, jax.random.PRNGKey(0))
    M = CFG.head_dim // 4
    kc = jnp.asarray(rng.standard_normal((CFG.num_layers, M, 32, 4)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((CFG.num_layers, M, 32, 4)), jnp.float32)
    cents = {"key": kc, "value": vc}
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=CFG.num_kv_heads, d=CFG.head_dim, M=M, C=32, Lt=8, N_max=128,
        dtype=jnp.float32,
    )
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)), jnp.int32)
    cache_a = init_state(pq_cfg, CFG.num_layers)
    cache_b = init_state(pq_cfg, CFG.num_layers)
    la, cache_a = prefill(params, CFG, ids, cache_a, cents, mode="pq")
    lb, cache_b = prefill(params, CFG, ids, cache_b, tables, mode="pq")
    toks = rng.integers(0, CFG.vocab_size, 4)
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([tok], jnp.int32)
        pos = jnp.asarray(16 + t, jnp.int32)
        la, cache_a = decode_step(params, CFG, tok_a, pos, cache_a, cents, mode="pq")
        lb, cache_b = decode_step(params, CFG, tok_a, pos, cache_b, tables, mode="pq_pallas")
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=5e-2, atol=5e-2)


def test_pallas_mode_matches_ref_mode_dm8(rng):
    """Same agreement with the M=d/8 (d_m=8) layout — the reference's M=16
    kernel shape at d=128 (setup.py:13), served by plane-stacked pair
    tables (C=256 -> 4 pair planes); closes the last hole in the
    reference's compiled-shape matrix."""
    from million_tpu.models.llama import build_tables

    params = init_params(CFG, jax.random.PRNGKey(0))
    M = CFG.head_dim // 8
    kc = jnp.asarray(rng.standard_normal((CFG.num_layers, M, 256, 8)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((CFG.num_layers, M, 256, 8)), jnp.float32)
    cents = {"key": kc, "value": vc}
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=CFG.num_kv_heads, d=CFG.head_dim, M=M, C=256, Lt=8, N_max=128,
        dtype=jnp.float32,
    )
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)), jnp.int32)
    cache_a = init_state(pq_cfg, CFG.num_layers)
    cache_b = init_state(pq_cfg, CFG.num_layers)
    la, cache_a = prefill(params, CFG, ids, cache_a, cents, mode="pq")
    lb, cache_b = prefill(params, CFG, ids, cache_b, tables, mode="pq")
    toks = rng.integers(0, CFG.vocab_size, 4)
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([tok], jnp.int32)
        pos = jnp.asarray(16 + t, jnp.int32)
        la, cache_a = decode_step(params, CFG, tok_a, pos, cache_a, cents, mode="pq")
        lb, cache_b = decode_step(params, CFG, tok_a, pos, cache_b, tables, mode="pq_pallas")
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=5e-2, atol=5e-2)


def test_generate_selfcheck(rng):
    """selfcheck_every cross-checks kernel steps against the oracle in-flight
    (reference's embedded runtime self-check, pq_utils.py:330-381)."""
    from million_tpu.models.llama import build_tables
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    params, cents, pq_cfg, _ = make_model(rng)
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 12)), jnp.int32)
    res, _ = generate(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        mode="pq_pallas", max_new_tokens=6,
        sampling=SamplingConfig(temperature=0.0), selfcheck_every=2,
    )
    # oracle decodes f32 centroids; kernel uses int8 tables — small gap
    assert 0.0 < res.selfcheck_max_diff < 0.5


def test_pallas_mode_matches_ref_mode_asymmetric(rng):
    """Asymmetric geometry: K at d_m=2 (score resolution), V at d_m=4 (half
    the V-side gathers and code bytes). Kernel path must track the oracle."""
    from million_tpu.models.llama import build_tables

    params = init_params(CFG, jax.random.PRNGKey(0))
    M_k, M_v = CFG.head_dim // 2, CFG.head_dim // 4
    kc = jnp.asarray(rng.standard_normal((CFG.num_layers, M_k, 32, 2)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((CFG.num_layers, M_v, 32, 4)), jnp.float32)
    cents = {"key": kc, "value": vc}
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=CFG.num_kv_heads, d=CFG.head_dim, M=M_k, M_v=M_v, C=32,
        Lt=8, N_max=128, dtype=jnp.float32,
    )
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)), jnp.int32)
    cache_a = init_state(pq_cfg, CFG.num_layers)
    cache_b = init_state(pq_cfg, CFG.num_layers)
    la, cache_a = prefill(params, CFG, ids, cache_a, cents, mode="pq")
    lb, cache_b = prefill(params, CFG, ids, cache_b, tables, mode="pq")
    assert cache_b["value_codes"].shape[3] == M_v
    toks = rng.integers(0, CFG.vocab_size, 4)
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([tok], jnp.int32)
        pos = jnp.asarray(16 + t, jnp.int32)
        la, cache_a = decode_step(params, CFG, tok_a, pos, cache_a, cents, mode="pq")
        lb, cache_b = decode_step(params, CFG, tok_a, pos, cache_b, tables, mode="pq_pallas")
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=5e-2, atol=5e-2)


def test_opq_rotated_cache_matches_unrotated_exactly_in_residual(rng):
    """OPQ end-to-end: with orthogonal rotations attached to cents
    ({"Rk","Rv"}), decode logits while ALL tokens still sit in the exact
    residual window must match the unrotated run exactly (orthogonal
    invariance: q'.k' = q.k and the output unrotation inverts V's) — and
    after a flush, pq and pq_pallas must still agree with each other."""
    from million_tpu.models.llama import build_tables

    params, cents, pq_cfg, _ = make_model(rng)
    d = CFG.head_dim
    # random orthogonal rotations per layer/side (QR of a gaussian)
    def rand_rot(seed):
        g = np.random.default_rng(seed).standard_normal((CFG.num_layers, d, d))
        return jnp.asarray(np.linalg.qr(g)[0], jnp.float32)

    cents_rot = dict(cents)
    cents_rot["Rk"] = rand_rot(1)
    cents_rot["Rv"] = rand_rot(2)

    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 5)), jnp.int32)  # r=1 after
    ca = init_state(pq_cfg, CFG.num_layers)
    cb = init_state(pq_cfg, CFG.num_layers)
    la, ca = prefill(params, CFG, ids, ca, cents, mode="pq")
    lb, cb = prefill(params, CFG, ids, cb, cents_rot, mode="pq")
    # prefill attention is exact in both; logits identical
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-4)

    # a couple of decode steps: only 4 codes in the arena (prefix), rest in
    # residual — the rotated run differs from the unrotated only through
    # the quantization of the 4-token prefix, so compare pq vs pq_pallas
    # agreement WITHIN the rotated configuration instead.
    tables_rot = build_tables(cents_rot)
    cc = init_state(pq_cfg, CFG.num_layers)
    _, cc = prefill(params, CFG, ids, cc, tables_rot, mode="pq")
    tok = jnp.asarray([7], jnp.int32)
    for t in range(6):  # crosses the Lt=8 flush (r: 1 -> 7 + appends)
        pos = jnp.asarray(5 + t, jnp.int32)
        flush = (1 + t) >= 8
        lb, cb = decode_step(params, CFG, tok, pos, cb, cents_rot, mode="pq", flush=flush)
        lc, cc = decode_step(params, CFG, tok, pos, cc, tables_rot, mode="pq_pallas", flush=flush)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(lc), rtol=5e-2, atol=5e-2)
    assert np.isfinite(np.asarray(lc)).all()


def test_generate_edge_probes(rng):
    """Edge probes from the verification recipe: max_new_tokens=1,
    generation across the Lt flush boundary, temperature+top_k sampling,
    and the load-bearing cache-overflow guard (inside jit the write would
    CLAMP and silently corrupt the newest codes)."""
    import pytest

    from million_tpu.models.llama import build_tables
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    params, cents, pq_cfg, _ = make_model(rng)
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 12)), jnp.int32)

    # max_new_tokens=1: prefill-only sampling
    res, _ = generate(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        mode="pq_pallas", max_new_tokens=1,
    )
    assert res.tokens.shape == (1, 1)

    # crosses the Lt=8 residual flush with temperature+top_k sampling
    res, _ = generate(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        mode="pq_pallas", max_new_tokens=20,
        sampling=SamplingConfig(temperature=0.8, top_k=5),
    )
    assert res.tokens.shape == (1, 20)
    assert np.isfinite(res.tokens).all()

    # overflow guard: prompt + flushed windows exceeding N_max must raise
    # BEFORE any device work
    with pytest.raises(ValueError, match="N_max"):
        generate(
            params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
            mode="pq_pallas", max_new_tokens=4 * pq_cfg.N_max,
        )


def test_qwen2_style_bias_generation(rng):
    """attn_bias models generate through the full PQ stack (flat decode)."""
    import dataclasses

    from million_tpu.models.llama import build_tables
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    cfg = dataclasses.replace(CFG, attn_bias=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "bq" in params["layers"]
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    pq_cfg = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M,
                           C=32, Lt=8, N_max=128, dtype=jnp.float32)
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    res, _ = generate(
        params, cfg, ids, init_state(pq_cfg, cfg.num_layers), tables,
        mode="pq_pallas", max_new_tokens=10,
        sampling=SamplingConfig(temperature=0.0),
    )
    assert np.isfinite(res.tokens).all()


def test_outlier_mode_pq_vs_pallas_across_flush(rng):
    """Outlier-channel runtime (north star): coarse d_m=4 K and V with
    exact outlier channels — prefill, decode, and the window flush must
    agree between the jnp oracle path (mode='pq') and the
    outlier-corrected kernel (mode='pq_pallas')."""
    from million_tpu.models.llama import build_tables
    from million_tpu.pq.kmeans import train_pq
    from million_tpu.pq.ops import select_outlier_channels, zero_channels

    params = init_params(CFG, jax.random.PRNGKey(0))
    d = CFG.head_dim
    M = d // 4  # coarse geometry, C <= 128 -> direct tables
    L = CFG.num_layers
    OK = OV = 4
    # codebooks trained on ZEROED samples (production contract: outlier
    # components decode to exactly 0)
    samples = rng.standard_normal((2048, d)).astype(np.float32)
    samples[:, :2] *= 8.0  # make some channels genuinely heavy
    koidx = np.stack([
        np.asarray(select_outlier_channels(jnp.asarray(samples), OK))
        for _ in range(L)
    ])
    zs = np.asarray(zero_channels(jnp.asarray(samples), jnp.asarray(koidx[0])))
    cents_one = np.asarray(train_pq(jnp.asarray(zs), M=M, nbits=6, iters=8,
                                    layout="strided"))
    kc = jnp.asarray(np.stack([cents_one] * L), jnp.float32)
    cents = {
        "key": kc, "value": kc,
        "k_outlier_idx": jnp.asarray(koidx, jnp.int32),
        "v_outlier_idx": jnp.asarray(koidx, jnp.int32),
    }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=CFG.num_kv_heads, d=d, M=M, C=64, Lt=8, N_max=128,
        dtype=jnp.float32, OK=OK, OV=OV,
    )
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 17)), jnp.int32)
    cache_a = init_state(pq_cfg, L)
    cache_b = init_state(pq_cfg, L)
    la, cache_a = prefill(params, CFG, ids, cache_a, cents, mode="pq")
    lb, cache_b = prefill(params, CFG, ids, cache_b, tables, mode="pq")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4,
                               atol=1e-4)
    toks = rng.integers(0, CFG.vocab_size, 10)  # crosses the Lt=8 flush
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([tok], jnp.int32)
        pos = jnp.asarray(17 + t, jnp.int32)
        la, cache_a = decode_step(params, CFG, tok_a, pos, cache_a, cents,
                                  mode="pq")
        lb, cache_b = decode_step(params, CFG, tok_a, pos, cache_b, tables,
                                  mode="pq_pallas")
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-2, atol=5e-2)
    # both paths flushed the outlier arenas identically
    np.testing.assert_allclose(
        np.asarray(cache_a["key_outliers"], np.float32),
        np.asarray(cache_b["key_outliers"], np.float32),
    )


def test_subwindow_flush_exactness(rng):
    """_flush_windows_stacked(n=F) must encode exactly the OLDEST F rows
    into the arena, roll the survivors down, and advance counters by F —
    the reference-semantics full flush (n=0) stays byte-identical."""
    import dataclasses
    from million_tpu.models.llama import PRESETS, _flush_windows_stacked
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.pq.ops import RUNTIME_ENCODE_PRECISION, pq_encode
    from million_tpu.ops.pq_attention_pallas import unpack_codes

    L, bs, H, Lt, d, M, C, F = 2, 1, 2, 16, 32, 16, 64, 8
    cfg = PQCacheConfig(bs=bs, nh_k=H, d=d, M=M, C=C, Lt=Lt, N_max=128,
                        dtype=jnp.float32)
    cache = init_state(cfg, L)
    cache = dict(cache)
    res = rng.standard_normal((L, bs, H, Lt, d)).astype(np.float32)
    cache["key_residual"] = jnp.asarray(res)
    cache["value_residual"] = jnp.asarray(res * 0.5)
    cache["n_codes"] = jnp.full((L,), 8, jnp.int32)
    cache["r"] = jnp.full((L,), Lt, jnp.int32)
    cents = {
        "key": jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32),
    }
    out = _flush_windows_stacked(dict(cache), cents, n=F)
    assert int(out["n_codes"][0]) == 8 + F
    assert int(out["r"][0]) == Lt - F
    # arena words [8, 8+F) hold the codes of the OLDEST F rows
    want = np.asarray(pq_encode(
        jnp.asarray(res[0, :, :, :F]), cents["key"][0], "strided",
        precision=RUNTIME_ENCODE_PRECISION))
    got = np.swapaxes(
        np.asarray(unpack_codes(out["key_codes"]))[0, :, :, :, 8:8 + F],
        -1, -2)
    np.testing.assert_array_equal(got, want)
    # survivors rolled down: new row j == old row j+F
    np.testing.assert_array_equal(
        np.asarray(out["key_residual"][:, :, :, : Lt - F]),
        res[:, :, :, F:],
    )


def test_generate_subwindow_flush_tracks_full_flush(rng):
    """generate(flush_chunk=F) must track full-window flushing: same
    engine, earlier (smaller) flushes — greedy tokens agree to the usual
    near-tie tolerance, and generation crosses several sub-flushes."""
    from million_tpu.models.llama import PRESETS, init_params, build_tables
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    cfg = PRESETS["test-tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M,
                           C=32, Lt=8, N_max=128, dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 10)), jnp.int32)
    outs = {}
    for fc in (0, 4):
        res, _ = generate(
            params, cfg, ids, init_state(pq_cfg, cfg.num_layers), tables,
            mode="pq", max_new_tokens=20,
            sampling=SamplingConfig(temperature=0.0), flush_chunk=fc,
        )
        outs[fc] = np.asarray(res.tokens[0])
    # greedy tokens on a tiny random-ish model are chaotic under ANY
    # quantization-timing change (near-tie codes flip; the verify-skill
    # notes pin the same caveat for OPQ) — the byte-level exactness of the
    # flush is pinned by test_subwindow_flush_exactness; here we check the
    # engine runs through several sub-flushes and stays sane
    agree = (outs[0] == outs[4]).mean()
    assert np.isfinite(outs[4]).all()
    assert agree >= 0.3, f"sub-window flush diverged wildly: {agree}: {outs}"
