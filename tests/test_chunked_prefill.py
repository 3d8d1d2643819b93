"""Chunked prefill: bounded-memory long-prompt admission.

Criteria: (a) a single chunk reproduces the flat prefill bit-for-bit;
(b) the blockwise quantized-history partial matches a dense oracle over
decoded codes exactly; (c) multi-chunk caches track the exact one-shot
prefill through decode (quantized-history error is the only divergence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.models.llama import PRESETS, init_params, prefill, decode_step
from million_tpu.models.chunked_prefill import chunked_prefill, _history_partial
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.ops.pq_attention_pallas import pack_codes
from million_tpu.pq.ops import pq_decode

CFG = PRESETS["test-tiny"]


@pytest.fixture
def setup(rng):
    params = init_params(CFG, jax.random.PRNGKey(0))
    M = CFG.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((CFG.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((CFG.num_layers, M, 32, 2)), jnp.float32),
    }
    pq_cfg = PQCacheConfig(bs=1, nh_k=CFG.num_kv_heads, d=CFG.head_dim, M=M,
                           C=32, Lt=8, N_max=128, dtype=jnp.float32)
    return params, M, cents, pq_cfg


def test_single_chunk_matches_flat_prefill(rng, setup):
    params, M, cents, pq_cfg = setup
    n = 50
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n)), jnp.int32)
    l1, c1 = chunked_prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                             cents, chunk=128)
    lf, cf = prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                     cents, mode="pq", last_logit_only=True)
    np.testing.assert_array_equal(np.asarray(c1["key_codes"]), np.asarray(cf["key_codes"]))
    # residuals are exact activations; the blockwise in-chunk partial
    # accumulates in a different order than the flat softmax -> float noise
    np.testing.assert_allclose(
        np.asarray(c1["key_residual"]), np.asarray(cf["key_residual"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lf[:, -1]), rtol=1e-4, atol=1e-4)


def test_history_partial_matches_oracle(rng, setup):
    params, M, cents, pq_cfg = setup
    bs, nh_k, d = 1, CFG.num_kv_heads, CFG.head_dim
    nh, nc, NW = CFG.num_heads, 8, 16
    kc = rng.integers(0, 32, (bs, nh_k, M, NW * 4)).astype(np.uint8)
    vc = rng.integers(0, 32, (bs, nh_k, M, NW * 4)).astype(np.uint8)
    kw, vw = pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc))
    q = jnp.asarray(rng.standard_normal((bs, nh, nc, d)), jnp.float32)
    n_prev = 37
    out, lse = _history_partial(q, kw, vw, cents["key"][0], cents["value"][0],
                                jnp.asarray(n_prev), 1.0 / d**0.5,
                                nb=4, hist_block=16)
    khat = np.asarray(pq_decode(
        jnp.asarray(np.swapaxes(kc, -1, -2)[:, :, :n_prev]), cents["key"][0], "strided"))
    vhat = np.asarray(pq_decode(
        jnp.asarray(np.swapaxes(vc, -1, -2)[:, :, :n_prev]), cents["value"][0], "strided"))
    G = nh // nh_k
    khat_e, vhat_e = np.repeat(khat, G, 1), np.repeat(vhat, G, 1)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q) / d**0.5, khat_e)
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    l = p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p / l, vhat_e)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), (m + np.log(l))[..., 0], rtol=1e-5, atol=1e-5)


def test_multi_chunk_tracks_flat_through_decode(rng, setup):
    params, M, cents, pq_cfg = setup
    n = 50
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n)), jnp.int32)
    lf, cf = prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                     cents, mode="pq", last_logit_only=True)
    lc, cc = chunked_prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                             cents, chunk=16, hist_block=16)
    assert int(cc["n_codes"][0]) == 48 and int(cc["r"][0]) == 2
    tok = jnp.asarray([3], jnp.int32)
    agree = 0
    for t in range(6):
        pos = jnp.asarray(n + t, jnp.int32)
        la, cf = decode_step(params, CFG, tok, pos, cf, cents, mode="pq")
        lb, cc = decode_step(params, CFG, tok, pos, cc, cents, mode="pq")
        agree += int(np.argmax(np.asarray(la)[0]) == np.argmax(np.asarray(lb)[0]))
        tok = jnp.asarray([int(np.argmax(np.asarray(la)[0]))], jnp.int32)
    assert agree >= 4, f"decode top-1 agreement {agree}/6"


def test_generate_with_chunked_prefill(rng, setup):
    """generate(prefill_chunk=...) admits the prompt in chunks and continues
    decoding with the standard flush schedule."""
    from million_tpu.models.llama import build_tables
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    params, M, cents, pq_cfg = setup
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 48)), jnp.int32)
    res, _ = generate(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        mode="pq_pallas", max_new_tokens=10,
        sampling=SamplingConfig(temperature=0.0), prefill_chunk=16,
    )
    assert res.tokens.shape == (1, 10)
    assert np.isfinite(res.tokens).all()
    # one-shot prefill reference: the FIRST sampled token comes straight
    # from the prefill logits, so it must match; free-running trajectories
    # on a tiny random model diverge chaotically after any perturbation
    # (teacher-forced agreement is covered by
    # test_multi_chunk_tracks_flat_through_decode)
    res1, _ = generate(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        mode="pq_pallas", max_new_tokens=10,
        sampling=SamplingConfig(temperature=0.0),
    )
    assert res.tokens[0, 0] == res1.tokens[0, 0], (res.tokens, res1.tokens)


def test_chunked_prefill_opq_matches_flat(rng, setup):
    """OPQ through chunked prefill: single chunk must reproduce the flat
    OPQ prefill (rotated codes + rotated residual tail) bit-for-bit on the
    arena, and multi-chunk must write the identical rotated codes for the
    aligned prefix while its history partial (rotated-space scores,
    unrotated output) keeps logits finite and close to the flat run."""
    params, M, cents, pq_cfg = setup
    d = CFG.head_dim

    def rand_rot(seed):
        g = np.random.default_rng(seed).standard_normal((CFG.num_layers, d, d))
        return jnp.asarray(np.linalg.qr(g)[0], jnp.float32)

    cents_rot = dict(cents)
    cents_rot["Rk"] = rand_rot(21)
    cents_rot["Rv"] = rand_rot(22)

    n = 50
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n)), jnp.int32)
    lf, cf = prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                     cents_rot, mode="pq", last_logit_only=True)

    # single chunk: near-identical arena (the rotation matmul fuses
    # differently in the two graphs, so encode argmin flips on ulp-level
    # near-ties — benign; without rotations the match is bit-exact, see
    # test_single_chunk_matches_flat_prefill) + matching logits
    def byte_agreement(a, b):
        from million_tpu.ops.pq_attention_pallas import unpack_codes

        ua = np.asarray(unpack_codes(jnp.asarray(a)))
        ub = np.asarray(unpack_codes(jnp.asarray(b)))
        return (ua == ub).mean()

    l1, c1 = chunked_prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                             cents_rot, chunk=128)
    assert byte_agreement(c1["key_codes"], cf["key_codes"]) >= 0.995
    np.testing.assert_allclose(
        np.asarray(c1["key_residual"]), np.asarray(cf["key_residual"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lf[:, -1]), rtol=1e-4, atol=1e-4)

    # multi chunk: layer 0's k/v see no attention history, so its rotated
    # codes still agree; deeper layers legitimately drift (chunks attend to
    # QUANTIZED history where the flat prefill attends to exact history —
    # same contract as the non-OPQ multi-chunk test). Decode logits from
    # the two caches must stay close.
    lm, cm = chunked_prefill(params, CFG, ids, init_state(pq_cfg, CFG.num_layers),
                             cents_rot, chunk=16)
    assert byte_agreement(cm["key_codes"][0], cf["key_codes"][0]) >= 0.995
    assert np.isfinite(np.asarray(lm)).all()
    tok = jnp.asarray([3], jnp.int32)
    agree = 0
    for t in range(6):
        pos = jnp.asarray(n + t, jnp.int32)
        lda, cf = decode_step(params, CFG, tok, pos, cf, cents_rot, mode="pq")
        ldb, cm = decode_step(params, CFG, tok, pos, cm, cents_rot, mode="pq")
        agree += int(np.argmax(np.asarray(lda)[0]) == np.argmax(np.asarray(ldb)[0]))
        tok = jnp.asarray([int(np.argmax(np.asarray(lda)[0]))], jnp.int32)
    assert agree >= 4, f"OPQ chunked-vs-flat decode top-1 agreement {agree}/6"


def test_chunked_prefill_on_mesh_matches_single_device(rng, setup):
    """Chunked admission composes with the multi-chip cache: the same
    prompt chunked on a (dp=1, tp=2, sp=2) mesh — arena sequence-sharded,
    heads tp-sharded — produces the single-device chunked result, and the
    cache stays decode-ready under the meshed decode step."""
    from million_tpu.parallel.mesh import (
        make_mesh, pq_cache_shardings, shard_pytree,
    )

    params, M, cents, pq_cfg = setup
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 48)), jnp.int32)

    logits_ref, cache_ref = chunked_prefill(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), cents,
        chunk=16, hist_block=16,
    )

    mesh = make_mesh(dp=1, tp=2, sp=2)
    cache_m = shard_pytree(
        init_state(pq_cfg, CFG.num_layers), pq_cache_shardings(mesh)
    )
    logits_m, cache_m = chunked_prefill(
        params, CFG, ids, cache_m, cents, chunk=16, hist_block=16, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(logits_m), np.asarray(logits_ref), rtol=1e-4, atol=1e-4
    )
    for k in ("key_codes", "value_codes", "n_codes", "r"):
        np.testing.assert_array_equal(
            np.asarray(cache_m[k]), np.asarray(cache_ref[k])
        )
    # decode continues on the mesh from the chunked cache
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.asarray(48, jnp.int32)
    l_ref, _ = decode_step(params, CFG, tok, pos, cache_ref, cents, mode="pq")
    l_m, _ = decode_step(
        params, CFG, tok, pos, cache_m, cents, mode="pq", mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(l_m), np.asarray(l_ref), rtol=1e-4, atol=1e-4
    )


def test_generate_chunked_prefill_with_mesh(rng, setup):
    """generate(prefill_chunk=..., mesh=...) — the round-1
    NotImplementedError seam — runs end-to-end and matches the unmeshed
    chunked generation token-for-token (greedy, tiny model)."""
    from million_tpu.models.llama import build_tables
    from million_tpu.parallel.mesh import (
        make_mesh, pq_cache_shardings, shard_pytree,
    )
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    params, M, cents, pq_cfg = setup
    tables = build_tables(cents)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 32)), jnp.int32)
    res_ref, _ = generate(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        mode="pq_pallas", max_new_tokens=10, prefill_chunk=16,
        sampling=SamplingConfig(temperature=0.0),
    )
    mesh = make_mesh(dp=1, tp=2, sp=2)
    cache_m = shard_pytree(
        init_state(pq_cfg, CFG.num_layers), pq_cache_shardings(mesh)
    )
    res_m, _ = generate(
        params, CFG, ids, cache_m, tables,
        mode="pq_pallas", max_new_tokens=10, prefill_chunk=16, mesh=mesh,
        sampling=SamplingConfig(temperature=0.0),
    )
    np.testing.assert_array_equal(res_m.tokens, res_ref.tokens)


def test_chunked_prefill_kernel_history_matches_jnp(rng, setup):
    """use_kernel=True (Pallas chunk kernel, interpret on CPU) tracks the
    jnp history partial through a multi-chunk prefill: identical codes
    (encode is unaffected) and logits within the int8-table decode noise
    (the kernel decodes with int8-quantized centroids — the engine's
    decode-path numerics)."""
    from million_tpu.models.llama import build_tables

    params, M, cents, pq_cfg = setup
    tables = build_tables(cents)
    n = 96  # 3 chunks of 32 -> history engages from chunk 2
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n)), jnp.int32)
    l_j, c_j = chunked_prefill(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        chunk=32, hist_block=32, use_kernel=False,
    )
    l_k, c_k = chunked_prefill(
        params, CFG, ids, init_state(pq_cfg, CFG.num_layers), tables,
        chunk=32, hist_block=32, use_kernel=True,
    )
    # chunk-1 codes see no history -> identical; later chunks' activations
    # carry the int8-table decode noise, so near-tie codes may flip there
    np.testing.assert_array_equal(
        np.asarray(c_j["key_codes"][..., :8]),
        np.asarray(c_k["key_codes"][..., :8]),
    )
    np.testing.assert_allclose(
        np.asarray(l_k), np.asarray(l_j), rtol=5e-2, atol=5e-2
    )


def test_chunked_prefill_outlier_channels(rng):
    """Outlier-channel chunked prefill (round 5, VERDICT r4 item 5: the
    OK/OV option reaches the 128K flat chunked path): a single chunk
    reproduces the flat outlier prefill's arenas bit-for-bit (codes +
    byte-plane outlier slabs), and a multi-chunk run with the kernelized
    history (outlier-corrected) stays close to the flat logits."""
    from million_tpu.models.llama import build_tables

    OK = OV = 4
    M = CFG.head_dim // 2
    L = CFG.num_layers
    d = CFG.head_dim
    params = init_params(CFG, jax.random.PRNGKey(0))
    koidx = np.sort(rng.choice(d, OK, replace=False)).astype(np.int32)
    voidx = np.sort(rng.choice(d, OV, replace=False)).astype(np.int32)
    ck = rng.standard_normal((L, M, 32, 2)).astype(np.float32)
    cv = rng.standard_normal((L, M, 32, 2)).astype(np.float32)
    for c in koidx:
        ck[:, c % M, :, c // M] = 0.0
    for c in voidx:
        cv[:, c % M, :, c // M] = 0.0
    cents = {
        "key": jnp.asarray(ck), "value": jnp.asarray(cv),
        "k_outlier_idx": jnp.asarray(np.stack([koidx] * L)),
        "v_outlier_idx": jnp.asarray(np.stack([voidx] * L)),
    }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(bs=1, nh_k=CFG.num_kv_heads, d=d, M=M,
                           C=32, Lt=8, N_max=128, dtype=jnp.float32,
                           OK=OK, OV=OV)
    n = 50
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, n)), jnp.int32)

    # single chunk == flat prefill writes
    l1, c1 = chunked_prefill(
        params, CFG, ids, init_state(pq_cfg, L), tables, chunk=128)
    lf, cf = prefill(params, CFG, ids, init_state(pq_cfg, L), tables,
                     mode="pq", last_logit_only=True)
    np.testing.assert_array_equal(
        np.asarray(c1["key_codes"]), np.asarray(cf["key_codes"]))
    np.testing.assert_allclose(
        np.asarray(c1["key_outliers"], np.float32),
        np.asarray(cf["key_outliers"], np.float32), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(c1["value_outliers"], np.float32),
        np.asarray(cf["value_outliers"], np.float32), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(lf[:, -1]), rtol=1e-4, atol=1e-4)

    # multi-chunk, kernelized outlier-corrected history: close to flat
    lm, cm = chunked_prefill(
        params, CFG, ids, init_state(pq_cfg, L), tables, chunk=16,
        hist_block=16, use_kernel=True)
    assert np.isfinite(np.asarray(lm)).all()
    # layer-0 writes see no history -> identical arenas
    np.testing.assert_array_equal(
        np.asarray(cm["key_codes"][0]), np.asarray(cf["key_codes"][0]))
    np.testing.assert_allclose(
        np.asarray(cm["key_outliers"][0], np.float32),
        np.asarray(cf["key_outliers"][0], np.float32), rtol=1e-3, atol=1e-3)
    # the corrections must MOVE the history attention toward the exact
    # flat answer: run the same codebooks with the outlier idx stripped
    # (decoded channels stay 0) and compare agreement with the flat
    # logits. Random test codebooks leave large quantization noise either
    # way, so the assertion is the improvement, not an absolute match
    # (measured here: corr 0.64 -> 0.87, maxdiff 1.69 -> 1.02).
    tables_noo = {k: v for k, v in tables.items() if "outlier" not in k}
    pq_noo = PQCacheConfig(bs=1, nh_k=CFG.num_kv_heads, d=d, M=M,
                           C=32, Lt=8, N_max=128, dtype=jnp.float32)
    ln, _ = chunked_prefill(
        params, CFG, ids, init_state(pq_noo, L), tables_noo, chunk=16,
        hist_block=16, use_kernel=True)
    f = np.asarray(lf)[0, -1]
    corr_o = np.corrcoef(np.asarray(lm)[0], f)[0, 1]
    corr_n = np.corrcoef(np.asarray(ln)[0], f)[0, 1]
    assert corr_o > corr_n + 0.05 and corr_o > 0.8, (corr_o, corr_n)
