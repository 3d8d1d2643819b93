"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P, NamedSharding

from million_tpu.parallel.mesh import make_mesh, pq_cache_shardings
from million_tpu.parallel.sharded_decode import sharded_pq_codes_attention
from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    pack_codes,
    pack_decode_table,
    pq_codes_attention,
)


def test_mesh_axes():
    mesh = make_mesh(dp=2, tp=2, sp=2)
    assert mesh.shape == {"dcn": 1, "dp": 2, "tp": 2, "sp": 2}


@pytest.mark.parametrize(
    "dcn,dp,tp,sp", [(1, 1, 1, 8), (1, 2, 1, 4), (1, 2, 2, 2), (2, 1, 1, 4), (2, 2, 1, 2)]
)
def test_sharded_attention_matches_single_device(rng, dcn, dp, tp, sp):
    """Sequence shards over ("dcn", "sp") — dcn>1 models multi-slice: each
    slice owns a contiguous token super-range, merged with the same
    associative LSE combine over both axes."""
    mesh = make_mesh(dp=dp, tp=tp, sp=sp, dcn=dcn)
    bs, nh_k, d, M, C, N = dp, 2 * tp, 32, 16, 256, 1024
    n_codes = 700
    q = jnp.asarray(
        rng.standard_normal((bs, nh_k, GROUP_PAD, d)) / d**0.5, jnp.bfloat16
    )
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    kcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    kpack, vpack = pack_decode_table(kcent), pack_decode_table(vcent)
    nc = jnp.asarray(n_codes, jnp.int32)

    want_out, want_lse = pq_codes_attention(
        q, kc, vc, kpack, vpack, nc, block=128
    )
    got_out, got_lse = sharded_pq_codes_attention(
        mesh, q, kc, vc, kpack, vpack, nc, block=128
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_lse), np.asarray(want_lse), rtol=2e-3, atol=2e-3
    )


def test_sharded_attention_with_placed_inputs(rng):
    """Same result when inputs are actually device_put with the cache
    shardings (codes split over sp on the last axis)."""
    mesh = make_mesh(dp=1, tp=2, sp=4)
    bs, nh_k, d, M, C, N = 1, 2, 32, 16, 64, 512
    q = jnp.asarray(
        rng.standard_normal((bs, nh_k, GROUP_PAD, d)) / d**0.5, jnp.bfloat16
    )
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    kcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    kpack, vpack = pack_decode_table(kcent), pack_decode_table(vcent)
    nc = jnp.asarray(300, jnp.int32)

    kc_sh = jax.device_put(kc, NamedSharding(mesh, P(None, "tp", None, "sp")))
    vc_sh = jax.device_put(vc, NamedSharding(mesh, P(None, "tp", None, "sp")))

    want, _ = pq_codes_attention(q, kc, vc, kpack, vpack, nc, block=128)
    got, _ = sharded_pq_codes_attention(
        mesh, q, kc_sh, vc_sh, kpack, vpack, nc, block=128
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_sharded_stacked_attention_multislice(rng):
    """Stacked-arena sharded attention on a 2-slice mesh (dcn=2, sp=2):
    layer selected by scalar index, sequence sharded over (dcn, sp), LSE
    merged hierarchically — matches the single-device stacked kernel."""
    from million_tpu.ops.pq_attention_pallas import pq_codes_attention_stacked
    from million_tpu.parallel.sharded_decode import (
        sharded_pq_codes_attention_stacked,
    )
    import jax.tree_util as jtu

    mesh = make_mesh(dp=1, tp=2, sp=2, dcn=2)
    L, bs, nh_k, d, M, C, N = 3, 1, 2, 32, 16, 64, 1024
    q = jnp.asarray(
        rng.standard_normal((bs, nh_k, GROUP_PAD, d)) / d**0.5, jnp.bfloat16
    )
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (L, bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (L, bs, nh_k, M, N)), jnp.uint8))
    kcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    kp, vp = pack_decode_table(kcent), pack_decode_table(vcent)
    kp_s = jtu.tree_map(lambda x: jnp.broadcast_to(x, (L, *x.shape)), kp)
    vp_s = jtu.tree_map(lambda x: jnp.broadcast_to(x, (L, *x.shape)), vp)
    li = jnp.asarray(1, jnp.int32)
    nc = jnp.asarray(700, jnp.int32)

    want_out, want_lse = pq_codes_attention_stacked(
        q, kc, vc, kp_s, vp_s, li, nc, block=128
    )
    got_out, got_lse = sharded_pq_codes_attention_stacked(
        mesh, q, kc, vc, kp_s, vp_s, li, nc, block=128
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_lse), np.asarray(want_lse), rtol=2e-3, atol=2e-3
    )


def test_distributed_initialize_single_process():
    """Single-process initialize is a no-op; global_mesh builds the same
    4-axis mesh as make_mesh over the virtual devices."""
    from million_tpu.parallel.distributed import global_mesh, initialize

    initialize()
    initialize()  # idempotent
    mesh = global_mesh(dp=1, tp=2, sp=2, dcn=2)
    assert mesh.shape == {"dcn": 2, "dp": 1, "tp": 2, "sp": 2}


def test_ring_causal_attention_matches_single_device(rng):
    """Ring prefill attention (ppermute K/V blocks + online softmax) must
    match the single-device causal reference, GQA included."""
    from million_tpu.ops.pq_attention_ref import causal_attention
    from million_tpu.parallel.ring_attention import ring_causal_attention

    mesh = make_mesh(dp=1, tp=2, sp=4)
    bs, nh, nh_k, n, d = 1, 4, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((bs, nh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bs, nh_k, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bs, nh_k, n, d)), jnp.float32)
    want = causal_attention(q, k, v)
    got = ring_causal_attention(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ring_causal_attention_multislice(rng):
    """Ring over a 2-slice mesh: the ring axis is sp only (within-slice);
    dcn replicates — the sequence ring stays on ICI."""
    from million_tpu.ops.pq_attention_ref import causal_attention
    from million_tpu.parallel.ring_attention import ring_causal_attention

    mesh = make_mesh(dp=1, tp=1, sp=4, dcn=2)
    bs, nh, n, d = 1, 2, 32, 8
    q = jnp.asarray(rng.standard_normal((bs, nh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bs, nh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bs, nh, n, d)), jnp.float32)
    want = causal_attention(q, k, v)
    got = ring_causal_attention(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_generate_on_mesh(rng):
    """Full generate() (prefill + decode loop) over a sharded mesh: the
    north-star multi-chip serving flow in one call."""
    import dataclasses

    from million_tpu.models.llama import PRESETS, init_params, build_tables
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.parallel.mesh import (
        make_mesh, param_shardings, pq_cache_shardings, shard_pytree,
    )
    from million_tpu.runtime.generate import generate
    from million_tpu.runtime.sampling import SamplingConfig

    mesh = make_mesh(dp=1, tp=2, sp=2, dcn=2)
    cfg = dataclasses.replace(
        PRESETS["test-tiny"], num_heads=4, num_kv_heads=2, head_dim=32,
        vocab_size=300, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 64, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 64, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=64, Lt=8,
        N_max=2048 * 4, dtype=jnp.float32,
    )
    cache = shard_pytree(
        init_state(pq_cfg, cfg.num_layers), pq_cache_shardings(mesh)
    )
    params = shard_pytree(params, param_shardings(mesh))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 24)), jnp.int32)
    res, _ = generate(
        params, cfg, ids, cache, tables, mode="pq_pallas",
        max_new_tokens=10, sampling=SamplingConfig(temperature=0.0), mesh=mesh,
    )
    assert res.tokens.shape == (1, 10)
    assert np.isfinite(res.tokens).all()

    # same tokens as the single-device run (greedy, same cents)
    res1, _ = generate(
        init_params(cfg, jax.random.PRNGKey(0)), cfg, ids,
        init_state(pq_cfg, cfg.num_layers), tables, mode="pq_pallas",
        max_new_tokens=10, sampling=SamplingConfig(temperature=0.0),
    )
    agree = (res.tokens == res1.tokens).mean()
    assert agree >= 0.9, (res.tokens, res1.tokens)


def test_sp_prefill_matches_flat_prefill(rng):
    """Sequence-parallel prefill (activations sharded, ring attention,
    per-shard arena writes) must produce the same last-token logits and the
    same arena contents as the flat single-device prefill."""
    import dataclasses

    from million_tpu.models.llama import PRESETS, init_params, prefill
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.parallel.mesh import pq_cache_shardings, shard_pytree
    from million_tpu.parallel.sp_prefill import prefill_sp

    mesh = make_mesh(dp=1, tp=1, sp=4)
    cfg = dataclasses.replace(PRESETS["test-tiny"], dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    n = 64  # divisible by 4 * sp
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, n)), jnp.int32)
    # N_max DELIBERATELY larger than the prompt: the sp layout must match
    # the flat arena for prompts that do NOT fill the arena (regression:
    # per-shard local-offset writes only coincided at n == N_max)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=32, Lt=8,
        N_max=4 * n, dtype=jnp.float32,
    )

    # flat single-device reference
    lf, cf = prefill(params, cfg, ids, init_state(pq_cfg, cfg.num_layers),
                     cents, mode="pq", last_logit_only=True)

    cache = init_state(pq_cfg, cfg.num_layers)
    sh = pq_cache_shardings(mesh)
    cache = shard_pytree(cache, sh)
    ls, cs = prefill_sp(params, cfg, ids, cache, cents, mesh)

    np.testing.assert_allclose(
        np.asarray(ls), np.asarray(lf[:, -1]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(cs["key_codes"]), np.asarray(cf["key_codes"])
    )
    np.testing.assert_array_equal(
        np.asarray(cs["value_codes"]), np.asarray(cf["value_codes"])
    )
    assert int(cs["n_codes"][0]) == n and int(cs["r"][0]) == 0

    # decode CONTINUES from the sp-prefilled cache identically to the
    # flat-prefilled one (the decode-ready claim, actually decoded)
    from million_tpu.models.llama import decode_step

    tok = jnp.asarray([3], jnp.int32)
    l1, _ = decode_step(params, cfg, tok, jnp.asarray(n, jnp.int32), cf, cents, mode="pq")
    l2, _ = decode_step(params, cfg, tok, jnp.asarray(n, jnp.int32), cs, cents, mode="pq")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)

    # fresh-cache contract enforced
    import pytest
    with pytest.raises(ValueError, match="FRESH"):
        prefill_sp(params, cfg, ids, cs, cents, mesh)


def test_sp_prefill_multislice(rng):
    """Sequence-parallel prefill over a 2-slice mesh: the ring linearizes
    over ("dcn", "sp"); cache and logits must match the flat prefill."""
    import dataclasses

    from million_tpu.models.llama import PRESETS, init_params, prefill
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.parallel.mesh import pq_cache_shardings, shard_pytree
    from million_tpu.parallel.sp_prefill import prefill_sp

    mesh = make_mesh(dp=1, tp=1, sp=4, dcn=2)
    cfg = dataclasses.replace(PRESETS["test-tiny"], dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    n = 64  # divisible by 4 * 8 shards
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, n)), jnp.int32)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=32, Lt=8,
        N_max=2 * n, dtype=jnp.float32,
    )
    lf, cf = prefill(params, cfg, ids, init_state(pq_cfg, cfg.num_layers),
                     cents, mode="pq", last_logit_only=True)
    cache = shard_pytree(init_state(pq_cfg, cfg.num_layers), pq_cache_shardings(mesh))
    ls, cs = prefill_sp(params, cfg, ids, cache, cents, mesh)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lf[:, -1]), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cs["key_codes"]), np.asarray(cf["key_codes"]))


def test_sp_prefill_padded_length(rng):
    """Prompt lengths divisible by 4 but NOT by 4*shards are padded
    internally: logits select the last REAL token, the arena's valid prefix
    matches the flat prefill, and n_codes reflects the real length."""
    import dataclasses

    from million_tpu.models.llama import PRESETS, decode_step, init_params, prefill
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.parallel.mesh import pq_cache_shardings, shard_pytree
    from million_tpu.parallel.sp_prefill import prefill_sp

    mesh = make_mesh(dp=1, tp=1, sp=4)
    cfg = dataclasses.replace(PRESETS["test-tiny"], dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    n = 44  # 44 % 4 == 0, 44 % 16 != 0 -> padded to 48 internally
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, n)), jnp.int32)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=32, Lt=8,
        N_max=128, dtype=jnp.float32,
    )
    lf, cf = prefill(params, cfg, ids, init_state(pq_cfg, cfg.num_layers),
                     cents, mode="pq", last_logit_only=True)
    cache = shard_pytree(init_state(pq_cfg, cfg.num_layers), pq_cache_shardings(mesh))
    ls, cs = prefill_sp(params, cfg, ids, cache, cents, mesh)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lf[:, -1]), rtol=2e-4, atol=2e-4)
    nw = n // 4
    np.testing.assert_array_equal(
        np.asarray(cs["key_codes"])[..., :nw], np.asarray(cf["key_codes"])[..., :nw]
    )
    assert int(cs["n_codes"][0]) == n and int(cs["r"][0]) == 0
    # decode continues identically (pad codes sit beyond n_codes -> masked)
    tok = jnp.asarray([3], jnp.int32)
    l1, _ = decode_step(params, cfg, tok, jnp.asarray(n, jnp.int32), cf, cents, mode="pq")
    l2, _ = decode_step(params, cfg, tok, jnp.asarray(n, jnp.int32), cs, cents, mode="pq")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)


def test_sp_prefill_opq(rng):
    """OPQ through the sequence-parallel prefill: per-shard rotation before
    encode keeps the arena identical to the flat OPQ prefill; ring attention
    stays exact in the original space so logits match too."""
    import dataclasses

    from million_tpu.models.llama import PRESETS, init_params, prefill
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.parallel.mesh import pq_cache_shardings, shard_pytree
    from million_tpu.parallel.sp_prefill import prefill_sp

    mesh = make_mesh(dp=1, tp=1, sp=4)
    cfg = dataclasses.replace(PRESETS["test-tiny"], dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    M, d = cfg.head_dim // 2, cfg.head_dim

    def rand_rot(seed):
        g = np.random.default_rng(seed).standard_normal((cfg.num_layers, d, d))
        return jnp.asarray(np.linalg.qr(g)[0], jnp.float32)

    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "Rk": rand_rot(31),
        "Rv": rand_rot(32),
    }
    n = 64
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, n)), jnp.int32)
    pq_cfg = PQCacheConfig(
        bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=32, Lt=8,
        N_max=128, dtype=jnp.float32,
    )
    lf, cf = prefill(params, cfg, ids, init_state(pq_cfg, cfg.num_layers),
                     cents, mode="pq", last_logit_only=True)
    cache = shard_pytree(init_state(pq_cfg, cfg.num_layers), pq_cache_shardings(mesh))
    ls, cs = prefill_sp(params, cfg, ids, cache, cents, mesh)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lf[:, -1]), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cs["key_codes"]), np.asarray(cf["key_codes"]))
    np.testing.assert_array_equal(np.asarray(cs["value_codes"]), np.asarray(cf["value_codes"]))


def test_sharded_decode_outlier_channels(rng):
    """Outlier byte-plane arenas on the SHARDED flat decode path (round 5,
    VERDICT r4 item 5): arenas sequence-shard with the codes, corrections
    fold per shard, and the mesh decode matches single-device logits."""
    import dataclasses

    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.models.llama import (
        PRESETS, build_tables, decode_step, init_params, prefill,
    )
    from million_tpu.parallel.mesh import shard_pytree

    CFG = dataclasses.replace(PRESETS["test-tiny"], num_layers=2)
    OK = OV = 4
    M = CFG.head_dim // 2
    d = CFG.head_dim
    params = init_params(CFG, jax.random.PRNGKey(0))
    koidx = np.sort(rng.choice(d, OK, replace=False)).astype(np.int32)
    voidx = np.sort(rng.choice(d, OV, replace=False)).astype(np.int32)
    ck = rng.standard_normal((2, M, 64, 2)).astype(np.float32)
    cv = rng.standard_normal((2, M, 64, 2)).astype(np.float32)
    for c in koidx:
        ck[:, c % M, :, c // M] = 0.0
    for c in voidx:
        cv[:, c % M, :, c // M] = 0.0
    cents = {
        "key": jnp.asarray(ck), "value": jnp.asarray(cv),
        "k_outlier_idx": jnp.asarray(np.stack([koidx] * 2)),
        "v_outlier_idx": jnp.asarray(np.stack([voidx] * 2)),
    }
    tables = build_tables(cents)
    pqc = PQCacheConfig(bs=1, nh_k=CFG.num_kv_heads, d=d, M=M, C=64,
                        Lt=16, N_max=512, dtype=jnp.float32, OK=OK, OV=OV)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 60)), jnp.int32)
    _, cache = prefill(params, CFG, ids, init_state(pqc, 2), tables,
                       mode="pq", last_logit_only=True)
    assert "key_outliers" in cache
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.asarray(60, jnp.int32)
    ref, _ = decode_step(params, CFG, tok, pos, cache, tables,
                         mode="pq_pallas")
    for sp in (2, 4):
        mesh = make_mesh(dp=1, tp=1, sp=sp)
        c2 = shard_pytree(cache, pq_cache_shardings(mesh))
        got, _ = decode_step(params, CFG, tok, pos, c2, tables,
                             mode="pq_pallas", mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
