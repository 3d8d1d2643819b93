"""bs=1 TPOT with the outlier-rescued COARSE geometry (round 3):
K d_m=4 + V d_m=4, C=128 direct tables, OK=OV=16 exact outlier channels.

Halves the kernel's gather volume on BOTH sides vs the production d_m=2
shape — the lever for the reference's own bs=1 protocol (BASELINE rows
13-14), where round 2 measured PQ 0.80x dense. Timing is data-independent,
so codebooks/codes/arenas are synthetic (the quality gate for this
geometry is the ladder's full-coarse outlier rung).

Run: python scratch/exp_tpot_outlier.py [iters]
"""
import sys

sys.path.insert(0, "/root/repo")
import functools

import jax
import jax.numpy as jnp
import numpy as np

import bench
from bench import CTX

cfg, params, _ = bench.build_model()
iters = int(sys.argv[1]) if len(sys.argv) > 1 else 16
bs = 1


def measure_pq_outlier(cfg, params, bs, iters, OKV=16):
    from million_tpu.models.llama import build_tables, decode_step
    from million_tpu.cache.pq_cache import PQCacheConfig
    from million_tpu.utils.timing import chained_bench

    d = cfg.head_dim
    M, C = d // 4, 128
    rng = np.random.default_rng(0)
    L = cfg.num_layers
    H = cfg.num_kv_heads
    oidx = np.stack([
        np.sort(rng.choice(d, OKV, replace=False)) for _ in range(L)
    ]).astype(np.int32)
    cents = {
        "key": jnp.asarray(rng.standard_normal((L, M, C, 4)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((L, M, C, 4)), jnp.float32),
        "k_outlier_idx": jnp.asarray(oidx),
        "v_outlier_idx": jnp.asarray(oidx),
    }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(
        bs=bs, nh_k=H, d=d, M=M, C=C, Lt=128, N_max=CTX, OK=OKV, OV=OKV,
    )

    code_shape = (L, bs, H, M, CTX // 4)

    @jax.jit
    def make_codes(seed):
        tile = jax.random.bits(
            jax.random.PRNGKey(seed), (*code_shape[:-1], 1024), jnp.uint32
        ).astype(jnp.int32)
        # C=128 direct: byte values must stay < 128
        tile = tile & 0x7F7F7F7F
        return jnp.tile(tile, (1,) * (len(code_shape) - 1) + (CTX // 4096,))

    @jax.jit
    def make_outliers(seed):
        tile = jax.random.normal(
            jax.random.PRNGKey(seed), (L, bs, H, 4, OKV, 1024), jnp.bfloat16
        )
        return jnp.tile(tile, (1, 1, 1, 1, 1, CTX // 4096))

    def make_state():
        cache = {
            "key_codes": make_codes(1),
            "value_codes": make_codes(2),
            "key_outliers": make_outliers(3),
            "value_outliers": make_outliers(4),
            "key_residual": jnp.zeros((L, bs, H, pq_cfg.Lt, d), jnp.bfloat16),
            "value_residual": jnp.zeros((L, bs, H, pq_cfg.Lt, d), jnp.bfloat16),
            "n_codes": jnp.full((L,), CTX - 512, jnp.int32),
            "r": jnp.zeros((L,), jnp.int32),
        }
        return (jnp.zeros((bs,), jnp.int32), cache)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tables, state):
        tok, cache = state
        logits, cache = decode_step(
            params, cfg, tok, jnp.asarray(CTX - 500, jnp.int32), cache, tables,
            mode="pq_pallas",
        )
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

    return chained_bench(lambda st: step(params, tables, st), make_state, iters=iters)


dt_d = bench.measure_dense(cfg, params, bs, iters)
print(f"dense    bs=1 tpot: {dt_d*1e3:.2f} ms", flush=True)
dt_p = bench.measure_pq(cfg, params, bs, iters)
print(f"pq d_m=2 bs=1 tpot: {dt_p*1e3:.2f} ms   ratio {dt_d/dt_p:.2f}x", flush=True)
dt_o = measure_pq_outlier(cfg, params, bs, iters)
print(f"pq coarse+outlier bs=1 tpot: {dt_o*1e3:.2f} ms   "
      f"ratio vs dense {dt_d/dt_o:.2f}x, vs d_m=2 {dt_p/dt_o:.2f}x", flush=True)
