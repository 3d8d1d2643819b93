"""Isolate flush_windows cost: whole, encode-core only, writer only."""
import jax, jax.numpy as jnp, numpy as np, functools, sys
from million_tpu.models.llama import (
    PRESETS, build_tables, init_params, flush_windows,
    _flush_encode_core_flat, _flush_write_flat)
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.utils.timing import chained_bench

CTX, bs, F = 32768, 7, int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = PRESETS["llama-3.2-3b"]
params = None
M, L = cfg.head_dim // 2, cfg.num_layers
rng = np.random.default_rng(0)
cents = {
    "key": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
    "value": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
}
pq_cfg = PQCacheConfig(bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M,
                       C=256, Lt=128, N_max=CTX)

def fresh():
    c = init_state(pq_cfg, L); c = dict(c)
    c["n_codes"] = jnp.full((L,), 1024, jnp.int32)
    c["r"] = jnp.full((L,), 128, jnp.int32)
    return c

t_all = chained_bench(lambda c: flush_windows(c, cents, n=F), fresh, iters=16)
print(f"flush_windows total (F={F}): {t_all*1e3:.2f} ms")

def core_only(c):
    slabs, kres, vres, nn, nr = _flush_encode_core_flat(
        c["key_residual"], c["value_residual"],
        {"key": cents["key"], "value": cents["value"]},
        c["n_codes"], c["r"], F, False, None)
    c = dict(c)
    c["key_residual"], c["value_residual"] = kres, vres
    c["n_codes"], c["r"] = nn, nr
    return c
t_core = chained_bench(core_only, fresh, iters=16)
print(f"encode core only: {t_core*1e3:.2f} ms")

def writer_only(c):
    nw = F // 4
    slabs = {
        "key_codes": jnp.zeros((L, bs, pq_cfg.nh_k, M, nw), jnp.int32),
        "value_codes": jnp.zeros((L, bs, pq_cfg.nh_k, M, nw), jnp.int32),
    }
    c = dict(c)
    arenas = {k: c.pop(k) for k in ("key_codes", "value_codes")}
    arenas = _flush_write_flat(arenas, slabs, c["n_codes"][0] // 4,
                               c["n_codes"][0] // 4)
    c.update(arenas)
    c["n_codes"] = c["n_codes"] + F
    return c
t_w = chained_bench(writer_only, fresh, iters=16)
print(f"writer only: {t_w*1e3:.2f} ms")
