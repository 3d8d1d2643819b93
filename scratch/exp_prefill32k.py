"""32K-token PQ prefill at 3B on one chip: OOM check + TTFT measurement."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from million_tpu.models import llama as L
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state

N = 32256  # 4-aligned prompt
cfg = L.PRESETS["llama-3.2-3b"]
params = L.init_params(cfg, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
M, C = cfg.head_dim // 2, 256
Lc = cfg.num_layers
cents = {
    "key": jnp.asarray(rng.standard_normal((Lc, M, C, 2)), jnp.float32),
    "value": jnp.asarray(rng.standard_normal((Lc, M, C, 2)), jnp.float32),
}
ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, N)), jnp.int32)

which = sys.argv[1] if len(sys.argv) > 1 else "pq"
if which == "pq":
    pq_cfg = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C,
                           Lt=128, N_max=32768)
    cache = init_state(pq_cfg, Lc)
    t0 = time.perf_counter()
    logits, cache = L.prefill(params, cfg, ids, cache, cents, mode="pq", last_logit_only=True)
    logits.block_until_ready()
    t1 = time.perf_counter()
    del cache
    steady = []
    for s in range(3):
        ids2 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, N)), jnp.int32)
        logits = cache2 = None
        ta = time.perf_counter()
        logits, cache2 = L.prefill(params, cfg, ids2, init_state(pq_cfg, Lc), cents, mode="pq", last_logit_only=True)
        np.asarray(logits[0, -1, :4])  # force through the async tunnel
        steady.append(time.perf_counter() - ta)
    print(f"pq prefill 32K: compile+run {t1-t0:.1f}s, steady {min(steady):.2f}s")
else:
    dcfg = DenseCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim,
                            N_max=32768 + 128, dtype=jnp.bfloat16)
    cache = init_dense_state(dcfg, Lc)
    t0 = time.perf_counter()
    logits, cache = L.prefill(params, cfg, ids, cache, None, mode="dense", last_logit_only=True)
    logits.block_until_ready()
    t1 = time.perf_counter()
    del cache
    steady = []
    for s in range(3):
        ids2 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, N)), jnp.int32)
        logits = None
        ta = time.perf_counter()
        logits, _ = L.prefill(params, cfg, ids2, init_dense_state(dcfg, Lc), None, mode="dense", last_logit_only=True)
        np.asarray(logits[0, -1, :4])  # force through the async tunnel
        steady.append(time.perf_counter() - ta)
    print(f"dense prefill 32K: compile+run {t1-t0:.1f}s, steady {min(steady):.2f}s")
