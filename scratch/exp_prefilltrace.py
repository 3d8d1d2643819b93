"""Trace one 32K PQ prefill and dump top device ops."""
import sys, shutil
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from million_tpu.models import llama as L
from million_tpu.cache.pq_cache import PQCacheConfig, init_state

N = 32256
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
pq_cfg = PQCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C, Lt=128, N_max=32768)

def run(ids):
    logits, cache = L.prefill(params, cfg, ids, init_state(pq_cfg, Lc), cents, mode="pq", last_logit_only=True)
    del cache
    return np.asarray(logits[0, -1, :4])

run(ids)  # compile+warm
shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    run(ids)
print("traced")
