"""Capture an xplane trace of the bench decode step and print the top device
ops by total time. Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python."""
import functools
import glob
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from million_tpu.models import llama as L
from million_tpu.cache.pq_cache import PQCacheConfig

CTX = int(os.environ.get("CTX", 32768))
BS = int(os.environ.get("BS", 7))

cfg = L.PRESETS["llama-3.2-3b"]
params = L.init_params(cfg, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
M, C = cfg.head_dim // 2, 256
Lc = cfg.num_layers
cents = {
    "key": jnp.asarray(rng.standard_normal((Lc, M, C, 2)), jnp.float32),
    "value": jnp.asarray(rng.standard_normal((Lc, M, C, 2)), jnp.float32),
}
tables = L.build_tables(cents)
code_shape = (Lc, BS, cfg.num_kv_heads, M, CTX // 4)


@jax.jit
def make_codes(seed):
    tile = jax.random.bits(jax.random.PRNGKey(seed), (*code_shape[:-1], 1024), jnp.uint32).astype(jnp.int32)
    return jnp.tile(tile, (1,) * (len(code_shape) - 1) + (CTX // 4096,))


cache = {
    "key_codes": make_codes(1),
    "value_codes": make_codes(2),
    "key_residual": jnp.zeros((Lc, BS, cfg.num_kv_heads, 128, cfg.head_dim), jnp.bfloat16),
    "value_residual": jnp.zeros((Lc, BS, cfg.num_kv_heads, 128, cfg.head_dim), jnp.bfloat16),
    "n_codes": jnp.full((Lc,), CTX - 512, jnp.int32),
    "r": jnp.zeros((Lc,), jnp.int32),
}
state = (jnp.zeros((BS,), jnp.int32), cache)


@functools.partial(jax.jit, donate_argnums=(2,))
def step(params, tables, state):
    tok, cache = state
    logits, cache = L.decode_step(
        params, cfg, tok, jnp.asarray(CTX - 500, jnp.int32), cache, tables,
        mode="pq_pallas",
    )
    return (jnp.argmax(logits, -1).astype(jnp.int32), cache)


# warm
for _ in range(3):
    state = step(params, tables, state)
state[0].block_until_ready()

shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(5):
        state = step(params, tables, state)
    state[0].block_until_ready()

# ---- parse: see parse_trace.py ----------------------------------------
print("trace captured; run parse_trace.py")
