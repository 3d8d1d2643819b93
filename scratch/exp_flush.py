"""Measure the decode-step flush spike: fused Pallas encode vs jnp chunked
encode at the bench shape (3B-class, bs=7, 32K arena). Usage:
    python scratch/exp_flush.py fused|jnp
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.pq import ops as pq_ops

mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
pq_ops.RUNTIME_FUSED_ENCODE = mode == "fused"

from million_tpu.models import llama
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.utils.timing import chained_bench

cfg = llama.PRESETS["llama-3.2-3b"]
bs, L = 7, cfg.num_layers
ccfg = PQCacheConfig(bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=64,
                     N_max=32768, Lt=128)
rng = np.random.default_rng(0)
kc = jnp.asarray(rng.standard_normal((L, 64, 256, 2)), jnp.float32)
vc = jnp.asarray(rng.standard_normal((L, 64, 256, 2)), jnp.float32)
cents = {"key": kc, "value": vc}
tables = llama.build_tables(cents)

def make():
    cache = init_state(ccfg, L)
    cache["key_residual"] = jax.random.normal(
        jax.random.PRNGKey(1), cache["key_residual"].shape, jnp.bfloat16)
    cache["value_residual"] = jax.random.normal(
        jax.random.PRNGKey(2), cache["value_residual"].shape, jnp.bfloat16)
    cache["n_codes"] = jnp.full_like(cache["n_codes"], 16384)
    cache["r"] = jnp.full_like(cache["r"], 128)
    return jax.block_until_ready(cache)


import functools


@functools.partial(jax.jit, donate_argnums=(0,))
def flush(cache):
    new = llama._flush_windows_stacked(dict(cache), tables)
    # keep r/n_codes cycling so the chain doesn't saturate the arena
    new["n_codes"] = jnp.full_like(new["n_codes"], 16384)
    new["r"] = jnp.full_like(new["r"], 128)
    return new


t = chained_bench(flush, make, iters=12)
print(f"mode={mode} flush-all-layers: {t*1e3:.2f} ms")
