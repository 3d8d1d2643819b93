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

cache = init_state(ccfg, L)
# fill residual windows + a plausible n_codes
cache["key_residual"] = jnp.asarray(
    rng.standard_normal(cache["key_residual"].shape), jnp.bfloat16)
cache["value_residual"] = jnp.asarray(
    rng.standard_normal(cache["value_residual"].shape), jnp.bfloat16)
cache["n_codes"] = jnp.full_like(cache["n_codes"], 16384)
cache["r"] = jnp.full_like(cache["r"], 128)


@jax.jit
def flush(cache):
    return llama._flush_windows_stacked(dict(cache), tables)


out = flush(cache)
jax.block_until_ready(out)
t = chained_bench(lambda c: flush(c), lambda: cache, iters=20)
print(f"mode={mode} flush-all-layers: {t*1e3:.2f} ms")
