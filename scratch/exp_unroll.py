"""Measure decode TPOT with the layer scan unrolled (static layer indices
let XLA fuse weight slices into their matmuls instead of materializing
per-layer copies — the trace shows ~1.4 ms/step of slice copies).
Usage: UNROLL=28 python scratch/exp_unroll.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

UNROLL = int(os.environ.get("UNROLL", "28"))

# monkeypatch lax.scan inside llama.decode_step with an unrolled variant
import jax.lax as lax

_orig_scan = lax.scan


def scan_unrolled(f, init, xs, *a, **kw):
    kw.setdefault("unroll", UNROLL)
    return _orig_scan(f, init, xs, *a, **kw)


from million_tpu.models import llama as L

CTX, BS = 32768, 7
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

import bench

L.jax.lax = lax  # no-op; scan patched below
jax.lax.scan = scan_unrolled
try:
    dt = bench.measure_pq(cfg, params, BS, 16)
finally:
    jax.lax.scan = _orig_scan
print(f"UNROLL={UNROLL}: pq bs={BS} tpot={dt*1e3:.2f} ms -> {BS/dt:.1f} tok/s")
