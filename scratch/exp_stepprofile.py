"""Attribute PQ decode-step time at bench shape: full step vs kernel-stubbed
step vs isolated kernel loop."""
import functools
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from million_tpu.models import llama as L
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.utils.timing import chained_bench

import os
CTX = int(os.environ.get("CTX", 32768))
BS = 7


def build():
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
    pq_cfg = PQCacheConfig(bs=BS, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C,
                           Lt=128, N_max=CTX)
    code_shape = (Lc, BS, cfg.num_kv_heads, M, CTX // 4)

    @jax.jit
    def make_codes(seed):
        tile = jax.random.bits(jax.random.PRNGKey(seed), (*code_shape[:-1], 1024), jnp.uint32).astype(jnp.int32)
        return jnp.tile(tile, (1,) * (len(code_shape) - 1) + (CTX // 4096,))

    def make_state():
        cache = {
            "key_codes": make_codes(1),
            "value_codes": make_codes(2),
            "key_word_buf": jnp.zeros((Lc, BS, cfg.num_kv_heads, M, 1), jnp.int32),
            "value_word_buf": jnp.zeros((Lc, BS, cfg.num_kv_heads, M, 1), jnp.int32),
            "key_residual": jnp.zeros((Lc, BS, cfg.num_kv_heads, 128, cfg.head_dim), jnp.bfloat16),
            "value_residual": jnp.zeros((Lc, BS, cfg.num_kv_heads, 128, cfg.head_dim), jnp.bfloat16),
            "n_codes": jnp.full((Lc,), CTX - 512, jnp.int32),
            "r": jnp.zeros((Lc,), jnp.int32),
        }
        return (jnp.zeros((BS,), jnp.int32), cache)

    return cfg, params, cents, tables, make_state


def main():
    cfg, params, cents, tables, make_state = build()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "stub"):
        # stub the kernel attention: zeros of the right shape
        real = L._pq_pallas_attention_stacked

        def stub(q, cache, cents_, layer_idx, c, mesh=None, n_codes=None, r=None):
            bs, nh, d = q.shape
            return jnp.zeros((bs, nh, d), q.dtype)

        L._pq_pallas_attention_stacked = stub

        @functools.partial(jax.jit, donate_argnums=(2,))
        def step_stub(params, tables, state):
            tok, cache = state
            logits, cache = L.decode_step(params.copy(), cfg, tok,
                                          jnp.asarray(CTX - 500, jnp.int32), cache, tables,
                                          mode="pq_pallas")
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

        dt = chained_bench(lambda st: step_stub(params, tables, st), make_state, iters=12)
        print(f"stubbed-kernel step: {dt*1e3:8.2f} ms", flush=True)
        L._pq_pallas_attention_stacked = real

    if which in ("all", "full"):
        @functools.partial(jax.jit, donate_argnums=(2,))
        def step_full(params, tables, state):
            tok, cache = state
            logits, cache = L.decode_step(params, cfg, tok,
                                          jnp.asarray(CTX - 500, jnp.int32), cache, tables,
                                          mode="pq_pallas")
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

        dt = chained_bench(lambda st: step_full(params, tables, st), make_state, iters=12)
        print(f"full step:           {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
