"""Op breakdown of the flush-variant decode step at the bench shape."""
import jax, jax.numpy as jnp, numpy as np, functools
from million_tpu.models.llama import PRESETS, build_tables, decode_step, init_params
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.utils.profiling import trace_op_breakdown

CTX, bs = 32768, 7
cfg = PRESETS["llama-3.2-3b"]
params = init_params(cfg, jax.random.PRNGKey(0))
M, L = cfg.head_dim // 2, cfg.num_layers
rng = np.random.default_rng(0)
cents = {
    "key": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
    "value": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
}
tables = build_tables(cents)
pq_cfg = PQCacheConfig(bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M,
                       C=256, Lt=128, N_max=CTX)
cache = init_state(pq_cfg, L)
cache = dict(cache)
cache["n_codes"] = jnp.full((L,), CTX - 512, jnp.int32)
cache["r"] = jnp.full((L,), 128, jnp.int32)
tok = jnp.zeros((bs,), jnp.int32)

@functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("flush",))
def step(params, tables, state, flush=False):
    t, c = state
    logits, c = decode_step(params, cfg, t, jnp.asarray(CTX - 500, jnp.int32),
                            c, tables, mode="pq_pallas", flush=flush,
                            flush_n=32)
    return (jnp.argmax(logits, -1).astype(jnp.int32), c)

del cache
def fresh():
    c = init_state(pq_cfg, L); c = dict(c)
    c["n_codes"] = jnp.full((L,), CTX - 512, jnp.int32)
    c["r"] = jnp.full((L,), 128, jnp.int32)
    return (jnp.zeros((bs,), jnp.int32), c)
s1 = step(params, tables, fresh(), flush=True)
jax.block_until_ready(s1[0])
del s1
br = trace_op_breakdown(lambda: step(params, tables, fresh(), flush=True))
for k, v in sorted(br.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 0))[:14]:
    print(f"{v}  {k}")
