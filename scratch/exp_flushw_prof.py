import jax, jax.numpy as jnp, numpy as np, sys
from million_tpu.models.llama import PRESETS, init_params, flush_windows
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.utils.profiling import trace_op_breakdown

CTX, bs, F = 32768, 7, 16
cfg = PRESETS["llama-3.2-3b"]
M, L = cfg.head_dim // 2, cfg.num_layers
rng = np.random.default_rng(0)
cents = {
    "key": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
    "value": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
}
pq_cfg = PQCacheConfig(bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M,
                       C=256, Lt=128, N_max=CTX)
c = init_state(pq_cfg, L); c = dict(c)
c["n_codes"] = jnp.full((L,), 1024, jnp.int32)
c["r"] = jnp.full((L,), 128, jnp.int32)
c = flush_windows(c, cents, n=F)
jax.block_until_ready(c["n_codes"])
def run():
    s = c
    for _ in range(4):
        s = flush_windows(s, cents, n=F)
    return s
br = trace_op_breakdown(run)
for k, v in sorted(br.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 0))[:12]:
    print(f"{(v/4 if isinstance(v, float) else v)}  {k}")
