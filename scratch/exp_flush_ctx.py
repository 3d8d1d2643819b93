"""Flush device cost vs arena ORIGIN: zeros-born (production) vs
tile-born (bench make_codes) vs after-a-decode-step."""
import jax, jax.numpy as jnp, numpy as np, functools
from million_tpu.models.llama import PRESETS, build_tables, init_params, flush_windows, decode_step
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.utils.profiling import trace_op_breakdown

CTX, bs, F = 32768, 7, 16
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

code_shape = (L, bs, cfg.num_kv_heads, M, CTX // 4)

@jax.jit
def make_codes(seed):
    tile = jax.random.bits(jax.random.PRNGKey(seed), (*code_shape[:-1], 1024),
                           jnp.uint32).astype(jnp.int32)
    return jnp.tile(tile, (1,) * 4 + (CTX // 4096,))

def mk(tile_born):
    c = init_state(pq_cfg, L); c = dict(c)
    if tile_born:
        c["key_codes"] = make_codes(1)
        c["value_codes"] = make_codes(2)
    c["n_codes"] = jnp.full((L,), CTX - 512, jnp.int32)
    c["r"] = jnp.full((L,), 128, jnp.int32)
    return c

@functools.partial(jax.jit, donate_argnums=(2,))
def step(params, tables, state):
    tok, cache = state
    logits, cache = decode_step(params, cfg, tok, jnp.asarray(CTX - 500, jnp.int32),
                                cache, tables, mode="pq_pallas")
    return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

for name, tile_born, with_step in (("zeros-born", False, False),
                                   ("tile-born", True, False),
                                   ("tile-born+step", True, True)):
    c = mk(tile_born)
    if with_step:
        tok, c = step(params, tables, (jnp.zeros((bs,), jnp.int32), c))
    c = flush_windows(c, tables, n=F)
    jax.block_until_ready(c["n_codes"])
    def run(c0=c, ws=with_step):
        s = c0
        for _ in range(3):
            if ws:
                _, s = step(params, tables, (jnp.zeros((bs,), jnp.int32), s))
            s = flush_windows(s, tables, n=F)
        return s
    br = trace_op_breakdown(run)
    tot = sum(v for v in br.values() if isinstance(v, float))
    top = sorted(((v, k) for k, v in br.items() if isinstance(v, float)),
                 reverse=True)[:3]
    print(f"{name}: total {tot/3:.2f} ms/iter  top: "
          + ", ".join(f"{k}={v/3:.2f}" for v, k in top))
    del c
