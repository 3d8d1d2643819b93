"""Op breakdown of one serving decode tick at the 3B/32K/6-slot shape."""
import jax, jax.numpy as jnp, numpy as np
from million_tpu.cache.paged_pq_cache import PagedPQCacheConfig, init_paged_state
from million_tpu.models.llama import PRESETS, build_tables, init_params
from million_tpu.models.paged_decode import paged_decode_step
from million_tpu.utils.profiling import trace_op_breakdown

cfg = PRESETS["llama-3.2-3b"]
rng = np.random.default_rng(0)
params = init_params(cfg, jax.random.PRNGKey(0))
M = cfg.head_dim // 2
L = cfg.num_layers
cents = {
    "key": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
    "value": jnp.asarray(rng.standard_normal((L, M, 256, 2)), jnp.float32),
}
tables = build_tables(cents)
pcfg = PagedPQCacheConfig(
    max_seqs=6, n_pages=104, pages_per_seq=17, page_size=2048,
    num_layers=L, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=256, Lt=128,
)
state = init_paged_state(pcfg)
S, P_seq = 6, 16
pt = np.full((S, pcfg.pages_per_seq), -1, np.int32)
pt[:, :P_seq] = np.arange(S * P_seq).reshape(S, P_seq)
state["page_table"] = jnp.asarray(pt)
state["seq_n_codes"] = jnp.full((S,), 32256, jnp.int32)
state["seq_n_pages"] = jnp.full((S,), P_seq, jnp.int32)
state["seq_active"] = jnp.ones((S,), jnp.int32)
state["seq_r"] = jnp.full((S,), 3, jnp.int32)
state["used"] = state["used"].at[: S * P_seq].set(1)

tok = jnp.zeros((S,), jnp.int32)
pos = jnp.full((S,), 32259, jnp.int32)

def tick(st):
    logits, st2 = paged_decode_step(params, cfg, pcfg, tok, pos, st, tables,
                                    p_bucket=16)
    return st2

state = tick(state)
jax.block_until_ready(state["seq_r"])
br = trace_op_breakdown(lambda: [
    st := state, [st := tick(st) for _ in range(3)], st][-1])
for k, v in sorted(br.items(), key=lambda kv: -kv[1])[:14]:
    print(f"{v/3:9.3f} ms  {k}")
