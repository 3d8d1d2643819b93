import jax, jax.numpy as jnp, numpy as np, sys
from million_tpu.ops.pq_attention_pallas import (
    pack_codes, pack_decode_table, pq_chunk_history_attention)
from million_tpu.utils.profiling import trace_op_breakdown

bs, nh, nh_k, d, M, C = 1, 24, 8, 128, 64, 256
nc, NH = 2048, 32768
scale = 1.0 / d**0.5
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((bs, nh, nc, d)), jnp.float32)
kw = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, NH)), jnp.uint8))
vw = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, NH)), jnp.uint8))
kpack = pack_decode_table(jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32))
vpack = pack_decode_table(jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32))
n_prev = jnp.asarray(NH, jnp.int32)
blk, qb = int(sys.argv[1]), int(sys.argv[2])
kfn = jax.jit(lambda q: pq_chunk_history_attention(
    q, kw, vw, kpack, vpack, n_prev, scale, block=blk, q_block=qb))
jax.block_until_ready(kfn(q))
br = trace_op_breakdown(lambda: [kfn(q) for _ in range(5)], top=14)
for k, v in sorted(br.items(), key=lambda kv: -kv[1])[:14]:
    print(f"{v/5:9.3f} ms  {k}")
