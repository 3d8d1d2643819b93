"""Isolate the paged-vs-flat decode kernel gap at the serving bench shape:
bs=6 slots, nh_k=8, d=128, M=64, 32K context; paged page_size=2048 (16
pages/seq) vs flat 16384-token blocks."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    pack_codes,
    pack_decode_table,
    pq_codes_attention,
    pq_paged_attention_stacked,
)
from million_tpu.utils.timing import chained_bench

bs, nh_k, d, M, C = 6, 8, 128, 64, 256
N = 32768
L = 28
page_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ps_w = page_size // 4
P_seq = N // page_size
n_pages = bs * P_seq
rng = np.random.default_rng(0)

q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, d)) * 0.1, jnp.bfloat16)
kcent = jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32)
vcent = jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32)
kpack = jax.vmap(pack_decode_table)(kcent)
vpack = jax.vmap(pack_decode_table)(vcent)

# paged pools, one layer of interest (li=0), stacked layout (tiled RNG:
# kernel cost is data-independent; GB-scale host RNG takes minutes)
tile = jnp.asarray(
    rng.integers(-(2**31), 2**31, (nh_k, M, ps_w), dtype=np.int64), jnp.int32)
make_pool = jax.jit(lambda t: jnp.broadcast_to(
    t, (L, n_pages + 1, nh_k, M, ps_w)) + jnp.arange(
    L, dtype=jnp.int32)[:, None, None, None, None])
key_pool = make_pool(tile)
value_pool = make_pool(tile ^ 12345)
page_table = jnp.asarray(
    np.arange(n_pages).reshape(bs, P_seq), jnp.int32)
n_codes = jnp.full((bs,), N, jnp.int32)
li = jnp.asarray(0, jnp.int32)

pfn = jax.jit(lambda q: pq_paged_attention_stacked(
    q, key_pool, value_pool, kpack, vpack, li, page_table, n_codes,
    p_bucket=P_seq))
jax.block_until_ready(pfn(q))
t = chained_bench(lambda x: pfn(q + 0 * x.ravel()[0].astype(jnp.bfloat16))[0],
                  jnp.zeros((4,)), iters=50)
print(f"paged stacked kernel (ps={page_size}, {P_seq} pages/seq): {t*1e3:.3f} ms/call")

# flat arena comparison (single layer worth of codes)
tile2 = jnp.asarray(
    rng.integers(-(2**31), 2**31, (nh_k, M, N // 4), dtype=np.int64), jnp.int32)
kw = jnp.broadcast_to(tile2, (bs, nh_k, M, N // 4))
vw = jnp.broadcast_to(tile2 ^ 54321, (bs, nh_k, M, N // 4))
from million_tpu.ops.pq_attention_pallas import DecodeTable
kp0 = DecodeTable(kpack.tab[0], kpack.q_scale[0], kpack.out_scale[0])
vp0 = DecodeTable(vpack.tab[0], vpack.q_scale[0], vpack.out_scale[0])
ffn = jax.jit(lambda q: pq_codes_attention(
    q, kw, vw, kp0, vp0, jnp.asarray(N, jnp.int32)))
jax.block_until_ready(ffn(q))
tf = chained_bench(lambda x: ffn(q + 0 * x.ravel()[0].astype(jnp.bfloat16))[0],
                   jnp.zeros((4,)), iters=50)
print(f"flat kernel (block 16384): {tf*1e3:.3f} ms/call   paged/flat = {t/tf:.2f}x")
