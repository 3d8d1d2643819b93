"""A/B: chunk-history attention — new Pallas kernel vs jnp _history_partial.

Production admission shape: llama-3.2-3b-class (nh=24, nh_k=8, d=128,
M=64, C=256), chunk nc=2048, history 32K. One layer per call.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.models.chunked_prefill import _history_partial
from million_tpu.ops.pq_attention_pallas import (
    pack_codes,
    pack_decode_table,
    pq_chunk_history_attention,
)
from million_tpu.utils.timing import chained_bench

bs, nh, nh_k, d, M, C = 1, 24, 8, 128, 64, 256
nc = 2048
NH = 32768  # history tokens
scale = 1.0 / d**0.5
rng = np.random.default_rng(0)

q = jnp.asarray(rng.standard_normal((bs, nh, nc, d)), jnp.float32)
kc = jnp.asarray(rng.integers(0, C, (bs, nh_k, M, NH)), jnp.uint8)
vc = jnp.asarray(rng.integers(0, C, (bs, nh_k, M, NH)), jnp.uint8)
kcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
vcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
kw, vw = pack_codes(kc), pack_codes(vc)
kpack, vpack = pack_decode_table(kcent), pack_decode_table(vcent)
n_prev = jnp.asarray(NH, jnp.int32)

blk = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
qb = int(sys.argv[2]) if len(sys.argv) > 2 else 256

kfn = jax.jit(lambda q, kw, vw, n: pq_chunk_history_attention(
    q, kw, vw, kpack, vpack, n, scale, block=blk, q_block=qb))
out, lse = kfn(q, kw, vw, n_prev)
jax.block_until_ready((out, lse))
t = chained_bench(lambda x: kfn(q + 0 * x.ravel()[0], kw, vw, n_prev)[0],
                  jnp.zeros((4,)), iters=20)
print(f"kernel block={blk} q_block={qb}: {t*1e3:.2f} ms/layer-call")

# jnp path (the one being replaced) — time a few iters only (it is slow)
jfn = jax.jit(lambda q, kw, vw, n: _history_partial(
    q, kw, vw, kcent, vcent, n, scale, nb=8, hist_block=4096))
o2, l2 = jfn(q, kw, vw, n_prev)
jax.block_until_ready((o2, l2))
t0 = time.perf_counter()
for _ in range(3):
    o2, l2 = jfn(q, kw, vw, n_prev)
jax.block_until_ready((o2, l2))
tj = (time.perf_counter() - t0) / 3
print(f"jnp _history_partial: {tj*1e3:.2f} ms/layer-call  ({tj/t:.1f}x slower)")

# numerics sanity at the big shape
mae = float(jnp.abs(out - o2).mean())
print(f"MAE kernel vs jnp(raw-cents): {mae:.4f}")
