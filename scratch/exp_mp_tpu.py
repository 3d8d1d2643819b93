"""Real-TPU parity + perf: multi-page paged kernel vs single-page, at the
serving shape (bs=6, nh_k=8, d=128, M=64, 32K ctx, 2048-token pages)."""
import sys
import jax, jax.numpy as jnp, numpy as np
from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD, pack_decode_table, pq_paged_attention_stacked,
    pq_paged_attention_stacked_mp)
from million_tpu.utils.timing import chained_bench

L, bs, nh_k, d, M, C = 2, 6, 8, 128, 64, 256
page_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N = 32768
ps_w = page_size // 4
P_seq = N // page_size
n_pages = bs * P_seq
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, d)) * 0.1, jnp.bfloat16)
kcent = jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32)
vcent = jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32)
kpack = jax.vmap(pack_decode_table)(kcent)
vpack = jax.vmap(pack_decode_table)(vcent)
import functools
@functools.partial(jax.jit, static_argnames=())
def mkpool(seed):
    return jax.random.bits(
        jax.random.PRNGKey(seed), (L, n_pages + 1, nh_k, M, ps_w), jnp.uint32
    ).astype(jnp.int32)
kp, vp = mkpool(jnp.asarray(1)), mkpool(jnp.asarray(2))
jax.block_until_ready((kp, vp))
print("pools built", flush=True)
pt = jnp.asarray(np.random.default_rng(1).permutation(n_pages).reshape(bs, P_seq), jnp.int32)
n_codes = jnp.full((bs,), N, jnp.int32)
li = jnp.asarray(0, jnp.int32)

import time
sfn = jax.jit(lambda q, kp, vp: pq_paged_attention_stacked(
    q, kp, vp, kpack, vpack, li, pt, n_codes, p_bucket=P_seq))
mfn = jax.jit(lambda q, kp, vp: pq_paged_attention_stacked_mp(
    q, kp, vp, kpack, vpack, li, pt, n_codes, p_bucket=P_seq))
t0 = time.perf_counter()
oa, la = sfn(q, kp, vp); jax.block_until_ready((oa, la))
print(f"single-page compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
ob, lb = mfn(q, kp, vp); jax.block_until_ready((ob, lb))
print(f"multi-page compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
print("parity maxdiff out", float(jnp.abs(oa - ob).max()),
      "lse", float(jnp.abs(la - lb).max()))
ts = chained_bench(lambda x: sfn(q + 0 * x.ravel()[0].astype(jnp.bfloat16), kp, vp)[0],
                   jnp.zeros((4,)), iters=50)
tm = chained_bench(lambda x: mfn(q + 0 * x.ravel()[0].astype(jnp.bfloat16), kp, vp)[0],
                   jnp.zeros((4,)), iters=50)
print(f"single-page: {ts*1e3:.3f} ms | multi-page: {tm*1e3:.3f} ms "
      f"({ts/tm:.2f}x faster)")
