"""Isolated kernel timing at bench shape: flat vs stacked, block sweep."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD, pack_decode_table, pq_codes_attention, pq_codes_attention_stacked,
)
from million_tpu.utils.timing import chained_bench

BS, NH, D, M, C = 7, 8, 128, 64, 256
N = 32768
L = 28

rng = np.random.default_rng(0)
kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
vcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
kp, vp = pack_decode_table(kcent), pack_decode_table(vcent)
q = jnp.asarray(rng.standard_normal((BS, NH, GROUP_PAD, D)) / D**0.5, jnp.bfloat16)
ncd = jnp.asarray(N - 512, jnp.int32)


import functools
@functools.partial(jax.jit, static_argnums=(1,))
def mkcodes(seed, stacked):
    shape = (L, BS, NH, M, 1024) if stacked else (BS, NH, M, 1024)
    tile = jax.random.bits(jax.random.PRNGKey(seed), shape, jnp.uint32).astype(jnp.int32)
    reps = (1,) * (len(shape) - 1) + (N // 4096,)
    return jnp.tile(tile, reps)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "flat"):
    kc, vc = mkcodes(1, False), mkcodes(2, False)
    for block in (4096, 8192, 16384):
        try:
            def step(qq, block=block):
                o, _ = pq_codes_attention(qq, kc, vc, kp, vp, ncd, block=block)
                return jnp.roll(qq, 1, -1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

            dt = chained_bench(step, q, iters=40)
            print(f"flat    block={block}: {dt*1e6:8.1f} us/call  x28={dt*28*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"flat    block={block}: FAIL {str(e)[:120]}", flush=True)

if which in ("all", "stacked"):
    kc, vc = mkcodes(1, True), mkcodes(2, True)
    li = jnp.asarray(13, jnp.int32)
    import jax.tree_util as jtu
    kp_s = jtu.tree_map(lambda x: jnp.broadcast_to(x, (L, *x.shape)), kp)
    vp_s = jtu.tree_map(lambda x: jnp.broadcast_to(x, (L, *x.shape)), vp)
    for block in (4096, 8192, 16384):
        try:
            def step(qq, block=block):
                o, _ = pq_codes_attention_stacked(qq, kc, vc, kp_s, vp_s, li, ncd, block=block)
                return jnp.roll(qq, 1, -1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

            dt = chained_bench(step, q, iters=40)
            print(f"stacked block={block}: {dt*1e6:8.1f} us/call  x28={dt*28*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"stacked block={block}: FAIL {str(e)[:120]}", flush=True)
