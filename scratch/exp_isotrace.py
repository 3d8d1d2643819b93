"""Trace the ISOLATED stacked kernel chained loop and report the pallas op's
device duration (to compare with its in-step duration)."""
import functools
import shutil
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD, pack_decode_table, pq_codes_attention_stacked,
)

BS, NH, D, M, C = 7, 8, 128, 64, 256
N = 32768
L = 28

rng = np.random.default_rng(0)
kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
vcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
kp, vp = pack_decode_table(kcent), pack_decode_table(vcent)
import jax.tree_util as jtu
kp_s = jtu.tree_map(lambda x: jnp.broadcast_to(x, (L, *x.shape)), kp)
vp_s = jtu.tree_map(lambda x: jnp.broadcast_to(x, (L, *x.shape)), vp)
q = jnp.asarray(rng.standard_normal((BS, NH, GROUP_PAD, D)) / D**0.5, jnp.bfloat16)
ncd = jnp.asarray(N - 512, jnp.int32)


@jax.jit
def mkcodes(seed):
    tile = jax.random.bits(jax.random.PRNGKey(seed), (L, BS, NH, M, 1024), jnp.uint32).astype(jnp.int32)
    return jnp.tile(tile, (1, 1, 1, 1, N // 4096))


kc, vc = mkcodes(1), mkcodes(2)
li = jnp.asarray(13, jnp.int32)


@jax.jit
def step(qq, kc, vc):
    o, _ = pq_codes_attention_stacked(qq, kc, vc, kp_s, vp_s, li, ncd, block=8192)
    return jnp.roll(qq, 1, -1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)


x = q
for _ in range(3):
    x = step(x, kc, vc)
x.block_until_ready()

shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(20):
        x = step(x, kc, vc)
    x.block_until_ready()
print("done")
