"""One-layer 32K causal attention: flash default vs tuned vs splash-GQA."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.experimental.pallas.ops.tpu.flash_attention as fa
from jax.experimental.pallas.ops.tpu import splash_attention as sa

N, NH, NK, D = 32768, 24, 8, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((1, NH, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((1, NK, N, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((1, NK, N, D)), jnp.bfloat16)
scale = 1.0 / D**0.5

def timeit(name, fn, *args):
    fn(*args)[0].block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    o = None
    for i in range(reps):
        o = fn(*args)
    np.asarray(o[0, 0, 0, :2])
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * 2 * N * N * D * NH / 2  # causal
    print(f"{name:36s} {dt*1e3:9.1f} ms  ({flops/dt/1e12:6.1f} TFLOP/s)", flush=True)

def gqa_expand(x):
    return jnp.repeat(x, NH // NK, axis=1)

@jax.jit
def f_default(q, k, v):
    return fa.flash_attention(q, gqa_expand(k), gqa_expand(v), causal=True, sm_scale=scale)

bs_tuned = fa.BlockSizes(block_q=512, block_k_major=1024, block_k=1024, block_b=1)
@jax.jit
def f_tuned(q, k, v):
    return fa.flash_attention(q, gqa_expand(k), gqa_expand(v), causal=True, sm_scale=scale,
                              block_sizes=bs_tuned)

bs_tuned2 = fa.BlockSizes(block_q=1024, block_k_major=2048, block_k=2048, block_b=1)
@jax.jit
def f_tuned2(q, k, v):
    return fa.flash_attention(q, gqa_expand(k), gqa_expand(v), causal=True, sm_scale=scale,
                              block_sizes=bs_tuned2)

# splash GQA: q (NH, N, D), kv (NK, N, D); q heads grouped per kv head
mask = sa.MultiHeadMask([sa.CausalMask((N, N)) for _ in range(NH)])
splash = sa.make_splash_mqa_single_device(
    mask, block_sizes=sa.BlockSizes.get_default())
@jax.jit
def f_splash(q, k, v):
    qq = (q[0] * scale).astype(jnp.bfloat16).reshape(NK, NH // NK, N, D)
    out = jax.vmap(splash)(qq, k[0], v[0])
    return out.reshape(1, NH, N, D)

timeit("flash default(128)", f_default, q, k, v)
timeit("flash tuned(512/1024)", f_tuned, q, k, v)
timeit("flash tuned(1024/2048)", f_tuned2, q, k, v)
try:
    timeit("splash gqa default", f_splash, q, k, v)
except Exception as e:
    print("splash fail:", str(e)[:300])
