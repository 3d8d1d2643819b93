"""pq_encode variants at prefill chunk shape: (1, 8, 1024, 128), M=64, C=256."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from million_tpu.pq.ops import pq_encode, subspace_view

B, H, NTOK, D, M, C = 1, 8, 1024, 128, 64, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, NTOK, D)), jnp.float32)
cents = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)

def timeit(name, fn, ref=None):
    o = fn(x)
    o.block_until_ready()
    if ref is not None:
        match = float(jnp.mean((o == ref).astype(jnp.float32)))
        tag = f" match={match:.4f}"
    else:
        tag = ""
    reps = 30
    xs = x
    t0 = time.perf_counter()
    outs = []
    for i in range(reps):
        outs.append(fn(xs + jnp.float32(i * 1e-6)))  # distinct dispatches
    np.asarray(outs[-1][0, 0, 0, :2])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.2f} ms{tag}", flush=True)
    return o

@jax.jit
def cur(x):
    return pq_encode(x, cents, "strided")

@jax.jit
def padded_mxu(x):
    xs = subspace_view(x.astype(jnp.float32), M, "strided")  # (..., M, 2)
    xp = jnp.pad(xs, [(0, 0)] * 3 + [(0, 0), (0, 6)])  # (..., M, 8)
    cp = jnp.pad(cents, [(0, 0), (0, 0), (0, 6)])  # (M, C, 8)
    ip = jax.lax.dot_general(
        xp, cp, (((3,), (2,)), ((2,), (0,))) if False else
        (((xp.ndim - 1,), (2,)), ((xp.ndim - 2,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )  # batch m: (M, B, H, N, C)
    ip = jnp.moveaxis(ip, 0, -2)  # (B, H, N, M, C)
    c_sq = jnp.sum(cents * cents, -1)
    return jnp.argmin(c_sq - 2.0 * ip, -1).astype(jnp.uint8)

@jax.jit
def bf16_scores(x):
    xs = subspace_view(x.astype(jnp.float32), M, "strided")
    ip = jnp.einsum("...mk,mck->...mc", xs, cents.astype(jnp.float32))  # default precision
    c_sq = jnp.sum(cents * cents, -1)
    return jnp.argmin((c_sq - 2.0 * ip).astype(jnp.bfloat16), -1).astype(jnp.uint8)

ref = timeit("current (f32 VPU einsum+argmin)", cur)
timeit("padded d_m->8 MXU dot_general", padded_mxu, ref)
timeit("default-precision + bf16 argmin", bf16_scores, ref)
