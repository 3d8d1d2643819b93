"""Measure PQ encode cost at the 32K prefill shape and try cheaper variants.

Current path (pq_encode_chunked): per 1024-token chunk, materializes a
(8, 1024, 64, 256) f32 distance tensor in HBM (~536 MB) then argmins it —
write+read ~17 GB per layer-side at 32K. Candidates:
  a) status quo (f32 dists)
  b) bf16 dists (halve the materialized tensor)
  c) argmin folded per-chunk with smaller chunks
"""
import time
import functools
import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.pq.ops import pq_encode_chunked, pq_encode, subspace_view
from million_tpu.utils.timing import chained_bench

NH, N, D, M, C = 8, 32768, 128, 64, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, NH, N, D)), jnp.bfloat16)
cents = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)


@jax.jit
def enc_now(x):
    return pq_encode_chunked(x, cents, "strided")


def pq_encode_bf16d(x, cents, layout, chunk=1024):
    """Variant: distances cast to bf16 before the argmin-visible tensor."""
    def one(xc):
        M = cents.shape[-3]
        xs = subspace_view(xc.astype(jnp.float32), M, layout)
        c = cents.astype(jnp.float32)
        kpad = (-c.shape[-1]) % 8
        xs_p = jnp.pad(xs, [(0, 0)] * (xs.ndim - 1) + [(0, kpad)])
        c_p = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, kpad)])
        ip = jax.lax.dot_general(
            xs_p, c_p, (((xs_p.ndim - 1,), (2,)), ((xs_p.ndim - 2,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )
        ip = jnp.moveaxis(ip, 0, -2)
        c_sq = jnp.sum(c * c, axis=-1)
        dists = (c_sq - 2.0 * ip).astype(jnp.bfloat16)
        return jnp.argmin(dists, axis=-1).astype(jnp.uint8)
    n = x.shape[-2]
    parts = [
        one(jax.lax.slice_in_dim(x, s, min(s + chunk, n), axis=-2))
        for s in range(0, n, chunk)
    ]
    return jnp.concatenate(parts, axis=-2)


@jax.jit
def enc_bf16(x):
    return pq_encode_bf16d(x, cents, "strided")


def bench(f, x):
    st = f(x)
    st.block_until_ready()
    t = chained_bench(lambda s: f(x + s[0, 0, 0, 0].astype(x.dtype)), x, iters=8)
    return t


for name, f in [("f32-dists (current)", enc_now), ("bf16-dists", enc_bf16)]:
    t = bench(f, x)
    print(f"{name}: {t*1e3:.2f} ms per layer-side (nh=8, n=32768)")

# agreement between the two
ca = np.asarray(enc_now(x))
cb = np.asarray(enc_bf16(x))
agree = (ca == cb).mean()
# reconstruction error comparison
from million_tpu.pq.ops import pq_decode
ra = np.asarray(pq_decode(jnp.asarray(ca), cents, "strided"), np.float32)
rb = np.asarray(pq_decode(jnp.asarray(cb), cents, "strided"), np.float32)
xf = np.asarray(x, np.float32)
print(f"code agreement: {agree:.4f}")
print(f"recon MSE f32: {((ra-xf)**2).mean():.6f}  bf16: {((rb-xf)**2).mean():.6f}")
