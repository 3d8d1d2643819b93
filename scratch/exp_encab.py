"""A/B the production encode paths at the 32K prefill per-layer shape:
fused Pallas kernel vs chunked jnp. Usage: python scratch/exp_encab.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.pq import ops as pq_ops
from million_tpu.utils.timing import chained_bench

bs, nh_k, n, d, M, C = 1, 8, 32768, 128, 64, 256
rng = np.random.default_rng(0)
cents = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
x0 = jax.random.normal(jax.random.PRNGKey(0), (bs, nh_k, n, d), jnp.bfloat16)


def bench(mode):
    pq_ops.RUNTIME_FUSED_ENCODE = mode == "fused"

    @jax.jit
    def enc(x):
        codes = pq_ops.runtime_encode(x, cents, "strided")
        # feed codes back into x so the chain has a data dependency
        return x + codes[..., :1].astype(jnp.bfloat16) * 1e-6

    t = chained_bench(enc, lambda: x0, iters=12)
    print(f"{mode}: {t*1e3:.2f} ms per layer-side ({bs*nh_k*n} tokens)")
    return t


tf = bench("fused")
tj = bench("jnp")
print(f"fused/jnp ratio: {tf/tj:.2f}")
