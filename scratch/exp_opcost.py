"""Measure per-op VPU costs on v5e: one pallas call runs N dependent
iterations via fori_loop; cost = (t(N_hi) - t(N_lo)) / (N_hi - N_lo)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, TW = 64, 128


def make_run(body, n_iter, shape, dtype):
    def kernel(x_ref, tab_ref, tab2_ref, out_ref):
        def step(i, acc):
            return body(acc, tab_ref[:], tab2_ref[:], i)

        out_ref[:] = jax.lax.fori_loop(0, n_iter, step, x_ref[:])

    @jax.jit
    def run(x, tab, tab2):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, tab, tab2)

    return run


def bench(name, body, dtype=jnp.int32, shape=(R, TW), n_lo=20000, n_hi=100000):
    rng = np.random.default_rng(0)
    if dtype == jnp.float32:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    else:
        x = jnp.asarray(rng.integers(0, 127, shape), dtype)
    tab = jnp.asarray(rng.standard_normal((shape[0], 128)), jnp.float32)
    tab2 = jnp.asarray(rng.standard_normal((shape[0], 128)), jnp.float32)

    def t(n):
        r = make_run(body, n, shape, dtype)
        r(x, tab, tab2).block_until_ready()  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r(x, tab, tab2).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(n_hi) - t(n_lo)) / (n_hi - n_lo)
    print(f"{name:46s} {per*1e9:8.2f} ns/iter (~{per*0.94e9:6.1f} cyc) {shape}")


if __name__ == "__main__":
    bench("add i32", lambda a, t, t2, i: a + 1)
    bench("shift+and i32", lambda a, t, t2, i: (a >> 1) & 127)
    bench("cmp+select i32", lambda a, t, t2, i: jnp.where(a > 64, a, a + 1))
    bench("gather f32 (64,128)",
          lambda a, t, t2, i: jnp.take_along_axis(t, a & 127, axis=1).astype(jnp.int32) + i)
    bench("gather f32 (8,128)",
          lambda a, t, t2, i: jnp.take_along_axis(t, a & 127, axis=1).astype(jnp.int32) + i,
          shape=(8, TW))
    bench("gather f32 (32,128)",
          lambda a, t, t2, i: jnp.take_along_axis(t, a & 127, axis=1).astype(jnp.int32) + i,
          shape=(32, TW))
    bench("2x gather + select (C=256 decode)",
          lambda a, t, t2, i: jnp.where(
              (a & 1) != 0,
              jnp.take_along_axis(t, a & 127, axis=1),
              jnp.take_along_axis(t2, a & 127, axis=1),
          ).astype(jnp.int32) + i)
    bench("full decode chain (shift,and,cmp,2xgather,sel)",
          lambda a, t, t2, i: jnp.where(
              ((a >> 3) & 128) != 0,
              jnp.take_along_axis(t, (a >> 3) & 127, axis=1),
              jnp.take_along_axis(t2, (a >> 3) & 127, axis=1),
          ).astype(jnp.int32) + i)
