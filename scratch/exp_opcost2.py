"""Per-op VPU costs for decode-chain variants (v5e). Chain = per-byte work
to decode one word-tile byte. Measured as marginal ns/iter in a fori_loop."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, TW = 64, 128

def make_run(body, n_iter, shape, dtype):
    def kernel(x_ref, tab_ref, out_ref):
        def step(i, acc):
            return body(acc, tab_ref[:], i)
        out_ref[:] = jax.lax.fori_loop(0, n_iter, step, x_ref[:])
    @jax.jit
    def run(x, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, tab)
    return run

def bench(name, body, dtype=jnp.int32, shape=(R, TW), n_lo=200000, n_hi=1200000):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 2**30, shape), dtype)
    tab = jnp.asarray(rng.integers(1, 2**30, (shape[0], 128)), jnp.int32)
    def t(n):
        r = make_run(body, n, shape, dtype)
        r(x, tab).block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r(x, tab).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(n_hi) - t(n_lo)) / (n_hi - n_lo)
    print(f"{name:52s} {per*1e9:8.2f} ns/iter (~{per*0.94e9:6.1f} cyc) {shape}", flush=True)

B = 1  # byte position under test (non-zero shift)

if __name__ == "__main__":
    # current production C=256 chain for one byte:
    def cur(a, t, i):
        idx = a >> (8 * B + 1)
        par = (a << (31 - 8 * B)) < 0
        g = jnp.take_along_axis(t, idx, axis=1)
        return jnp.where(par, g >> 16, g) + i
    bench("C256 current: shift,gather,parshift,where(g>>16)", cur)

    # variable-shift select variant
    def vshift(a, t, i):
        idx = a >> (8 * B + 1)
        sh = (a >> (8 * B - 4)) & 16
        g = jnp.take_along_axis(t, idx, axis=1)
        return (g >> sh) + i
    bench("C256 vshift: shift,gather,shift&and,varshift", vshift)

    # direct chain (C<=128)
    def direct(a, t, i):
        idx = a >> (8 * B)
        return jnp.take_along_axis(t, idx, axis=1) + i
    bench("C128 direct: shift,gather", direct)

    # gather alone (idx precomputed would need extra state; approximate)
    bench("gather only (wrap idx)", lambda a, t, i: jnp.take_along_axis(t, a, axis=1) + i)
    bench("add i32", lambda a, t, i: a + 1)
    bench("shift i32", lambda a, t, i: (a >> 1) + i)
    bench("varshift i32 (vector shift amounts)", lambda a, t, i: (a >> (a & 16)) + i)
    bench("cmp+where", lambda a, t, i: jnp.where(a > 64, a, a + 1) + i)

    # 4-byte full-word current chain (all four bytes, concat) vs 4x direct
    def cur4(a, t, i):
        outs = []
        for b in range(4):
            idx = a >> (8 * b + 1) if b else a >> 1
            par = (a << (31 - 8 * b)) < 0
            g = jnp.take_along_axis(t, idx, axis=1)
            outs.append(jnp.where(par, g >> 16, g))
        return outs[0] + outs[1] + outs[2] + outs[3] + i
    bench("C256 word chain (4 bytes, summed)", cur4)

    def direct4(a, t, i):
        outs = []
        for b in range(4):
            idx = a >> (8 * b) if b else a
            outs.append(jnp.take_along_axis(t, idx, axis=1))
        return outs[0] + outs[1] + outs[2] + outs[3] + i
    bench("C128 word chain (4 bytes, summed)", direct4)
