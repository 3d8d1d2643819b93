"""Why do in-kernel gathers run 3.6x slower than isolated throughput?
Start from the fast test (f0) and add kernel features:

f0: idx from VMEM, 1 table, accumulate           (test baseline)
f1: + idx derived by shift from word tile
f2: + two tables + select (C=256 decode)
f3: + store each tile to scratch slice (no accum)
f4: + codes streamed from HBM via BlockSpec grid
f5: f4 with accumulate instead of stores
All normalized to ns per (64,128) gather.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64
REPS = 64  # gathers per grid step (or word-tiles*4*2 equivalents)


def timeit(run, args, n_gathers):
    run(*args).block_until_ready()
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        run(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"  {best*1e3:7.2f} ms  {best/n_gathers*1e9:6.1f} ns/gather(64x128)")


def f0(G):
    def kernel(idx_ref, tab_ref, o_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        for r in range(REPS):
            ix = idx_ref[r % 8] ^ r
            acc = acc + jnp.take_along_axis(tab_ref[:], ix, axis=1)
        o_ref[:] = acc

    @jax.jit
    def run(idx, tab):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(G,))(idx, tab)
    return run


def f1(G):
    def kernel(w_ref, tab_ref, o_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        for r in range(REPS // 4):
            w = w_ref[r % 8]
            for b in range(4):
                t = w if b == 0 else (w >> (8 * b))
                acc = acc + jnp.take_along_axis(tab_ref[:], t, axis=1)
        o_ref[:] = acc

    @jax.jit
    def run(w, tab):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(G,))(w, tab)
    return run


def f2(G):
    def kernel(w_ref, tab_ref, tab2_ref, o_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        tab, tab2 = tab_ref[:], tab2_ref[:]
        for r in range(REPS // 8):
            w = w_ref[r % 8]
            for b in range(4):
                t = w if b == 0 else (w >> (8 * b))
                hi = (w if b == 3 else (w << (24 - 8 * b))) < 0
                glo = jnp.take_along_axis(tab, t, axis=1)
                ghi = jnp.take_along_axis(tab2, t, axis=1)
                acc = acc + jnp.where(hi, ghi, glo)
        o_ref[:] = acc

    @jax.jit
    def run(w, tab, tab2):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            grid=(G,))(w, tab, tab2)
    return run


def f3(G):
    def kernel(w_ref, tab_ref, tab2_ref, o_ref, sc_ref):
        tab, tab2 = tab_ref[:], tab2_ref[:]
        for r in range(REPS // 8):
            w = w_ref[r % 8]
            for b in range(4):
                t = w if b == 0 else (w >> (8 * b))
                hi = (w if b == 3 else (w << (24 - 8 * b))) < 0
                glo = jnp.take_along_axis(tab, t, axis=1)
                ghi = jnp.take_along_axis(tab2, t, axis=1)
                sl = slice((r * 4 + b) * 128, (r * 4 + b + 1) * 128)
                sc_ref[:, sl] = jnp.where(hi, ghi, glo)
        o_ref[:] = sc_ref[:, :128]

    @jax.jit
    def run(w, tab, tab2):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, (REPS // 8) * 4 * 128), jnp.float32)],
            grid=(G,))(w, tab, tab2)
    return run


def f4(G, store=True):
    # words streamed from HBM: (G, R, 1024) int32, one (R,1024) block/step
    def kernel(wc_ref, tab_ref, tab2_ref, o_ref, sc_ref):
        tab, tab2 = tab_ref[:], tab2_ref[:]
        acc = jnp.zeros((R, 128), jnp.float32)
        for r in range(REPS // 8):
            w = wc_ref[0, :, r * 128:(r + 1) * 128]
            for b in range(4):
                t = w if b == 0 else (w >> (8 * b))
                hi = (w if b == 3 else (w << (24 - 8 * b))) < 0
                glo = jnp.take_along_axis(tab, t, axis=1)
                ghi = jnp.take_along_axis(tab2, t, axis=1)
                if store:
                    sl = slice((r * 4 + b) * 128, (r * 4 + b + 1) * 128)
                    sc_ref[:, sl] = jnp.where(hi, ghi, glo)
                else:
                    acc = acc + jnp.where(hi, ghi, glo)
        if store:
            o_ref[:] = sc_ref[:, :128]
        else:
            o_ref[:] = acc

    @jax.jit
    def run(wc, tab, tab2):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, R, (REPS // 8) * 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, (REPS // 8) * 4 * 128), jnp.float32)],
            grid=(G,))(wc, tab, tab2)
    return run


def main():
    rng = np.random.default_rng(0)
    G = 800
    idx = jnp.asarray(rng.integers(0, 127, (8, R, 128)), jnp.int32)
    w8 = jnp.asarray(rng.integers(0, 2**31, (8, R, 128)), jnp.int32)
    tab = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    tab2 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)
    n = G * REPS

    print("f0 idx-from-vmem, 1 tab, accum:")
    timeit(f0(G), (idx, tab), n)
    print("f1 + shift-derived idx:")
    timeit(f1(G), (w8, tab), n)
    print("f2 + 2 tables + select (half the decode reps, 2 gathers each):")
    timeit(f2(G), (w8, tab, tab2), n)
    print("f3 + scratch stores:")
    timeit(f3(G), (w8, tab, tab2), n)
    wc = jnp.asarray(rng.integers(0, 2**31, (G, R, (REPS // 8) * 128)), jnp.int32)
    print("f4 + HBM-streamed words (store):")
    timeit(f4(G, True), (wc, tab, tab2), n)
    print("f5 HBM-streamed words (accum):")
    timeit(f4(G, False), (wc, tab, tab2), n)


if __name__ == "__main__":
    main()
