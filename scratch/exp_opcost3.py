import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, TW = 64, 128
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(1, 2**30, (R, TW)), jnp.int32)
tab = jnp.asarray(rng.integers(1, 2**30, (R, 128)), jnp.int32)

def chains(body_name, body, n_iter, reps=24):
    def kernel(x_ref, tab_ref, out_ref):
        t = tab_ref[:]
        def step(i, acc):
            return body(acc, t, i)
        out_ref[:] = jax.lax.fori_loop(0, n_iter, step, x_ref[:])
    @jax.jit
    def run(x, tab):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, TW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, tab)
    # chain outputs -> inputs so no dispatch is identical / elidable
    x = x0
    run(x, tab).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        x = run(x, tab)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt

def measure(name, body):
    lo, hi = 20000, 120000
    a = chains(name, body, lo)
    b = chains(name, body, hi)
    per = (b - a) / (hi - lo)
    print(f"{name:52s} {per*1e9:7.2f} ns/iter (~{per*0.94e9:6.1f} cyc)", flush=True)

measure("C256 current (shift,gather,parshift,where>>16)",
    lambda a, t, i: jnp.where((a << 23) < 0, jnp.take_along_axis(t, a >> 9, axis=1) >> 16,
                              jnp.take_along_axis(t, a >> 9, axis=1)) + i)
measure("C128 direct (shift,gather)",
    lambda a, t, i: jnp.take_along_axis(t, a >> 8, axis=1) + i)
measure("gather only", lambda a, t, i: jnp.take_along_axis(t, a, axis=1) + i)
measure("add only", lambda a, t, i: a + i)
measure("C256 vshift (shift,gather,and,varshift)",
    lambda a, t, i: (jnp.take_along_axis(t, a >> 9, axis=1) >> ((a >> 4) & 16)) + i)
