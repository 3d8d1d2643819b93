import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, TW = 64, 128
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.integers(1, 2**30, (R, TW)), jnp.int32)
tab = jnp.asarray(rng.integers(1, 2**30, (R, 128)), jnp.int32)

def chains(body, n_iter, reps=8):
    def kernel(x_ref, tab_ref, out_ref):
        t = tab_ref[:]
        out_ref[:] = jax.lax.fori_loop(0, n_iter, lambda i, acc: body(acc, t, i), x_ref[:])
    @jax.jit
    def run(x, tab):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((R, TW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, tab)
    x = x0
    run(x, tab).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        x = run(x, tab)
    x.block_until_ready()
    return (time.perf_counter() - t0) / reps

body = lambda a, t, i: jnp.where((a << 23) < 0, jnp.take_along_axis(t, a >> 9, axis=1) >> 16,
                                 jnp.take_along_axis(t, a >> 9, axis=1)) + i
for n in (20000, 120000, 520000):
    dt = chains(body, n)
    print(f"C256 n={n:7d}: {dt*1e3:9.3f} ms/call  ({dt/n*1e9:6.2f} ns/it)", flush=True)
body2 = lambda a, t, i: jnp.take_along_axis(t, a >> 8, axis=1) + i
for n in (20000, 120000, 520000):
    dt = chains(body2, n)
    print(f"C128 n={n:7d}: {dt*1e3:9.3f} ms/call  ({dt/n*1e9:6.2f} ns/it)", flush=True)
