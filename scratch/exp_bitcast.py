"""Probe Mosaic semantics needed for the fast decode kernel:
1. pltpu.bitcast f32 (8,128) -> bf16 (16,128): row mapping?
2. take_along_axis with a 256-lane table: supported? correct?
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_bitcast(in_ref, out_ref):
    out_ref[:] = pltpu.bitcast(in_ref[:], jnp.bfloat16)


def probe_bitcast(rows=16):
    # f32 row r = bf16 pair (lo=2r tagged, hi=2r+1 tagged) -> see where they land
    lo = np.arange(rows, dtype=np.float32).reshape(rows, 1) + np.zeros((1, 128), np.float32)
    hi = lo + 100.0
    lo16 = lo.astype(jnp.bfloat16)
    hi16 = hi.astype(jnp.bfloat16)
    packed = (
        np.asarray(jax.lax.bitcast_convert_type(jnp.asarray(lo16), jnp.uint16)).astype(np.uint32)
        | (np.asarray(jax.lax.bitcast_convert_type(jnp.asarray(hi16), jnp.uint16)).astype(np.uint32) << 16)
    )
    x = jax.lax.bitcast_convert_type(jnp.asarray(packed), jnp.float32)
    out = pl.pallas_call(
        k_bitcast,
        out_shape=jax.ShapeDtypeStruct((2 * rows, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    out = np.asarray(out).astype(np.float32)
    print("bitcast f32(%d,128)->bf16(%d,128) row contents (col 0):" % (rows, 2 * rows))
    print(out[:, 0].astype(np.int32))


def k_gather256(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


def probe_gather256():
    M, tw, C = 8, 128, 256
    tab = np.arange(M * C, dtype=np.float32).reshape(M, C)
    idx = np.random.default_rng(0).integers(0, C, (M, tw)).astype(np.int32)
    try:
        out = pl.pallas_call(
            k_gather256,
            out_shape=jax.ShapeDtypeStruct((M, tw), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(tab), jnp.asarray(idx))
        ref = np.take_along_axis(tab, idx, axis=1)
        print("gather256: ok, max err", np.abs(np.asarray(out) - ref).max())
    except Exception as e:
        print("gather256: FAILED:", str(e)[:500])


def probe_gather_bf16():
    M, tw, C = 8, 128, 128
    tab = (np.arange(M * C, dtype=np.float32).reshape(M, C) % 251).astype(jnp.bfloat16)
    idx = np.random.default_rng(0).integers(0, C, (M, tw)).astype(np.int32)
    try:
        out = pl.pallas_call(
            k_gather256,
            out_shape=jax.ShapeDtypeStruct((M, tw), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(tab), jnp.asarray(idx))
        ref = np.take_along_axis(np.asarray(tab).astype(np.float32), idx, axis=1)
        print("gather bf16 128-lane: ok, max err", np.abs(np.asarray(out).astype(np.float32) - ref).max())
    except Exception as e:
        print("gather bf16: FAILED:", str(e)[:300])


if __name__ == "__main__":
    probe_bitcast(8)
    probe_bitcast(16)
    probe_gather256()
    probe_gather_bf16()
