"""Find the produce-loop schedule bottleneck: variants of the decode loop
at bench shape (bs=7, nh=8, N=32K, block=4096).

va_full     : current produce (store each selected tile)
vb_nostore  : gathers + select, XOR-accumulate, single store at end
vc_kv_split : all K tiles first, then all V tiles
ve_coalesce : concat 4 byte-tiles -> one (M, 512) store per word-tile
vf_prefetch : hoist all word loads first, then decode
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from million_tpu.ops.pq_attention_pallas import (
    NEG_INF, LANES, WORD, GROUP_PAD, pack_codes, pack_decode_table,
)
from million_tpu.utils.timing import chained_bench


def decode_tile(tab, w, b):
    t = w >> (8 * b)
    idx = t & 127
    hi = (t & 128) != 0
    g_lo = jnp.take_along_axis(tab[0, 0], idx, axis=1)
    g_hi = jnp.take_along_axis(tab[0, 1], idx, axis=1)
    return jnp.where(hi, g_hi, g_lo)


def make_kernel(block, tw, variant):
    def kernel(q_ref, kc_ref, vc_ref, kp_ref, vp_ref, out_ref,
               kh_ref, vh_ref):
        i = pl.program_id(2)
        nb = pl.num_programs(2)
        n_tiles = block // (4 * tw)
        M = kh_ref.shape[1]
        kw_all, vw_all = kc_ref[0, 0], vc_ref[0, 0]
        p_idx = i % 2

        if variant == "va_full":
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                kws, vws = kw_all[:, wsl], vw_all[:, wsl]
                for b in range(4):
                    osl = slice((t * 4 + b) * tw, (t * 4 + b + 1) * tw)
                    kh_ref[p_idx, :, osl] = decode_tile(kp_ref, kws, b)
                    vh_ref[p_idx, :, osl] = decode_tile(vp_ref, vws, b)
        elif variant == "vb_nostore":
            acck = jnp.zeros((M, tw), jnp.float32)
            accv = jnp.zeros((M, tw), jnp.float32)
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                kws, vws = kw_all[:, wsl], vw_all[:, wsl]
                for b in range(4):
                    acck = acck + decode_tile(kp_ref, kws, b)
                    accv = accv + decode_tile(vp_ref, vws, b)
            kh_ref[p_idx, :, :tw] = acck
            vh_ref[p_idx, :, :tw] = accv
        elif variant == "vc_kv_split":
            for t in range(n_tiles):
                kws = kw_all[:, t * tw:(t + 1) * tw]
                for b in range(4):
                    osl = slice((t * 4 + b) * tw, (t * 4 + b + 1) * tw)
                    kh_ref[p_idx, :, osl] = decode_tile(kp_ref, kws, b)
            for t in range(n_tiles):
                vws = vw_all[:, t * tw:(t + 1) * tw]
                for b in range(4):
                    osl = slice((t * 4 + b) * tw, (t * 4 + b + 1) * tw)
                    vh_ref[p_idx, :, osl] = decode_tile(vp_ref, vws, b)
        elif variant == "ve_coalesce":
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                kws, vws = kw_all[:, wsl], vw_all[:, wsl]
                ktiles = [decode_tile(kp_ref, kws, b) for b in range(4)]
                vtiles = [decode_tile(vp_ref, vws, b) for b in range(4)]
                osl = slice(t * 4 * tw, (t + 1) * 4 * tw)
                kh_ref[p_idx, :, osl] = jnp.concatenate(ktiles, axis=1)
                vh_ref[p_idx, :, osl] = jnp.concatenate(vtiles, axis=1)
        elif variant == "vf_prefetch":
            kws = [kw_all[:, t * tw:(t + 1) * tw] for t in range(n_tiles)]
            vws = [vw_all[:, t * tw:(t + 1) * tw] for t in range(n_tiles)]
            for t in range(n_tiles):
                for b in range(4):
                    osl = slice((t * 4 + b) * tw, (t * 4 + b + 1) * tw)
                    kh_ref[p_idx, :, osl] = decode_tile(kp_ref, kws[t], b)
                    vh_ref[p_idx, :, osl] = decode_tile(vp_ref, vws[t], b)

        # tiny consume so scratch is live (don't measure matmul here)
        @pl.when(i == nb - 1)
        def _():
            out_ref[0, 0] = (
                kh_ref[0, :GROUP_PAD, :128] + vh_ref[1, :GROUP_PAD, :128]
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "variant"))
def run(q, kc, vc, kpack, vpack, *, block, variant):
    bs, nh_k, G, d = q.shape
    M, NW = kc.shape[2], kc.shape[3]
    N_max = NW * WORD
    tw = LANES
    nb = N_max // block
    bw = block // WORD
    kernel = make_kernel(block, tw, variant)
    out = pl.pallas_call(
        kernel,
        grid=(bs, nh_k, nb),
        in_specs=[
            pl.BlockSpec((1, 1, G, 128), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, bw), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, bw), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, 128), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, nh_k, G, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, d // 2, block), jnp.float32),
            pltpu.VMEM((2, d // 2, block), jnp.float32),
        ],
    )(q, kc, vc, kpack, vpack)
    return out


def main():
    import sys
    variants = sys.argv[1:] or ["va_full", "vb_nostore", "vc_kv_split", "ve_coalesce", "vf_prefetch"]
    rng = np.random.default_rng(0)
    bs, nh_k, d, M, C, N = 7, 8, 128, 64, 256, 32768
    block = 4096
    kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    kpack = pack_decode_table(kcent)
    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, 128)), jnp.float32)
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))

    for variant in variants:
        @jax.jit
        def step(qq, variant=variant):
            o = run(qq, kc, vc, kpack, kpack, block=block, variant=variant)
            return jnp.roll(qq, 1, axis=-1) + o[0, 0] * 1e-20

        dt = chained_bench(step, q, iters=40)
        print(f"{variant:14s} {dt*1e6:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
