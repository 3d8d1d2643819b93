"""Round 4: byte-planar produce — all ALU/gather ops on whole-block
(M, bw=1024) tiles instead of per-128-lane word tiles. Token order becomes
byte-planar: slot b*bw + w = token 4w+b.

vk : current per-tile int8 decode (baseline)
vp : byte-planar whole-block ops
vq : byte-planar, K and V interleaved per byte
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from million_tpu.ops.pq_attention_pallas import (
    LANES, WORD, GROUP_PAD, pack_codes, pack_decode_table, _decode_words,
)
from million_tpu.utils.timing import chained_bench


def make_kernel(block, tw, variant):
    def kernel(q_ref, kc_ref, vc_ref, k8_ref, v8_ref, out_ref, kh_ref, vh_ref):
        i = pl.program_id(2)
        nb = pl.num_programs(2)
        n_tiles = block // (4 * tw)
        bw = block // 4
        kw_all, vw_all = kc_ref[0, 0], vc_ref[0, 0]
        p_idx = i % 2
        k8, v8 = k8_ref[:], v8_ref[:]
        # whole-block tables: tile lanes 8x so gather idx/table shapes match
        k8w = jnp.concatenate([k8] * (bw // 128), axis=1)
        v8w = jnp.concatenate([v8] * (bw // 128), axis=1)

        if variant == "vk":
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                kws, vws = kw_all[:, wsl], vw_all[:, wsl]
                osl = slice(t * 4 * tw, (t + 1) * 4 * tw)
                kh_ref[p_idx, :, osl] = jnp.concatenate(
                    [_decode_words(k8, kws, b, False) for b in range(4)], axis=1
                )
                vh_ref[p_idx, :, osl] = jnp.concatenate(
                    [_decode_words(v8, vws, b, False) for b in range(4)], axis=1
                )
        elif variant == "vp":
            kh_ref[p_idx, :, :] = jnp.concatenate(
                [_decode_words(k8w, kw_all, b, False) for b in range(4)], axis=1
            )
            vh_ref[p_idx, :, :] = jnp.concatenate(
                [_decode_words(v8w, vw_all, b, False) for b in range(4)], axis=1
            )
        elif variant == "vq":
            for b in range(4):
                osl = slice(b * bw, (b + 1) * bw)
                kh_ref[p_idx, :, osl] = _decode_words(k8w, kw_all, b, False)
                vh_ref[p_idx, :, osl] = _decode_words(v8w, vw_all, b, False)

        @pl.when(i == nb - 1)
        def _():
            out_ref[0, 0] = (
                kh_ref[0, :GROUP_PAD, :128].astype(jnp.float32)
                + vh_ref[1, :GROUP_PAD, :128].astype(jnp.float32)
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "variant"))
def run(q, kc, vc, k8, v8, *, block, variant):
    bs, nh_k, G, d = q.shape
    M, NW = kc.shape[2], kc.shape[3]
    tw = LANES
    nb = NW * WORD // block
    bw = block // WORD
    return pl.pallas_call(
        make_kernel(block, tw, variant),
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
            pltpu.VMEM((2, M, block), jnp.int32),
            pltpu.VMEM((2, M, block), jnp.int32),
        ],
    )(q, kc, vc, k8, v8)


def main():
    rng = np.random.default_rng(0)
    bs, nh_k, d, M, C, N = 7, 8, 128, 64, 256, 32768
    block = 4096
    kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    k8 = pack_decode_table(kcent).tab
    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, 128)), jnp.float32)
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))

    for variant in ["vk", "vp", "vq", "vp"]:
        @jax.jit
        def step(qq, variant=variant):
            o = run(qq, kc, vc, k8, k8, block=block, variant=variant)
            return jnp.roll(qq, 1, axis=-1) + o[0, 0] * 1e-20

        dt = chained_bench(step, q, iters=40)
        print(f"{variant:4s} {dt*1e6:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
