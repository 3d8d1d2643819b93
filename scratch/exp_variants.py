"""Attribute kernel time by running stripped variants at bench shape:
v0 full | v1 no-gather decode (copy) | v2 no-decode (consume stale scratch)
| v3 no-consume (decode only) | v4 single-gather decode (C=128 pretend)
| v5 no-decode & no-consume (DMA only)
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
    _slot_positions, _expand_packed, decode_row_perm,
)
from million_tpu.utils.timing import chained_bench


def _decode_v(tab, w, b, variant):
    t = w >> (8 * b)
    idx = t & 127
    if variant == "copy":
        return [pltpu.bitcast(t, jnp.float32)]
    if variant == "gather1":
        return [jnp.take_along_axis(tab[0, 0], idx, axis=1)]
    hi = (t & 128) != 0
    g_lo = jnp.take_along_axis(tab[0, 0], idx, axis=1)
    g_hi = jnp.take_along_axis(tab[0, 1], idx, axis=1)
    return [jnp.where(hi, g_hi, g_lo)]


def make_kernel(block, tw, variant):
    do_produce = variant not in ("noproduce",)
    do_consume = variant not in ("noconsume", "dmaonly")
    dec = "full"
    if variant in ("copy", "gather1"):
        dec = variant
    if variant == "dmaonly":
        do_produce = False

    def kernel(nc_ref, q_ref, kc_ref, vc_ref, kp_ref, vp_ref, out_ref, lse_ref,
               acc_ref, m_ref, l_ref, kh_ref, vh_ref):
        i = pl.program_id(2)
        nb = pl.num_programs(2) - 1
        n_codes = nc_ref[0, 0]

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        qq = q_ref[0, 0]

        def consume(p_idx, bi):
            kh = _expand_packed(kh_ref[p_idx], False)
            s = jax.lax.dot_general(qq, kh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            pos = bi * block + _slot_positions(block, tw)
            s = jnp.where(pos < n_codes, s, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            vh = _expand_packed(vh_ref[p_idx], False)
            pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:, :1] = m_new
            l_ref[:, :1] = l_new

        n_tiles = block // (4 * tw)
        M = kh_ref.shape[1]

        def produce(p_idx, kw, vw):
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                kws, vws = kw[:, wsl], vw[:, wsl]
                for b in range(4):
                    osl = slice((t * 4 + b) * tw, (t * 4 + b + 1) * tw)
                    for j, tile in enumerate(_decode_v(kp_ref[:], kws, b, dec)):
                        kh_ref[p_idx, j * M:(j + 1) * M, osl] = tile
                    for j, tile in enumerate(_decode_v(vp_ref[:], vws, b, dec)):
                        vh_ref[p_idx, j * M:(j + 1) * M, osl] = tile

        c_live = jnp.logical_and(i > 0, (i - 1) * block < n_codes)
        if do_consume:
            @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 0))
            def _():
                consume(0, i - 1)

            @pl.when(jnp.logical_and(c_live, (i - 1) % 2 == 1))
            def _():
                consume(1, i - 1)

        p_live = jnp.logical_and(i < nb, i * block < n_codes)
        if do_produce:
            @pl.when(jnp.logical_and(p_live, i % 2 == 0))
            def _():
                produce(0, kc_ref[0, 0], vc_ref[0, 0])

            @pl.when(jnp.logical_and(p_live, i % 2 == 1))
            def _():
                produce(1, kc_ref[0, 0], vc_ref[0, 0])

        @pl.when(i == nb)
        def _():
            l = l_ref[:, :1]
            safe_l = jnp.maximum(l, 1e-30)
            out_ref[0, 0] = acc_ref[:] / safe_l
            lse = jnp.where(l > 0, m_ref[:, :1] + jnp.log(safe_l), NEG_INF)
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "variant"))
def attn(q, key_codes, value_codes, kpack, vpack, n_codes, *, block, variant):
    bs, nh_k, G, d = q.shape
    M, NW = key_codes.shape[2], key_codes.shape[3]
    N_max = NW * WORD
    tw = LANES
    nb = N_max // block
    bw = block // WORD
    nc = n_codes.astype(jnp.int32).reshape(1, 1)
    kernel = make_kernel(block, tw, variant)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, nh_k, nb + 1),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, bw), lambda b, h, i, nb=nb: (b, h, 0, jnp.minimum(i, nb - 1)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, bw), lambda b, h, i, nb=nb: (b, h, 0, jnp.minimum(i, nb - 1)), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, d), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, LANES), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, d), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, d), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((2, d // 2, block), jnp.float32),
            pltpu.VMEM((2, d // 2, block), jnp.float32),
        ],
    )(nc, q, key_codes, value_codes, kpack, vpack)
    return out


def main():
    rng = np.random.default_rng(0)
    bs, nh_k, d, M, C, N = 7, 8, 128, 64, 256, 32768
    block = 4096
    kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    kpack = pack_decode_table(kcent)
    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, d)) * 0.09, jnp.bfloat16)
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    ncd = jnp.asarray(N, jnp.int32)

    for variant in ["full", "gather1", "copy", "noconsume", "noproduce", "dmaonly"]:
        @jax.jit
        def step(qq, kc=kc, vc=vc, variant=variant):
            o = attn(qq, kc, vc, kpack, kpack, ncd, block=block, variant=variant)
            return jnp.roll(qq, 1, axis=-1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

        dt = chained_bench(step, q, iters=40)
        print(f"{variant:12s} {dt*1e6:9.1f} us")


if __name__ == "__main__":
    main()
