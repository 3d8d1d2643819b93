"""Fused per-word-tile pipeline: decode a 512-token tile and immediately
score/softmax/PV it (no scratch, no produce/consume phases, one region).
Compare against the current two-phase kernel at bench shape.
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
    NEG_INF, LANES, WORD, GROUP_PAD, pack_codes, pack_decode_table,
    _decode_words, _expand_i8, pq_codes_attention,
)
from million_tpu.utils.timing import chained_bench


def _fused_kernel(nc_ref, q_ref, ss_ref, kc_ref, vc_ref, kt_ref, vt_ref,
                  vo_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref,
                  *, block, tw, interpret):
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[0, 0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q8 = q_ref[0, 0]
    G = q8.shape[0]
    ss = ss_ref[0, 0][:, :1]
    vo = vo_ref[:]
    kt, vt = kt_ref[:], vt_ref[:]
    n_tiles = block // (4 * tw)
    span = 4 * tw

    @pl.when(i * block < n_codes)
    def _():
        kw_all, vw_all = kc_ref[0, 0], vc_ref[0, 0]
        for t in range(n_tiles):
            wsl = slice(t * tw, (t + 1) * tw)
            kws, vws = kw_all[:, wsl], vw_all[:, wsl]
            k8 = _expand_i8(jnp.concatenate(
                [_decode_words(kt, kws, b, interpret) for b in range(4)], axis=1
            ), interpret)  # (4M, span)
            v8 = _expand_i8(jnp.concatenate(
                [_decode_words(vt, vws, b, interpret) for b in range(4)], axis=1
            ), interpret)
            s = jax.lax.dot_general(
                q8, k8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ss  # (G, span)
            # token position of slot (b*tw + lane) within this tile
            j = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
            pos = i * block + 4 * (t * tw + j % tw) + j // tw
            s = jnp.where(pos < n_codes, s, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
            x = p * 127.0
            ph_f = jnp.round(x)
            pl_f = jnp.round((x - ph_f) * 128.0)
            p2 = jnp.concatenate(
                [ph_f.astype(jnp.int8), pl_f.astype(jnp.int8)], axis=0
            )
            dd = jax.lax.dot_general(
                p2, v8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (2G, 4M)
            pv = (dd[:G].astype(jnp.float32)
                  + dd[G:].astype(jnp.float32) * (1.0 / 128.0)) * vo
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:, :1] = m_new

    @pl.when(i == nb - 1)
    def _():
        l = l_ref[:, :1]
        safe_l = jnp.maximum(l, 1e-30)
        out_ref[0, 0] = acc_ref[:] / safe_l
        lse = jnp.where(l > 0, m_ref[:, :1] + jnp.log(safe_l), NEG_INF)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fused_attention(q8, ss_b, key_codes, value_codes, ktab, vtab, vo, n_codes,
                    *, block=4096, interpret=False):
    bs, nh_k, G, R = q8.shape
    M, NW = key_codes.shape[2], key_codes.shape[3]
    N_max = NW * WORD
    tw = LANES
    nb = N_max // block
    bw = block // WORD
    nc = n_codes.astype(jnp.int32).reshape(1, 1)
    kernel = functools.partial(_fused_kernel, block=block, tw=tw, interpret=interpret)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bs, nh_k, nb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, R), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, LANES), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, bw), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, bw), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, R), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G, LANES), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nh_k, G, R), jnp.float32),
            jax.ShapeDtypeStruct((bs, nh_k, G, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, R), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
            pltpu.VMEM((G, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(nc, q8, ss_b, key_codes, value_codes, ktab, vtab, vo)
    return out, lse[..., 0]


def main():
    from million_tpu.ops.pq_attention_pallas import _prep_call, decode_row_maps, DecodeTable

    rng = np.random.default_rng(0)
    bs, nh_k, d, M, C, N = 7, 8, 128, 64, 256, 32768
    block = 4096
    kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    kpack, vpack = pack_decode_table(kcent), pack_decode_table(vcent)
    scale = 1.0 / d**0.5
    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, d)) * scale, jnp.bfloat16)
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    ncd = jnp.asarray(N, jnp.int32)

    q8, ss_b, vo, select_idx = _prep_call(q, kpack, vpack)

    # correctness vs the current kernel (same int8 numerics)
    o_new, lse_new = fused_attention(q8, ss_b, kc, vc, kpack.tab, vpack.tab, vo, ncd, block=block)
    o_new = np.asarray(o_new[..., select_idx])
    o_ref, lse_ref = pq_codes_attention(q, kc, vc, kpack, vpack, ncd, block=block)
    print("fused vs two-phase: out maxdiff",
          np.abs(o_new - np.asarray(o_ref)).max(),
          "lse maxdiff", np.abs(np.asarray(lse_new) - np.asarray(lse_ref)).max(),
          flush=True)

    @jax.jit
    def step_fused(qq):
        o, _ = fused_attention(qq, ss_b, kc, vc, kpack.tab, vpack.tab, vo, ncd, block=block)
        return jnp.roll(qq, 1, axis=-1) + (o[0, 0, 0, 0] * 1e-10).astype(jnp.int8)

    dt = chained_bench(step_fused, q8, iters=40)
    print(f"fused   {dt*1e6:9.1f} us", flush=True)

    @jax.jit
    def step_2p(qq):
        o, _ = pq_codes_attention(qq, kc, vc, kpack, vpack, ncd, block=block)
        return jnp.roll(qq, 1, axis=-1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

    dt2 = chained_bench(step_2p, q, iters=40)
    print(f"2phase  {dt2*1e6:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
