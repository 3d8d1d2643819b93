"""Microbenchmark + on-device parity check for the PQ decode kernel.

TPU analogue of the reference's bindings/test_kernel.py protocol
(test_kernel.py:86-112: MAE vs SDPA-on-decoded reference, then timed loop).

Run:  python -m million_tpu.benchmarks.kernel_bench [--n 32768] [--heads 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    pack_codes,
    pack_decode_table,
    pq_codes_attention,
)
from million_tpu.pq.ops import pq_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768, help="quantized tokens")
    ap.add_argument("--heads", type=int, default=8, help="KV heads")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--M", type=int, default=64)
    ap.add_argument("--nbits", type=int, default=8, help="bits per code (C=2^nbits)")
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--parity-n", type=int, default=2048)
    ap.add_argument("--outliers", type=int, default=0,
                    help="also time the outlier-corrected kernel with this "
                    "many exact K/V channels (pair with --M d/4 --nbits 7)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    bs, nh_k, d, M, C = args.bs, args.heads, args.d, args.M, 2**args.nbits

    scale = 1.0 / d**0.5

    direct = C <= 128  # nbits<=7: direct-index tables, no parity select
    kcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    vcent = jnp.asarray(rng.standard_normal((M, C, d // M)), jnp.float32)
    kpack = pack_decode_table(kcent, direct=direct)
    vpack = pack_decode_table(vcent, direct=direct)

    # ---- parity at a small length --------------------------------------
    np_ = args.parity_n
    q = rng.standard_normal((bs, nh_k, GROUP_PAD, d)).astype(np.float32)
    kc = rng.integers(0, C, (bs, nh_k, M, np_)).astype(np.uint8)
    vc = rng.integers(0, C, (bs, nh_k, M, np_)).astype(np.uint8)
    n_codes = np_ - 100
    out, lse = pq_codes_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        pack_codes(jnp.asarray(kc)), pack_codes(jnp.asarray(vc)), kpack, vpack,
        jnp.asarray(n_codes, jnp.int32), block=min(args.block, np_),
        direct=direct,
    )
    out.block_until_ready()

    kc_tok = np.swapaxes(kc, -1, -2)[:, :, :n_codes]
    vc_tok = np.swapaxes(vc, -1, -2)[:, :, :n_codes]
    khat = np.asarray(pq_decode(jnp.asarray(kc_tok), kcent.astype(jnp.bfloat16), "strided")).astype(np.float32)
    vhat = np.asarray(pq_decode(jnp.asarray(vc_tok), vcent.astype(jnp.bfloat16), "strided")).astype(np.float32)
    s = np.einsum("bhgk,bhnk->bhgn", q * scale, khat)
    p = np.exp(s - s.max(-1, keepdims=True))
    want = np.einsum("bhgn,bhnk->bhgk", p / p.sum(-1, keepdims=True), vhat)
    mae = np.abs(np.asarray(out) - want).mean()
    mx = np.abs(np.asarray(out) - want).max()
    print(f"parity n={n_codes}: MAE={mae:.2e} MaxAbsErr={mx:.2e}")
    assert mae < 2e-2, "kernel does not match oracle"

    # ---- timing at full length (chained to defeat tunnel elision) -------
    from million_tpu.utils.timing import chained_bench

    N = args.n
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    qb = jnp.asarray(q * scale, jnp.bfloat16)
    ncd = jnp.asarray(N, jnp.int32)

    # codes passed as args: closed-over device arrays would be embedded as
    # program constants, exploding compile time at GB scales.
    @jax.jit
    def step(qq, kc, vc):
        o, _ = pq_codes_attention(qq, kc, vc, kpack, vpack, ncd, block=args.block, direct=direct)
        # roll q so successive chained calls are NOT value-identical (some
        # runtimes dedupe repeated identical computations), while keeping a
        # data dependency on the kernel output.
        return jnp.roll(qq, 1, axis=-1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

    dt = chained_bench(lambda qq: step(qq, kc, vc), qb, iters=args.iters)
    code_bytes = 2 * bs * nh_k * M * N
    print(
        f"fused PQ attention: bs={bs} heads={nh_k} n={N} M={M}: {dt*1e6:.1f} us"
        f"  ({code_bytes/dt/1e9:.0f} GB/s effective over {code_bytes/1e6:.1f} MB codes)"
    )

    # dense bf16 baseline attention at the same length (what PQ replaces)
    kd = jnp.asarray(rng.standard_normal((bs, nh_k, N, d)), jnp.bfloat16)
    vd = jnp.asarray(rng.standard_normal((bs, nh_k, N, d)), jnp.bfloat16)

    @jax.jit
    def dense_step(qq, kd, vd):
        s = jnp.einsum("bhgk,bhnk->bhgn", qq.astype(jnp.float32), kd.astype(jnp.float32))
        pp = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhgn,bhnk->bhgk", pp, vd.astype(jnp.float32))
        return jnp.roll(qq, 1, axis=-1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

    dt2 = chained_bench(lambda qq: dense_step(qq, kd, vd), qb, iters=args.iters)
    dense_bytes = 2 * bs * nh_k * N * d * 2
    print(
        f"dense bf16 attention (XLA): {dt2*1e6:.1f} us"
        f"  ({dense_bytes/dt2/1e9:.0f} GB/s over {dense_bytes/1e6:.1f} MB)"
        f"  -> kernel speedup {dt2/dt:.2f}x"
    )

    if args.outliers:
        # outlier-corrected kernel timing (stacked wrapper, L=1): the coarse
        # geometry plus exact outlier slabs — K score correction + V value
        # output, dense MXU terms replacing half the gathers
        from million_tpu.ops.pq_attention_pallas import (
            pq_codes_attention_stacked,
        )

        OKV = args.outliers
        kc1, vc1 = kc[None], vc[None]
        kp1 = jax.tree.map(lambda t: t[None], kpack)
        vp1 = jax.tree.map(lambda t: t[None], vpack)
        ko = jnp.asarray(
            rng.standard_normal((1, bs, nh_k, 4, OKV, N // 4)), jnp.bfloat16
        )
        vo = jnp.asarray(
            rng.standard_normal((1, bs, nh_k, 4, OKV, N // 4)), jnp.bfloat16
        )
        qo = qb[..., :OKV]
        li = jnp.asarray(0, jnp.int32)

        @jax.jit
        def o_step(qq, kc, vc, ko, vo):
            o, _, co = pq_codes_attention_stacked(
                qq, kc, vc, kp1, vp1, li, ncd, block=args.block,
                direct=direct, qo=qq[..., :OKV], k_outliers=ko, v_outliers=vo,
            )
            return jnp.roll(qq, 1, axis=-1) + (
                (o[0, 0, 0, 0] + co[0, 0, 0, 0]) * 1e-20
            ).astype(qq.dtype)

        dto = chained_bench(
            lambda qq: o_step(qq, kc1, vc1, ko, vo), qb, iters=args.iters
        )
        ob = code_bytes + 2 * bs * nh_k * OKV * N * 2
        print(
            f"outlier-corrected kernel (OK=OV={OKV}): {dto*1e6:.1f} us"
            f"  ({ob/dto/1e9:.0f} GB/s over {ob/1e6:.1f} MB)"
            f"  vs dense {dt2/dto:.2f}x, vs plain kernel {dt/dto:.2f}x"
        )


if __name__ == "__main__":
    main()
