"""Round 2: wrap-gather (no &127), sign-bit hi test, coalesced stores.

vg : coalesce + wrap-gather + sign-bit hi
vh : vg with all-gathers-then-all-selects ILP ordering
vi : vg but hi via (t & 128) != 0
vj : vg + K/V fully separated loops
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
    LANES, WORD, GROUP_PAD, pack_codes, pack_decode_table,
)
from million_tpu.utils.timing import chained_bench


def decode4(tab, w, hi_mode):
    """Decode all 4 bytes of word tile w (M,tw) -> list of 4 (M,tw) f32."""
    outs = []
    for b in range(4):
        t = w if b == 0 else (w >> (8 * b))
        if hi_mode == "sign":
            s = w if b == 3 else (w << (24 - 8 * b))
            hi = s < 0
        else:
            hi = (t & 128) != 0
        g_lo = jnp.take_along_axis(tab[0, 0], t, axis=1)
        g_hi = jnp.take_along_axis(tab[0, 1], t, axis=1)
        outs.append(jnp.where(hi, g_hi, g_lo))
    return outs


def decode4_ilp(tab, w):
    ts = [w if b == 0 else (w >> (8 * b)) for b in range(4)]
    his = [(w if b == 3 else (w << (24 - 8 * b))) < 0 for b in range(4)]
    glos = [jnp.take_along_axis(tab[0, 0], t, axis=1) for t in ts]
    ghis = [jnp.take_along_axis(tab[0, 1], t, axis=1) for t in ts]
    return [jnp.where(h, gh, gl) for h, gh, gl in zip(his, ghis, glos)]


def make_kernel(block, tw, variant):
    def kernel(q_ref, kc_ref, vc_ref, kp_ref, vp_ref, out_ref, kh_ref, vh_ref):
        i = pl.program_id(2)
        nb = pl.num_programs(2)
        n_tiles = block // (4 * tw)
        kw_all, vw_all = kc_ref[0, 0], vc_ref[0, 0]
        p_idx = i % 2

        def store4(ref, t, tiles):
            osl = slice(t * 4 * tw, (t + 1) * 4 * tw)
            ref[p_idx, :, osl] = jnp.concatenate(tiles, axis=1)

        if variant in ("vg", "vi"):
            hm = "sign" if variant == "vg" else "mask"
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                store4(kh_ref, t, decode4(kp_ref, kw_all[:, wsl], hm))
                store4(vh_ref, t, decode4(vp_ref, vw_all[:, wsl], hm))
        elif variant == "vh":
            for t in range(n_tiles):
                wsl = slice(t * tw, (t + 1) * tw)
                store4(kh_ref, t, decode4_ilp(kp_ref, kw_all[:, wsl]))
                store4(vh_ref, t, decode4_ilp(vp_ref, vw_all[:, wsl]))
        elif variant == "vj":
            for t in range(n_tiles):
                store4(kh_ref, t, decode4_ilp(kp_ref, kw_all[:, t * tw:(t + 1) * tw]))
            for t in range(n_tiles):
                store4(vh_ref, t, decode4_ilp(vp_ref, vw_all[:, t * tw:(t + 1) * tw]))

        @pl.when(i == nb - 1)
        def _():
            out_ref[0, 0] = kh_ref[0, :GROUP_PAD, :128] + vh_ref[1, :GROUP_PAD, :128]

    return kernel


@functools.partial(jax.jit, static_argnames=("block", "variant"))
def run(q, kc, vc, kpack, vpack, *, block, variant):
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
            pltpu.VMEM((2, d // 2, block), jnp.float32),
            pltpu.VMEM((2, d // 2, block), jnp.float32),
        ],
    )(q, kc, vc, kpack, vpack)


def check_correct():
    """wrap-gather + sign-hi must equal masked decode."""
    rng = np.random.default_rng(1)
    M, C = 8, 256
    cents = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    tab = pack_decode_table(cents)
    w = jnp.asarray(rng.integers(0, 2**32, (M, 128), dtype=np.uint64).astype(np.int64).astype(np.int32))

    def kernel(w_ref, t_ref, o_ref):
        tiles = decode4(t_ref, w_ref[:], "sign")
        o_ref[:] = jnp.concatenate(tiles, axis=1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, tab)
    # reference
    wn = np.asarray(w).astype(np.uint32)
    ref = np.zeros((M, 512), np.float32)
    tabn = np.asarray(tab)
    for b in range(4):
        byte = (wn >> (8 * b)) & 0xFF
        for m in range(M):
            for l in range(128):
                c = byte[m, l]
                ref[m, b * 128 + l] = tabn[0, c // 128, m, c % 128]
    np.testing.assert_array_equal(np.asarray(out), ref)
    print("wrap+sign decode correct")


def main():
    check_correct()
    rng = np.random.default_rng(0)
    bs, nh_k, d, M, C, N = 7, 8, 128, 64, 256, 32768
    block = 4096
    kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
    kpack = pack_decode_table(kcent)
    q = jnp.asarray(rng.standard_normal((bs, nh_k, GROUP_PAD, 128)), jnp.float32)
    kc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))
    vc = pack_codes(jnp.asarray(rng.integers(0, C, (bs, nh_k, M, N)), jnp.uint8))

    for variant in ["vg", "vh", "vi", "vj"]:
        @jax.jit
        def step(qq, variant=variant):
            o = run(qq, kc, vc, kpack, kpack, block=block, variant=variant)
            return jnp.roll(qq, 1, axis=-1) + o[0, 0] * 1e-20

        dt = chained_bench(step, q, iters=40)
        print(f"{variant:6s} {dt*1e6:9.1f} us", flush=True)


if __name__ == "__main__":
    main()
