"""Kernel variants timed by XPLANE TRACE (chained_bench under-reports by
overlapping calls — measured 850us chained vs 1404us device).

Variants (flat arena, bs=7 nh=8 N=32768 M=64 C=256, block=8192):
  v0: current production structure (produce->VMEM scratch, consume next step)
  v1: fused per-tile decode+matmul in the same grid step (no scratch)
  v2: like v0 but produce uses ONE take_along_axis per tile (concat indices)
"""
import functools
import glob
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from million_tpu.ops import pq_attention_pallas as P

BS, NH, D, M, C = 7, 8, 128, 64, 256
N = 32768
BLOCK = 8192
NEG_INF = P.NEG_INF

rng = np.random.default_rng(0)
kcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
vcent = jnp.asarray(rng.standard_normal((M, C, 2)), jnp.float32)
kp, vp = P.pack_decode_table(kcent), P.pack_decode_table(vcent)
q = jnp.asarray(rng.standard_normal((BS, NH, P.GROUP_PAD, D)) / D**0.5, jnp.bfloat16)
ncd = jnp.asarray(N - 512, jnp.int32)


@jax.jit
def mkcodes(seed):
    tile = jax.random.bits(jax.random.PRNGKey(seed), (BS, NH, M, 1024), jnp.uint32).astype(jnp.int32)
    return jnp.tile(tile, (1, 1, 1, N // 4096))


KC, VC = mkcodes(1), mkcodes(2)


# ---------------------------------------------------------------------------
# v1: fused per-tile decode + matmul (no produce/consume split)
# ---------------------------------------------------------------------------

def _kernel_v1(nc_ref, q_ref, ss_ref, kc_ref, vc_ref, kt_ref, vt_ref, vo_ref,
               out_ref, lse_ref, acc_ref, m_ref, l_ref, *, block, tw, interpret):
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[0, 0]
    G = q_ref.shape[2]
    q8 = q_ref[0, 0]
    ss = ss_ref[0, 0][:, :1]
    vo = vo_ref[:]
    kt, vt = kt_ref[:], vt_ref[:]
    slots = P._slot_positions(block, tw)
    LOG127 = float(np.log(127.0))
    n_tiles = block // (4 * tw)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i * block < n_codes)
    def _():
        kw, vw = kc_ref[0, 0], vc_ref[0, 0]
        # scores per tile, concatenated
        s_parts = []
        vdec = []
        for t in range(n_tiles):
            wsl = slice(t * tw, (t + 1) * tw)
            kws, vws = kw[:, wsl], vw[:, wsl]
            kd = jnp.concatenate(
                [P._decode_words(kt, kws, b, interpret) for b in range(4)], axis=1
            )  # (M, 4tw) i32
            k8 = P._expand_i8(kd, interpret)  # (4M, 4tw) i8
            s_parts.append(
                jax.lax.dot_general(
                    q8, k8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ss
            )
            vd = jnp.concatenate(
                [P._decode_words(vt, vws, b, interpret) for b in range(4)], axis=1
            )
            vdec.append(P._expand_i8(vd, interpret))  # (4M, 4tw) i8
        s = jnp.concatenate(s_parts, axis=1)  # (G, block)
        pos = i * block + slots
        full = (i + 1) * block <= n_codes
        s = jnp.where(jnp.logical_or(full, pos < n_codes), s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        x = jnp.exp(s - (m_new - LOG127))
        l_new = l_ref[:, :1] * alpha + jnp.sum(x, axis=1, keepdims=True) * (1.0 / 127.0)
        ph_f = jnp.round(x)
        pl_f = jnp.round((x - ph_f) * 128.0)
        p2 = jnp.concatenate([ph_f.astype(jnp.int8), pl_f.astype(jnp.int8)], axis=0)
        v8 = jnp.concatenate(vdec, axis=1)  # (4M, block) i8
        dd = jax.lax.dot_general(
            p2, v8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        pv = (dd[:G].astype(jnp.float32) + dd[G:].astype(jnp.float32) * (1.0 / 128.0)) * vo
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_new

    @pl.when(i == nb - 1)
    def _():
        P._finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)


# v2: current split pipeline but single-gather produce
def _decode_tile_onegather(tab, w, interpret):
    """(M, tw) words -> (M, 4tw) i32 decoded, one gather."""
    idx = jnp.concatenate([w >> (8 * b + 1) for b in range(4)], axis=1)  # (M, 4tw)
    if interpret:
        idx = idx & 127
    g = jnp.take_along_axis(tab, idx, axis=1)
    par = jnp.concatenate([(w << (31 - 8 * b)) < 0 for b in range(4)], axis=1)
    return jnp.where(par, g >> 16, g)


def _kernel_v2(nc_ref, q_ref, ss_ref, kc_ref, vc_ref, kt_ref, vt_ref, vo_ref,
               out_ref, lse_ref, acc_ref, m_ref, l_ref, kh_ref, vh_ref,
               *, block, tw, interpret):
    i = pl.program_id(2)
    nb = pl.num_programs(2) - 1
    n_codes = nc_ref[0, 0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    consume = P._make_consume(
        block, tw, q_ref[0, 0], ss_ref[0, 0][:, :1], vo_ref[:],
        kh_ref, vh_ref, acc_ref, m_ref, l_ref, n_codes, interpret,
    )
    n_tiles = block // (4 * tw)
    kt, vt = kt_ref[:], vt_ref[:]

    def produce(kw, vw):
        for t in range(n_tiles):
            wsl = slice(t * tw, (t + 1) * tw)
            osl = slice(t * 4 * tw, (t + 1) * 4 * tw)
            kh_ref[0, :, osl] = _decode_tile_onegather(kt, kw[:, wsl], interpret)
            vh_ref[0, :, osl] = _decode_tile_onegather(vt, vw[:, wsl], interpret)

    @pl.when(jnp.logical_and(i > 0, (i - 1) * block < n_codes))
    def _():
        consume(0, i - 1)

    @pl.when(jnp.logical_and(i < nb, i * block < n_codes))
    def _():
        produce(kc_ref[0, 0], vc_ref[0, 0])

    @pl.when(i == nb)
    def _():
        P._finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)




def _kernel_v3(nc_ref, q_ref, ss_ref, kc_ref, vc_ref, kt_ref, vt_ref, vo_ref,
               out_ref, lse_ref, acc_ref, m_ref, l_ref, *, block, tw, interpret):
    """v1 but PV accumulates per tile (no (4M, block) concat)."""
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    n_codes = nc_ref[0, 0]
    G = q_ref.shape[2]
    q8 = q_ref[0, 0]
    ss = ss_ref[0, 0][:, :1]
    vo = vo_ref[:]
    kt, vt = kt_ref[:], vt_ref[:]
    slots = P._slot_positions(block, tw)
    LOG127 = float(np.log(127.0))
    n_tiles = block // (4 * tw)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i * block < n_codes)
    def _():
        kw, vw = kc_ref[0, 0], vc_ref[0, 0]
        s_parts = []
        for t in range(n_tiles):
            wsl = slice(t * tw, (t + 1) * tw)
            kd = jnp.concatenate(
                [P._decode_words(kt, kw[:, wsl], b, interpret) for b in range(4)], axis=1
            )
            k8 = P._expand_i8(kd, interpret)
            s_parts.append(
                jax.lax.dot_general(
                    q8, k8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ss
            )
        s = jnp.concatenate(s_parts, axis=1)
        pos = i * block + slots
        full = (i + 1) * block <= n_codes
        s = jnp.where(jnp.logical_or(full, pos < n_codes), s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        x = jnp.exp(s - (m_new - LOG127))
        l_new = l_ref[:, :1] * alpha + jnp.sum(x, axis=1, keepdims=True) * (1.0 / 127.0)
        ph_f = jnp.round(x)
        pl_f = jnp.round((x - ph_f) * 128.0)
        p2 = jnp.concatenate([ph_f.astype(jnp.int8), pl_f.astype(jnp.int8)], axis=0)
        dd = jnp.zeros((2 * G, 4 * kt.shape[0]), jnp.int32)
        for t in range(n_tiles):
            wsl = slice(t * tw, (t + 1) * tw)
            tsl = slice(t * 4 * tw, (t + 1) * 4 * tw)
            vd = jnp.concatenate(
                [P._decode_words(vt, vw[:, wsl], b, interpret) for b in range(4)], axis=1
            )
            v8 = P._expand_i8(vd, interpret)
            dd = dd + jax.lax.dot_general(
                p2[:, tsl], v8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        pv = (dd[:G].astype(jnp.float32) + dd[G:].astype(jnp.float32) * (1.0 / 128.0)) * vo
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_new

    @pl.when(i == nb - 1)
    def _():
        P._finish(out_ref, lse_ref, acc_ref, m_ref, l_ref)

def run_variant(name, kernel_fn, scratch, pipelined, block=BLOCK):
    tw = P.LANES
    q8, ss_b, vo, select_idx = P._prep_call(q, kp, vp)
    bw = block // P.WORD
    R = 4 * M
    G = P.GROUP_PAD
    NW = N // P.WORD
    nb_data = NW // bw
    grid = (BS, NH, nb_data + (1 if pipelined else 0))
    kernel = functools.partial(kernel_fn, block=block, tw=tw, interpret=False)
    nc = ncd.reshape(1, 1)
    scratch_shapes = [
        pltpu.VMEM((G, R), jnp.float32),
        pltpu.VMEM((G, P.LANES), jnp.float32),
        pltpu.VMEM((G, P.LANES), jnp.float32),
    ]
    if scratch:
        scratch_shapes += [
            pltpu.VMEM((1, M, block), jnp.int32),
            pltpu.VMEM((1, M, block), jnp.int32),
        ]
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, G, R), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, G, P.LANES), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, M, bw), lambda b, h, i: (b, h, 0, jnp.minimum(i, nb_data - 1) if pipelined else i)),
                pl.BlockSpec((1, 1, M, bw), lambda b, h, i: (b, h, 0, jnp.minimum(i, nb_data - 1) if pipelined else i)),
                pl.BlockSpec((M, P.LANES), lambda b, h, i: (0, 0)),
                pl.BlockSpec((M, P.LANES), lambda b, h, i: (0, 0)),
                pl.BlockSpec((G, R), lambda b, h, i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, G, R), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, G, P.LANES), lambda b, h, i: (b, h, 0, 0)),
            ],
            scratch_shapes=scratch_shapes,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BS, NH, G, R), jnp.float32),
            jax.ShapeDtypeStruct((BS, NH, G, P.LANES), jnp.float32),
        ],
    )

    @jax.jit
    def step(qq, kc, vc):
        q8_, ss_, vo_, _ = P._prep_call(qq, kp, vp)
        o, lse = f(nc, q8_, ss_, kc, vc, kp.tab, vp.tab, vo_)
        return jnp.roll(qq, 1, -1) + (o[0, 0, 0, 0] * 1e-20).astype(qq.dtype)

    x = q
    for _ in range(3):
        x = step(x, KC, VC)
    x.block_until_ready()
    shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace"):
        for _ in range(20):
            x = step(x, KC, VC)
        x.block_until_ready()
    # parse
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    fpb = sorted(glob.glob("/tmp/jaxtrace/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fpb, "rb").read())
    tot = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = md[ev.metadata_id].name
                if "pallas" in nm or "custom" in nm.lower() or "wrapped" in nm:
                    tot[nm] += ev.duration_ps / 1e6
    us = sum(tot.values()) / 20
    print(f"{name}: {us:8.1f} us/call (trace)", flush=True)
    return us


# sanity parity vs production wrapper on small n first
def parity(kernel_fn, scratch, pipelined, name):
    out_ref, lse_ref = P.pq_codes_attention(q, KC, VC, kp, vp, ncd, block=BLOCK)
    # variant output: rebuild wrapper quickly at same shape and compare raw
    # (skip — variants reuse production helpers; rely on trace timing only)
    pass


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "v0"):
    run_variant("v0 split+scratch  ", P._pq_attn_kernel, True, True)
if which in ("all", "v1"):
    run_variant("v1 fused per-tile ", _kernel_v1, False, False)
if which == "v3":
    for blk in (8192, 16384):
        run_variant(f"v3 tilePV b={blk:5d}", _kernel_v3, False, False, block=blk)
if which == "v1sweep":
    for blk in (4096, 8192, 16384, 32768):
        try:
            run_variant(f"v1 block={blk:5d}   ", _kernel_v1, False, False, block=blk)
        except Exception as e:
            print(f"v1 block={blk}: FAIL {str(e)[:100]}", flush=True)
if which in ("all", "v2"):
    run_variant("v2 one-gather prod", _kernel_v2, True, True)
