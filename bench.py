"""Headline benchmark: decode tokens/s/chip at 32K context, PQ vs fp16-KV.

Protocol (north star in BASELINE.json; reference numbers BASELINE.md): a
Llama-3.2-3B-class model (random bf16 weights — the reference's _synthetic
protocol, main_pq.py:252-260) decoding with a 32K-token context on one
chip. Each method runs at the largest batch that fits the chip's HBM
alongside the weights: the 4x KV compression is precisely what lets PQ
serve a larger batch, which is where the tokens/s/chip win comes from —
same logic as the reference's memory-reduction claim, measured as
throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = PQ tokens/s / dense-KV tokens/s on the same chip.
"""

from __future__ import annotations

import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


CTX = 32768
HBM_BUDGET = 13.5e9  # bytes usable for weights+cache on a 16 GB chip
FLUSH_CHUNK = 16  # sub-window flush size (VERDICT r3 item 6): flush the
# oldest 16 tokens when the window fills instead of all 128 — the flush
# spike (dominated by the (rows, M, C) distance transient of the encode)
# shrinks ~8x at the same amortized cost, and the exact-recent window
# never drops below Lt-16 (llama.flush_windows)
REPEATS = 5  # median-of-N within one run (VERDICT r3 weak #7: the
# session-to-session tunnel variance is ~25%; the in-run median + p10/p90
# make the headline defensible against it)
FLUSH_STATS = {}  # filled by measure_pq: p50 vs flush-step latency
DENSE_STATS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_model():
    from million_tpu.models.llama import PRESETS, init_params

    cfg = PRESETS["llama-3.2-3b"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    n_param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    log(f"model: llama-3.2-3b-class, {n_param_bytes/1e9:.2f} GB weights")
    return cfg, params, n_param_bytes


def pq_bytes_per_seq(cfg, M=64):
    codes = 2 * cfg.num_layers * cfg.num_kv_heads * M * CTX
    resid = 2 * cfg.num_layers * cfg.num_kv_heads * 128 * cfg.head_dim * 2
    return codes + resid


def dense_bytes_per_seq(cfg):
    return 2 * cfg.num_layers * cfg.num_kv_heads * CTX * cfg.head_dim * 2


def measure_pq(cfg, params, bs, iters, geometry="dm2"):
    """geometry: "dm2" (production M=d/2 symmetric codes), "dm4_outlier"
    (coarse d_m=4 both sides + 16 exact bf16 outlier channels per side —
    IDENTICAL 128 B/token, i.e. the same 4-bit effective point, but half
    the kernel's gather volume; ladder-gated at Δppl +0.34% rel), or
    "dm4_outlier_c128" (same but C=128 DIRECT decode tables — nbits=7,
    single-plane gathers, the exp_tpot_outlier bs=1 winner's layout;
    ladder-gated at Δppl +0.57% rel)."""
    import functools

    from million_tpu.models.llama import build_tables, decode_step
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.utils.timing import chained_bench, chained_bench_stats

    d = cfg.head_dim
    C = 128 if geometry == "dm4_outlier_c128" else 256
    rng = np.random.default_rng(0)
    L = cfg.num_layers
    OK = OV = 16 if geometry.startswith("dm4_outlier") else 0
    if geometry.startswith("dm4_outlier"):
        M = d // 4
        ck = rng.standard_normal((L, M, C, 4)).astype(np.float32)
        cv = rng.standard_normal((L, M, C, 4)).astype(np.float32)
        koidx = np.sort(rng.choice(d, OK, replace=False)).astype(np.int32)
        voidx = np.sort(rng.choice(d, OV, replace=False)).astype(np.int32)
        # channels zeroed before codebook training have exactly-zero
        # centroid components (strided layout: channel c -> subspace
        # c % M, component c // M)
        for c in koidx:
            ck[:, c % M, :, c // M] = 0.0
        for c in voidx:
            cv[:, c % M, :, c // M] = 0.0
        cents = {
            "key": jnp.asarray(ck), "value": jnp.asarray(cv),
            "k_outlier_idx": jnp.asarray(np.stack([koidx] * L)),
            "v_outlier_idx": jnp.asarray(np.stack([voidx] * L)),
        }
    else:
        M = d // 2
        cents = {
            "key": jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32),
            "value": jnp.asarray(rng.standard_normal((L, M, C, 2)), jnp.float32),
        }
    tables = build_tables(cents)
    pq_cfg = PQCacheConfig(
        bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, M=M, C=C, Lt=128,
        N_max=CTX, OK=OK, OV=OV,
    )

    code_shape = (L, bs, cfg.num_kv_heads, M, CTX // 4)  # packed int32 words

    @jax.jit
    def _codes_tile(seed):
        return jax.random.bits(
            jax.random.PRNGKey(seed), (*code_shape[:-1], 1024), jnp.uint32
        ).astype(jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _codes_write(arena, tile, j):
        return jax.lax.dynamic_update_slice(
            arena, tile, (0, 0, 0, 0, j * 1024)
        )

    def make_codes(seed):
        # random code words written into a zeros arena through the SAME
        # dus-writer pattern production uses (prefill/flush) — arenas now
        # take production's exact construction path. (Note: this did NOT
        # change flush_device_ms — 14.19 ms under tile-built and
        # dus-built arenas alike — so the flush cost is intrinsic to the
        # program at this arena-fill regime, not an arena-layout
        # artifact; see docs/PERF.md.) Donation keeps the build at 1x
        # memory; kernel cost is data-independent.
        arena = jnp.zeros(code_shape, jnp.int32)
        tile = _codes_tile(seed)
        for j in range(CTX // 4096):
            arena = _codes_write(arena, tile, j)
        return arena

    def make_state():
        cache = {
            "key_codes": make_codes(1),
            "value_codes": make_codes(2),
            "key_residual": jnp.zeros(
                (L, bs, cfg.num_kv_heads, pq_cfg.Lt, cfg.head_dim), jnp.bfloat16
            ),
            "value_residual": jnp.zeros(
                (L, bs, cfg.num_kv_heads, pq_cfg.Lt, cfg.head_dim), jnp.bfloat16
            ),
            "n_codes": jnp.full((L,), CTX - 512, jnp.int32),
            "r": jnp.zeros((L,), jnp.int32),
        }
        if OK:
            cache["key_outliers"] = jax.random.normal(
                jax.random.PRNGKey(3),
                (L, bs, cfg.num_kv_heads, 4, OK, CTX // 4), jnp.bfloat16,
            )
        if OV:
            cache["value_outliers"] = jax.random.normal(
                jax.random.PRNGKey(4),
                (L, bs, cfg.num_kv_heads, 4, OV, CTX // 4), jnp.bfloat16,
            )
        tok = jnp.zeros((bs,), jnp.int32)
        return (tok, cache)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tables, state):
        tok, cache = state
        logits, cache = decode_step(
            params, cfg, tok, jnp.asarray(CTX - 500, jnp.int32), cache, tables,
            mode="pq_pallas",
        )
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

    from million_tpu.models.llama import flush_windows

    def flush_cycle(st):
        # ONE production flush cycle: a sub-window flush followed by
        # FLUSH_CHUNK decode steps — the cadence generate actually runs.
        # Timing the flush as a lone 3-program composition is
        # host-dispatch-bound on this tunneled runtime (every device-side
        # change to the flush moved the number by ~0, while the profiler
        # showed ~2-4 ms of real flush device work); amortizing it inside
        # a device-bound chain hides the host exactly as production does.
        tok, cache = st
        cache = flush_windows(cache, tables, n=FLUSH_CHUNK)
        st = (tok, cache)
        for _ in range(FLUSH_CHUNK):
            st = step(params, tables, st)
        return st

    stats = chained_bench_stats(
        lambda st: step(params, tables, st), make_state, iters=iters,
        repeats=REPEATS,
    )
    dt = stats["p50"]
    # One step in FLUSH_CHUNK carries a sub-window residual flush (batch
    # encode of the oldest FLUSH_CHUNK rows + slab write + roll); amortize its
    # extra cost into the reported TPOT so the number is a true
    # steady-state decode average. The flush step is also the worst-case
    # (tail) per-token latency, so flush/p50 is the serving jitter ratio.
    Lt = FLUSH_CHUNK
    cyc = chained_bench_stats(flush_cycle, make_state, iters=4, repeats=3)
    dt_cycle = cyc["p50"] / FLUSH_CHUNK
    # latency of the step that carries the flush (the tail a serving
    # client sees), reconstructed from the amortized cycle cost. The
    # reconstruction multiplies per-step noise by FLUSH_CHUNK, so ALSO
    # measure the flush program's device time directly from the hardware
    # profile (trace_op_breakdown) — that is the tail a pipelined/async
    # client actually experiences (~2 ms at F=16, i.e. ~1.05x p50).
    dt_flush = dt + max(dt_cycle - dt, 0.0) * FLUSH_CHUNK
    flush_dev_ms = None
    try:
        from million_tpu.utils.profiling import trace_op_breakdown

        st_p = make_state()
        st_p = (st_p[0], flush_windows(st_p[1], tables, n=FLUSH_CHUNK))
        # drain EVERYTHING in flight before tracing: the async chain from
        # the cycle bench otherwise leaks its ops into the profile window
        jax.block_until_ready(st_p[1]["n_codes"])

        def _prof():
            s = st_p[1]
            for _ in range(4):
                s = flush_windows(s, tables, n=FLUSH_CHUNK)
            return s

        br = trace_op_breakdown(_prof)
        vals = [v for v in br.values() if isinstance(v, float)]
        if vals:
            flush_dev_ms = round(sum(vals) / 4, 3)
        del st_p
    except Exception:  # noqa: BLE001 — profiling is best-effort
        pass
    log(f"flush step: {dt_flush*1e3:.2f} ms (amortized /{Lt} sub-window; "
        f"tail ratio flush/p50 = {dt_flush/dt:.2f}x)")
    global FLUSH_STATS
    FLUSH_STATS = {"p50_ms": round(dt * 1e3, 3),
                   "p10_ms": round(stats["p10"] * 1e3, 3),
                   "p90_ms": round(stats["p90"] * 1e3, 3),
                   "flush_step_ms": round(dt_flush * 1e3, 3),
                   "flush_over_p50": round(dt_flush / dt, 3)}
    if flush_dev_ms is not None:
        # device-side flush cost from the hardware profile: the tail an
        # async/pipelined serving client sees is p50 + this
        FLUSH_STATS["flush_device_ms"] = flush_dev_ms
        FLUSH_STATS["flush_over_p50_device"] = round(
            (dt * 1e3 + flush_dev_ms) / (dt * 1e3), 3
        )
    return dt + max(dt_flush - dt, 0.0) / Lt


def measure_dense(cfg, params, bs, iters):
    from million_tpu.models.llama import decode_step
    from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state
    from million_tpu.utils.timing import chained_bench_stats

    dcfg = DenseCacheConfig(
        bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=CTX, dtype=jnp.bfloat16
    )
    L = cfg.num_layers

    def make_state():
        cache = init_dense_state(dcfg, L)
        cache = dict(cache)
        cache["k"] = jax.random.normal(jax.random.PRNGKey(1), cache["k"].shape, jnp.bfloat16)
        cache["v"] = jax.random.normal(jax.random.PRNGKey(2), cache["v"].shape, jnp.bfloat16)
        cache["length"] = jnp.full_like(cache["length"], CTX - 512)
        tok = jnp.zeros((bs,), jnp.int32)
        return (tok, cache)

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, state):
        tok, cache = state
        logits, cache = decode_step(
            params, cfg, tok, jnp.asarray(CTX - 500, jnp.int32), cache, None,
            mode="dense",
        )
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

    stats = chained_bench_stats(
        lambda st: step(params, st), make_state, iters=iters, repeats=REPEATS,
    )
    global DENSE_STATS
    DENSE_STATS = {"dense_p10_ms": round(stats["p10"] * 1e3, 3),
                   "dense_p90_ms": round(stats["p90"] * 1e3, 3)}
    return stats["p50"]


def _device_watchdog(timeout_s: float = 180.0):
    """Fail fast (exit 3) if the accelerator runtime never answers — a dead
    remote-TPU tunnel otherwise hangs the first dispatch forever."""
    import threading

    done = threading.Event()
    err: list = []

    def probe():
        try:
            jnp.ones(8).sum().block_until_ready()
        except Exception as e:  # noqa: BLE001 — report any init failure
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    done.wait(timeout_s)
    if err:
        log(f"device probe failed: {err[0]!r} — aborting bench")
        sys.exit(3)
    if not done.is_set():
        log(f"device unreachable after {timeout_s:.0f}s — aborting bench")
        sys.exit(3)


def main():
    # persistent compile cache: the 3B decode graphs are slow to compile on
    # remote-compile setups; cache them across invocations.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    _device_watchdog()
    iters = 16
    cfg, params, w_bytes = build_model()

    budget = HBM_BUDGET - w_bytes
    bs_pq = max(1, int(budget // pq_bytes_per_seq(cfg)))
    bs_dense = max(1, int(budget // dense_bytes_per_seq(cfg)))
    bs_pq = min(bs_pq, 8)
    bs_dense = min(bs_dense, 8)
    log(f"batch: pq={bs_pq} ({pq_bytes_per_seq(cfg)/1e9:.2f} GB/seq), "
        f"dense={bs_dense} ({dense_bytes_per_seq(cfg)/1e9:.2f} GB/seq)")

    def with_oom_fallback(fn, bs):
        import gc

        while bs >= 1:
            try:
                return fn(cfg, params, bs, iters), bs
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if (
                    "RESOURCE_EXHAUSTED" in msg
                    or "Out of memory" in msg
                    or "remote_compile" in msg  # flaky compile services choke
                    or "HTTP 500" in msg  # on the largest-batch graphs
                ):
                    log(f"OOM/compile failure at bs={bs}, stepping down")
                    bs -= 1
                    gc.collect()  # release the failed attempt's buffers
                    continue
                raise
        raise RuntimeError("could not fit bs=1")

    dt_dense, bs_dense = with_oom_fallback(measure_dense, bs_dense)
    dense_tps = bs_dense / dt_dense
    log(f"dense: bs={bs_dense} tpot={dt_dense*1e3:.2f} ms -> {dense_tps:.1f} tok/s")

    # both 4-bit geometries at the SAME 128 B/token (so the same batch):
    # production dm2 and the outlier-rescued coarse dm4 (round 3's bs=1
    # winner; round 5 promotes it to the headline candidate — identical
    # memory, half the gather volume, Δppl +0.92% rel per the ladder)
    results = {}
    for geom in ("dm2", "dm4_outlier", "dm4_outlier_c128"):
        fn = lambda c, p, b, i, _g=geom: measure_pq(c, p, b, i, geometry=_g)
        dt_g, bs_g = with_oom_fallback(fn, bs_pq)
        results[geom] = {
            "tps": bs_g / dt_g, "bs": bs_g, "tpot": dt_g,
            "flush": dict(FLUSH_STATS),
        }
        log(f"pq[{geom}]: bs={bs_g} tpot={dt_g*1e3:.2f} ms -> "
            f"{bs_g/dt_g:.1f} tok/s")
    best = max(results, key=lambda g: results[g]["tps"])
    pq_tps = results[best]["tps"]

    print(
        json.dumps(
            {
                "metric": "decode tokens/s/chip, llama-3.2-3b-class @32K ctx (PQ 4-bit KV, max-batch-per-HBM vs bf16 KV)",
                "value": round(pq_tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(pq_tps / dense_tps, 3),
                "geometry": best,
                **{f"{g}_tokens_per_s": round(r["tps"], 2)
                   for g, r in results.items()},
                **results[best]["flush"],
                **DENSE_STATS,
            }
        )
    )


if __name__ == "__main__":
    main()
