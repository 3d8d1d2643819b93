"""Long-context decode benchmark: PQ 4-bit KV at contexts dense bf16 cannot
hold on one chip.

At 128K tokens a llama-3.2-3b-class dense bf16 KV cache is 14.7 GB — it
does not fit a 16 GB v5e beside 6.4 GB of weights. The 4-bit PQ arena is
3.7 GB, so 128K decodes on ONE chip (the reference's long-context claim,
README.md:15-16, extended 4x past its 32K headline). Reports steady-state
TPOT over the chosen context.

Run:  python -m million_tpu.benchmarks.long_context_bench [--ctx 131072]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=131072)
    ap.add_argument("--preset", default="llama-3.2-3b")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--ttft-only", action="store_true",
                    help="skip the decode-TPOT phase (run TTFT in its own "
                    "process: the decode bench's arena lingers in the "
                    "allocator and the two phases together exceed HBM at "
                    "128K)")
    ap.add_argument("--ttft-hist-block", type=int, default=2048,
                    help="history block for the chunked-prefill TTFT pass "
                    "(the (nh, chunk, hist) f32 score transient must fit "
                    "beside the 128K arena)")
    ap.add_argument("--ttft-chunk", type=int, default=0,
                    help="also measure TTFT via chunked prefill with this "
                    "chunk size (0 = skip; one-shot prefill at 128K would "
                    "blow activation memory)")
    ap.add_argument("--geometry", default="dm2",
                    choices=["dm2", "dm4_outlier", "dm4_outlier_c128"],
                    help="dm2: production M=d/2 symmetric; dm4_outlier: "
                    "coarse d_m=4 both sides + 16 exact outlier channels "
                    "per side on the 128K flat path (round 5: chunked "
                    "prefill carries the outlier arenas — VERDICT r4 "
                    "item 5); dm4_outlier_c128: same with C=128 direct "
                    "tables (the r5 headline geometry)")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.models.llama import (
        PRESETS,
        build_tables,
        decode_step,
        init_params,
    )
    from million_tpu.utils.timing import chained_bench

    CTX, bs = args.ctx, args.bs
    cfg = PRESETS[args.preset]
    rng = np.random.default_rng(0)
    L, d = cfg.num_layers, cfg.head_dim
    C = 128 if args.geometry == "dm4_outlier_c128" else 256
    OK = OV = 0
    if args.geometry.startswith("dm4_outlier"):
        M = d // 4
        OK = OV = 16
        ck = rng.standard_normal((L, M, C, 4)).astype(np.float32)
        cv = rng.standard_normal((L, M, C, 4)).astype(np.float32)
        koidx = np.sort(rng.choice(d, OK, replace=False)).astype(np.int32)
        voidx = np.sort(rng.choice(d, OV, replace=False)).astype(np.int32)
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
    params = init_params(cfg, jax.random.PRNGKey(0))
    code_bytes = 2 * L * bs * cfg.num_kv_heads * M * CTX
    dense_bytes = 2 * L * bs * cfg.num_kv_heads * CTX * cfg.head_dim * 2
    log(
        f"ctx={CTX}: PQ arena {code_bytes/1e9:.2f} GB vs dense bf16 KV "
        f"{dense_bytes/1e9:.2f} GB (weights "
        f"{sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))/1e9:.2f} GB)"
    )

    code_shape = (L, bs, cfg.num_kv_heads, M, CTX // 4)

    import math

    # tile width must DIVIDE the arena width or the arena comes out short
    # while n_codes still claims CTX tokens — silently benchmarking a
    # smaller context
    tile_w = math.gcd(CTX // 4, 1024)

    @jax.jit
    def make_codes(seed):
        tile = jax.random.bits(
            jax.random.PRNGKey(seed), (*code_shape[:-1], tile_w), jnp.uint32
        ).astype(jnp.int32)
        out = jnp.tile(
            tile, (1,) * (len(code_shape) - 1) + (CTX // 4 // tile_w,)
        )
        assert out.shape == code_shape, (out.shape, code_shape)
        return out

    def make_state():
        cache = init_state(pq_cfg, L)
        cache = dict(cache)
        cache["key_codes"] = make_codes(1)
        cache["value_codes"] = make_codes(2)
        cache["n_codes"] = jnp.full((L,), CTX - 512, jnp.int32)
        return (jnp.zeros((bs,), jnp.int32), cache)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tables, state):
        tok, cache = state
        logits, cache = decode_step(
            params, cfg, tok, jnp.asarray(CTX - 500, jnp.int32), cache, tables,
            mode="pq_pallas",
        )
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

    if args.ttft_only:
        dt = float("nan")
    else:
        dt = chained_bench(lambda st: step(params, tables, st), make_state, iters=args.iters)
        log(f"TPOT {dt*1e3:.2f} ms at ctx={CTX} bs={bs}")

    ttft = None
    if args.ttft_chunk:
        import time

        from million_tpu.models.chunked_prefill import chunked_prefill

        ids = jnp.asarray(
            np.random.default_rng(1).integers(0, cfg.vocab_size, (bs, CTX - 512)),
            jnp.int32,
        )
        # warmup: compile every per-chunk graph on a throwaway cache so the
        # reported number is prefill compute, not XLA compile time.
        # `tables` (not raw cents) so the history partial runs the Pallas
        # chunk kernel (round 4 — build_tables provides kpack/vpack)
        logits, _ = chunked_prefill(
            params, cfg, ids, init_state(pq_cfg, L), tables,
            chunk=args.ttft_chunk, hist_block=args.ttft_hist_block,
        )
        np.asarray(logits[0, :4])
        t0 = time.perf_counter()
        logits, _ = chunked_prefill(
            params, cfg, ids, init_state(pq_cfg, L), tables,
            chunk=args.ttft_chunk, hist_block=args.ttft_hist_block,
        )
        np.asarray(logits[0, :4])  # force through any async tunnel
        ttft = time.perf_counter() - t0
        log(f"chunked-prefill TTFT {ttft:.2f} s (chunk={args.ttft_chunk}, warmed)")
    print(
        json.dumps(
            {
                "metric": f"decode TPOT, {args.preset} @ {CTX} ctx, PQ 4-bit KV, "
                f"single chip (dense bf16 KV would need {dense_bytes/1e9:.1f} GB)",
                "value": round(dt * 1e3, 2),
                "unit": "ms/token",
                "tokens_per_s": round(bs / dt, 2),
                "geometry": args.geometry,
                **({"ttft_s": round(ttft, 2)} if ttft is not None else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
