"""Llama-family model, TPU-native: pure-functional params pytree + lax.scan
over layers, with the KV cache (PQ or dense) as explicit carried state.

Replaces the reference's HF monkey-patching integration
(scripts/modeldb/models/modeling_llama.py): where the reference swaps
LlamaSdpaAttention.forward at runtime via Injector contexts, here the
attention implementation is a static argument of the jitted step — XLA
specializes each (mode, shape) combination, which is the idiomatic analogue
of the reference's per-stage patched forwards:

  attn "dense"          ~ baseline_forward        (modeling_llama.py:345-453)
  attn "pq"             ~ attn_forward_custom_kernel (modeling_llama.py:455-554)
  distort_recent prefill ~ the ppl-mode quantized prefill (pq_utils.py:243-247)

Weight layout: every per-layer weight is stacked on a leading (L, ...) axis
so one lax.scan runs all layers (fast compiles, mesh-shardable on the L-free
dims). GQA supported via num_kv_heads < num_heads. RoPE includes the
llama-3 frequency rescaling.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from million_tpu.cache.pq_cache import (
    PQCacheLayerState,
    stacked_prefix_write,
    store_codes_t,
)
from million_tpu.cache.dense_cache import dense_prefill_update
from million_tpu.ops.pq_attention_ref import (
    causal_attention,
    dense_decode_attention,
    masked_partial_attention,
    merge_partials,
    merge_two_partials,
    pq_decode_attention_ref,
)
from million_tpu.ops.pq_attention_pallas import (
    GROUP_PAD,
    check_group,
    WORD,
    pack_codes,
    pack_decode_table,
    pq_codes_attention,
)
from million_tpu.pq.ops import (
    RUNTIME_ENCODE_PRECISION,
    pq_decode,
    pq_encode,
    runtime_encode,
)

SUBSPACE_LAYOUT = "strided"  # see pq.ops.subspace_view — the TPU-native split


def _rotate(x: jax.Array, R: jax.Array) -> jax.Array:
    """Apply an OPQ rotation on the head-dim axis: (..., d) @ R (d, d)."""
    return jnp.einsum("...d,de->...e", x.astype(jnp.float32), R).astype(x.dtype)


def direct_flags(cents):
    """Per-side direct-table flags from cents shapes (works for stacked
    (L, M, C, d_m) and per-layer (M, C, d_m): C is always axis -2). Static
    at trace time. SINGLE source of truth — a call site re-deriving only
    one side's flag once decoded V tables with the wrong layout."""
    return cents["key"].shape[-2] <= 128, cents["value"].shape[-2] <= 128


def build_tables(cents):
    """Precompute per-layer Pallas decode tables from stacked centroids.

    cents {"key": (L, M, C, d_m), "value": ...} ->
    {"key": ..., "value": ..., "kpack": (L, d=M*d_m, 128), "vpack": ...}
    """
    if cents["key"].shape[-2] > 256 or cents["value"].shape[-2] > 256:
        # wide codebooks (nbits > 8): no kernel format — decode_step
        # auto-demotes to the jnp path, which reads raw cents only
        return dict(cents)
    d_k, d_v = direct_flags(cents)
    return {
        **cents,
        "kpack": jax.vmap(lambda c: pack_decode_table(c, direct=d_k))(cents["key"]),
        "vpack": jax.vmap(lambda c: pack_decode_table(c, direct=d_v))(cents["value"]),
    }

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    tie_word_embeddings: bool = False
    rope_scaling: Optional[str] = None  # None | "llama3" | "yarn"
    rope_scaling_factor: float = 8.0
    rope_low_freq_factor: float = 1.0  # llama3 scaling
    rope_high_freq_factor: float = 4.0  # llama3 scaling
    rope_original_max_position: int = 8192
    rope_beta_fast: float = 32.0  # yarn scaling (paper defaults)
    rope_beta_slow: float = 1.0
    rope_attention_factor: Optional[float] = None  # yarn; None -> mscale(factor)
    attn_bias: bool = False  # q/k/v projection biases (qwen2 family)
    dtype: Any = jnp.bfloat16


# Model-family presets mirroring the reference's configs/ JSONs
# (configs/llama-2-7b.json, configs/llama-3.1-8b.json, tinyllama).
PRESETS: Dict[str, ModelConfig] = {
    "llama-2-7b": ModelConfig(),
    "llama-3.1-8b": ModelConfig(
        vocab_size=128256,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=32,
        num_heads=32,
        num_kv_heads=8,
        rope_theta=500000.0,
        rope_scaling="llama3",
    ),
    "llama-3.2-3b": ModelConfig(
        vocab_size=128256,
        hidden_size=3072,
        intermediate_size=8192,
        num_layers=28,
        num_heads=24,
        num_kv_heads=8,
        head_dim=128,
        rope_theta=500000.0,
        rope_scaling="llama3",
        rope_scaling_factor=32.0,
        tie_word_embeddings=True,
    ),
    # qwen2 family: llama architecture + q/k/v biases (beyond the
    # reference's llama-only ModelContext registry)
    "qwen2-7b": ModelConfig(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        head_dim=128,
        rope_theta=1000000.0,
        attn_bias=True,
    ),
    # the reference's 128K long-context model (configs/yarn-llama-2-7b.json:
    # NousResearch Yarn-Llama-2-7b-128k — llama-2-7b with YaRN x32)
    "yarn-llama-2-7b-128k": ModelConfig(
        rope_scaling="yarn",
        rope_scaling_factor=32.0,
        rope_original_max_position=4096,
    ),
    "tinyllama-1.1b": ModelConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_layers=22,
        num_heads=32,
        num_kv_heads=4,
        head_dim=64,
    ),
    # tiny config for tests / CI
    "test-tiny": ModelConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        dtype=jnp.float32,
    ),
}


def init_params(cfg: ModelConfig, key: jax.Array) -> Params:
    """Random-init params (the reference's _synthetic mode analogue,
    main_pq.py:252-260: random weights/codebooks for speed benchmarking)."""
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    nh, nk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 10)
    s = lambda *sh: (2.0 / (sh[-2] + sh[-1])) ** 0.5

    def w(k, *sh):
        return (jax.random.normal(k, sh, jnp.float32) * s(*sh)).astype(cfg.dtype)

    params: Params = {
        "embed": w(ks[0], cfg.vocab_size, D),
        "final_norm": jnp.ones((D,), cfg.dtype),
        "layers": {
            "attn_norm": jnp.ones((L, D), cfg.dtype),
            "mlp_norm": jnp.ones((L, D), cfg.dtype),
            # all attention projections are stored TRANSPOSED (out, in) so
            # the contracting dim is minor-most: XLA otherwise inserts a
            # per-layer weight layout copy every decode step (profiled at
            # ~3.3 ms/step for wo + ~1.9 ms/step for wq/wk/wv at 3B).
            "wq": w(ks[1], L, nh * dh, D),
            "wk": w(ks[2], L, nk * dh, D),
            "wv": w(ks[3], L, nk * dh, D),
            "wo": w(ks[4], L, D, nh * dh),
            "w_gate": w(ks[5], L, D, I),
            "w_up": w(ks[6], L, D, I),
            "w_down": w(ks[7], L, I, D),
        },
    }
    if cfg.attn_bias:
        params["layers"]["bq"] = w(ks[9], L, nh * dh)
        params["layers"]["bk"] = w(ks[9], L, nk * dh)
        params["layers"]["bv"] = w(ks[9], L, nk * dh)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(ks[8], D, cfg.vocab_size)
    return params



def _rms_norm(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g


def _rope_freqs(cfg: ModelConfig) -> jax.Array:
    """Inverse frequencies, with llama-3 or YaRN rescaling when configured.

    YaRN (the reference's 128K long-context model, configs/
    yarn-llama-2-7b.json): per-dim blend of extrapolated and
    position-interpolated frequencies over a linear ramp between the
    beta_fast/beta_slow correction dims — matches HF
    _compute_yarn_parameters (validated against transformers in
    tests/test_hf_loader.py)."""
    import math

    dh = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    if cfg.rope_scaling == "yarn":
        def corr_dim(n_rot):
            return (
                dh
                * math.log(cfg.rope_original_max_position / (n_rot * 2 * math.pi))
            ) / (2 * math.log(cfg.rope_theta))

        low = max(math.floor(corr_dim(cfg.rope_beta_fast)), 0)
        high = min(math.ceil(corr_dim(cfg.rope_beta_slow)), dh - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip(
            (jnp.arange(dh // 2, dtype=jnp.float32) - low) / (high - low), 0, 1
        )
        extrap_factor = 1.0 - ramp
        return inv / cfg.rope_scaling_factor * (1 - extrap_factor) + inv * extrap_factor
    if cfg.rope_scaling == "llama3":
        # HF Llama3 rope scaling (transformers modeling_rope_utils).
        low = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        high = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wavelen = 2 * jnp.pi / inv
        smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = (1 - smooth) * inv / cfg.rope_scaling_factor + smooth * inv
        inv = jnp.where(wavelen > low, inv / cfg.rope_scaling_factor, inv)
        inv = jnp.where((wavelen <= low) & (wavelen > high), scaled, inv)
    return inv


def _rope_mscale(cfg: ModelConfig) -> float:
    """YaRN attention factor multiplying cos/sin (HF attention_scaling);
    1.0 for every other rope mode."""
    import math

    if cfg.rope_scaling != "yarn":
        return 1.0
    if cfg.rope_attention_factor is not None:
        return cfg.rope_attention_factor
    f = cfg.rope_scaling_factor
    return 1.0 if f <= 1 else 0.1 * math.log(f) + 1.0


def _apply_rope(
    x: jax.Array, pos: jax.Array, inv_freq: jax.Array, mscale: float = 1.0
) -> jax.Array:
    """x (bs, nh, n, dh), pos (n,) -> rotated x. HF half-split convention;
    mscale is YaRN's attention factor on cos/sin."""
    ang = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (n, dh/2)
    cos = jnp.cos(ang)[None, None] * mscale
    sin = jnp.sin(ang)[None, None] * mscale
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _qkv(x: jax.Array, lp: Params, cfg: ModelConfig, pos: jax.Array):
    """Project + reshape + RoPE. x (bs, n, D) -> q (bs,nh,n,dh), k/v (bs,nk,n,dh)."""
    bs, n, _ = x.shape
    nh, nk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    qf = jnp.einsum("bnd,fd->bnf", x, lp["wq"])
    kf = jnp.einsum("bnd,fd->bnf", x, lp["wk"])
    vf = jnp.einsum("bnd,fd->bnf", x, lp["wv"])
    if "bq" in lp:  # qwen2-family q/k/v biases
        qf = qf + lp["bq"]
        kf = kf + lp["bk"]
        vf = vf + lp["bv"]
    q = qf.reshape(bs, n, nh, dh).transpose(0, 2, 1, 3)
    k = kf.reshape(bs, n, nk, dh).transpose(0, 2, 1, 3)
    v = vf.reshape(bs, n, nk, dh).transpose(0, 2, 1, 3)
    inv_freq = _rope_freqs(cfg)
    ms = _rope_mscale(cfg)
    q = _apply_rope(q, pos, inv_freq, ms)
    k = _apply_rope(k, pos, inv_freq, ms)
    return q, k, v


def _mlp(x: jax.Array, lp: Params) -> jax.Array:
    return (jax.nn.silu(x @ lp["w_gate"]) * (x @ lp["w_up"])) @ lp["w_down"]


def _logits(params: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    # keep the (d, V) head in its storage dtype — casting it to f32 is a
    # GB-scale transient per step; f32 accumulation comes from the matmul.
    return jnp.matmul(
        x.astype(head.dtype), head, preferred_element_type=jnp.float32
    )


def _prefill_causal_attention(q, k, v, mesh):
    """Prefill attention, optionally shard_mapped over (dp, tp): attention
    is embarrassingly parallel across heads and batch, so each device runs
    the (single-chip) flash kernel on its local shard — without this, a
    Pallas custom call under plain SPMD has no partitioning rule and XLA
    would gather the full tensors onto every chip."""
    if mesh is None:
        return causal_attention(q, k, v)
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        causal_attention,
        mesh=mesh,
        in_specs=(P("dp", "tp", None, None),) * 3,
        out_specs=P("dp", "tp", None, None),
        check_vma=False,
    )
    return fn(q, k, v)


@partial(jax.jit, static_argnames=("cfg", "mode", "distort_recent",
                                   "last_logit_only", "return_hidden", "mesh"))
def prefill(
    params: Params,
    cfg: ModelConfig,
    input_ids: jax.Array,  # (bs, n)
    cache: PQCacheLayerState,  # stacked (L, ...) pytree (PQ or dense)
    cents: Optional[Dict[str, jax.Array]] = None,  # {"key": (L,M,C,dm), "value": ...}
    pos_offset: jax.Array | int = 0,
    mode: str = "pq",
    distort_recent: bool = False,
    last_logit_only: bool = False,
    return_hidden: bool = False,
    mesh=None,  # jax.sharding.Mesh -> shard_map attention over (dp, tp)
) -> Tuple[jax.Array, PQCacheLayerState]:
    """Full prefill. Returns (logits (bs, n, V) f32, updated cache);
    with last_logit_only=True, logits are (bs, 1, V) — the full-sequence
    logit tensor is (bs, n, V) f32 = 16.5 GB at 32K prompts x 128K vocab,
    so generation (which only samples from the last position) must not
    materialize it. Perplexity keeps the full tensor (teacher forcing).

    mode "pq": encode k/v into the code arena; attention over exact (or, with
    distort_recent, decode(encode(.)) — the reference ppl protocol,
    perplexity.py:27 + pq_utils.py:243-247) KV.
    mode "dense": baseline fp16-KV path.
    """
    bs, n = input_ids.shape
    x = params["embed"][input_ids]
    pos = pos_offset + jnp.arange(n)

    # The cache is threaded through the scan CARRY with per-layer indexed
    # updates: scanning it as xs/ys would force XLA to copy the whole
    # stacked arena (scan inputs cannot alias scan outputs) — measured at
    # ~27 ms/step for a 3B 32K cache before this change.
    def layer(carry, lp):
        x, cache, i = carry
        h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(h, lp, cfg, pos)
        cache = dict(cache)
        if mode == "pq":
            kcent = jax.lax.dynamic_index_in_dim(cents["key"], i, 0, keepdims=False)
            vcent = jax.lax.dynamic_index_in_dim(cents["value"], i, 0, keepdims=False)
            # OPQ: the CACHE lives in rotated space (codebooks were trained
            # on rotated samples); prefill attention stays in the original
            # space, so only the stored k/v rotate here.
            if "Rk" in cents:
                k_st = _rotate(k, jax.lax.dynamic_index_in_dim(cents["Rk"], i, 0, False))
                v_st = _rotate(v, jax.lax.dynamic_index_in_dim(cents["Rv"], i, 0, False))
            else:
                k_st, v_st = k, v
            # aligned prefix -> word arena; ragged tail -> exact residual
            n4 = (n // WORD) * WORD
            tail = n - n4
            interp = (
                True
                if mesh is not None and mesh.devices.flat[0].platform == "cpu"
                else None
            )
            # outlier-channel split (north-star option): K/V channels listed
            # in cents["k_outlier_idx"]/["v_outlier_idx"] are excluded from
            # PQ and kept in high precision (pq/ops.py header). The codes
            # see them as 0.
            k_enc, v_enc = k_st, v_st
            if "k_outlier_idx" in cents:
                from million_tpu.pq.ops import zero_channels

                koidx = jax.lax.dynamic_index_in_dim(
                    cents["k_outlier_idx"], i, 0, False
                )
                k_enc = zero_channels(k_st, koidx)
            if "v_outlier_idx" in cents:
                from million_tpu.pq.ops import zero_channels

                oidx = jax.lax.dynamic_index_in_dim(
                    cents["v_outlier_idx"], i, 0, False
                )
                v_enc = zero_channels(v_st, oidx)
            kc = jnp.swapaxes(
                runtime_encode(k_enc, kcent, SUBSPACE_LAYOUT, interp), -1, -2
            )
            vc = jnp.swapaxes(
                runtime_encode(v_enc, vcent, SUBSPACE_LAYOUT, interp), -1, -2
            )
            # exact outlier-channel slabs for the aligned prefix (byte-plane
            # arena layout; the residual tail stays fully exact anyway)
            k_out_t = v_out_t = None
            if "k_outlier_idx" in cents:
                from million_tpu.ops.pq_attention_pallas import to_byte_plane

                k_out_t = to_byte_plane(
                    jnp.swapaxes(k_st[:, :, :n4][..., koidx], -1, -2)
                )
            if "v_outlier_idx" in cents:
                from million_tpu.ops.pq_attention_pallas import to_byte_plane

                v_out_t = to_byte_plane(
                    jnp.swapaxes(v_st[:, :, :n4][..., oidx], -1, -2)
                )
            cache = stacked_prefix_write(
                cache, i, kc[..., :n4], vc[..., :n4],
                k_st[:, :, n4:] if tail else None,
                v_st[:, :, n4:] if tail else None,
                k_out_t=k_out_t, v_out_t=v_out_t,
            )
            if distort_recent:
                k = pq_decode(
                    jnp.swapaxes(kc, -1, -2), kcent, SUBSPACE_LAYOUT
                ).astype(k.dtype)
                v = pq_decode(
                    jnp.swapaxes(vc, -1, -2), vcent, SUBSPACE_LAYOUT
                ).astype(v.dtype)
                if "k_outlier_idx" in cents:
                    from million_tpu.pq.ops import restore_channels

                    k = restore_channels(k, k_st, koidx)
                if "v_outlier_idx" in cents:
                    from million_tpu.pq.ops import restore_channels

                    # the stored-exactly outlier channels come back verbatim
                    v = restore_channels(v, v_st, oidx)
                if "Rk" in cents:
                    # reconstruction is in rotated space; the exact prefill
                    # attention below runs in the original space
                    k = _rotate(k, jax.lax.dynamic_index_in_dim(cents["Rk"], i, 0, False).T)
                    v = _rotate(v, jax.lax.dynamic_index_in_dim(cents["Rv"], i, 0, False).T)
            attn = _prefill_causal_attention(q, k, v, mesh)
        else:
            start = cache["length"][i]
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype)[None], (i, 0, 0, start, 0)
            )
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype)[None], (i, 0, 0, start, 0)
            )
            cache["length"] = cache["length"].at[i].add(n)
            attn = _prefill_causal_attention(q, k, v, mesh)
        attn = attn.transpose(0, 2, 1, 3).reshape(bs, n, -1)
        x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
        h = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + _mlp(h, lp).astype(x.dtype)
        return (x, cache, i + 1), None

    if cents is None:
        cents = {"key": jnp.zeros((cfg.num_layers, 0)), "value": jnp.zeros((cfg.num_layers, 0))}
    (x, cache, _), _ = jax.lax.scan(
        layer, (x, cache, jnp.asarray(0, jnp.int32)), params["layers"]
    )
    if return_hidden:
        # pre-head hidden states (bs, n, D) — the chunked-NLL perplexity
        # path projects them to logits chunk by chunk (benchmarks/
        # perplexity.py), avoiding the (bs, n, V) f32 tensor (16.5 GB at
        # 32K x 128K vocab)
        return x, cache
    if last_logit_only:
        x = x[:, -1:]
    return _logits(params, cfg, x), cache


@partial(
    jax.jit,
    static_argnames=("cfg", "mode", "mesh", "flush", "n_bucket", "flush_n"),
)
def decode_step(
    params: Params,
    cfg: ModelConfig,
    token: jax.Array,  # (bs,) int32
    pos: jax.Array,  # scalar int32 — absolute position of this token
    cache: PQCacheLayerState,
    cents: Optional[Dict[str, jax.Array]] = None,
    mode: str = "pq",
    mesh=None,  # jax.sharding.Mesh -> sequence-sharded kernel attention
    flush: bool = False,  # STATIC: encode+flush the residual window first
    n_bucket: Optional[int] = None,  # STATIC: arena scan bound (tokens) —
    # host-picked via ops.pq_attention_pallas.bucket_for_length (l2Ns analogue)
    flush_n: int = 0,  # STATIC: sub-window flush size — 0 flushes the FULL
    # window (reference semantics); F < Lt flushes only the OLDEST F tokens
    # and shifts the rest down, so the flush-step tail shrinks ~Lt/F-fold
    # while the exact-recent window never drops below Lt - F (BETTER
    # recency than the reference's empty-after-flush window). See
    # _flush_windows_stacked.
) -> Tuple[jax.Array, PQCacheLayerState]:
    """One decode token. Returns (logits (bs, V) f32, updated cache).

    The PQ path appends to the residual window and runs the fused PQ decode
    attention — the analogue of the reference hot path cache.decoding +
    flash_decoding kernel (pq_utils.py:281-328).

    `flush` MUST be passed as True on the step where the residual window is
    full (r == Lt) — the host schedules it deterministically from token
    counts (runtime/generate.py). It is a static argument (two compiled
    variants) rather than a lax.cond so the multi-GB stacked arena never
    flows through a conditional, which would break XLA's in-place buffer
    aliasing. The flush batch-encodes all layers' residual windows and
    writes one contiguous word slab per side (reference flush flow,
    pq_utils.py:288-302) — amortized ~0.4 us/step vs ~1.2 ms/step for the
    per-token incremental arena mirror it replaced (profiled at 3B/32K).
    """
    bs = token.shape[0]
    x = params["embed"][token][:, None, :]  # (bs, 1, D)
    pos_arr = pos[None] if jnp.ndim(pos) == 0 else pos

    # The compiled kernel tiles the arena in >=512-token word blocks
    # (ops.pq_attention_pallas._block_geometry); arenas below one tile
    # (tiny configs, unit tests on hardware) demote to the jnp oracle —
    # same math, LSE-identical. This is the TPU-native analogue of the
    # reference's layered kernel fallback chain (paged_pq_utils.py:816-895):
    # resolved statically at trace time instead of caught at runtime.
    if mode == "pq_pallas" and cache["key_codes"].dtype == jnp.int16:
        # wide codebooks (nbits > 8) have no kernel format — jnp path (the
        # reference's pure-torch nbits != 8 route, modeling_llama.py:218-343)
        mode = "pq"
    if mode == "pq_pallas" and jax.default_backend() != "cpu":
        n_arena = cache["key_codes"].shape[-1] * 4
        n_seq_shards = 1
        if mesh is not None:
            n_seq_shards = mesh.shape.get("sp", 1) * mesh.shape.get("dcn", 1)
        if n_arena // n_seq_shards < 512:
            mode = "pq"

    # Counters evolve IDENTICALLY in every layer (same update rule per
    # token), so compute them once per step outside the scan: per-layer
    # indexed counter reads fed the kernels' scalar prefetch a fresh (L,)
    # slice every iteration, costing ~2 ms/step in tiny blocking
    # HBM->SMEM copies (profiled at 3B/32K).
    if mode in ("pq", "pq_pallas"):
        if flush:
            # named scope -> xprof trace attribution (the reference's
            # per-substep Timer role, modeling_llama.py:378-451)
            with jax.named_scope("residual_window_flush"):
                cache = _flush_windows_stacked(
                    cache, cents,
                    interp=(
                        True
                        if mesh is not None
                        and mesh.devices.flat[0].platform == "cpu"
                        else None
                    ),
                    n=flush_n,
                )
        start_s = cache["n_codes"][0]
        r_s = cache["r"][0]

    # Carry-threaded cache (see prefill): indexed per-layer updates on the
    # stacked arenas keep XLA's in-place aliasing; the fused kernel reads
    # its layer directly from the stacked arena via a scalar-prefetched
    # index, so no layer slice is ever materialized.
    def layer(carry, lp):
        x, cache, i = carry
        h = _rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = _qkv(h, lp, cfg, pos_arr)
        cache = dict(cache)
        if mode in ("pq", "pq_pallas"):
            kcent = jax.lax.dynamic_index_in_dim(cents["key"], i, 0, keepdims=False)
            vcent = jax.lax.dynamic_index_in_dim(cents["value"], i, 0, keepdims=False)
            start, r = start_s, r_s  # hoisted uniform counters
            # OPQ: the whole decode attention runs in rotated space — the
            # cache is rotated, q rotates to match, and the output (which
            # lives in rotated-V space) unrotates once before wo.
            if "Rk" in cents:
                Rk_i = jax.lax.dynamic_index_in_dim(cents["Rk"], i, 0, False)
                Rv_i = jax.lax.dynamic_index_in_dim(cents["Rv"], i, 0, False)
                k = _rotate(k, Rk_i)
                v = _rotate(v, Rv_i)
                q_att = _rotate(q, Rk_i)
            else:
                Rv_i = None
                q_att = q
            # append the token to the residual window ONLY — its code is
            # produced at the next window flush by the batched encode
            # (_flush_windows_stacked); no per-token encode or arena write.
            kd = k.astype(cache["key_residual"].dtype)
            vd = v.astype(cache["value_residual"].dtype)
            cache["key_residual"] = jax.lax.dynamic_update_slice(
                cache["key_residual"], kd[None], (i, 0, 0, r, 0)
            )
            cache["value_residual"] = jax.lax.dynamic_update_slice(
                cache["value_residual"], vd[None], (i, 0, 0, r, 0)
            )
            if mode == "pq_pallas":
                # named scope -> xprof trace attribution (the reference's
                # per-substep Timer role, modeling_llama.py:378-451)
                with jax.named_scope("pq_decode_attention"):
                    attn = _pq_pallas_attention_stacked(
                        q_att[:, :, 0], cache, cents, i, cfg, mesh,
                        n_codes=start, r=r + 1, n_bucket=n_bucket,
                    )
            else:
                from million_tpu.cache.pq_cache import load_codes_t

                out_kw = {}
                if "key_outliers" in cache:
                    out_kw["k_outliers"] = jax.lax.dynamic_index_in_dim(
                        cache["key_outliers"], i, 0, False
                    )
                    out_kw["k_oidx"] = jax.lax.dynamic_index_in_dim(
                        cents["k_outlier_idx"], i, 0, False
                    )
                if "value_outliers" in cache:
                    out_kw["v_outliers"] = jax.lax.dynamic_index_in_dim(
                        cache["value_outliers"], i, 0, False
                    )
                    out_kw["v_oidx"] = jax.lax.dynamic_index_in_dim(
                        cents["v_outlier_idx"], i, 0, False
                    )
                attn = pq_decode_attention_ref(
                    q_att[:, :, 0],
                    load_codes_t(
                        jax.lax.dynamic_index_in_dim(cache["key_codes"], i, 0, False)
                    ),
                    load_codes_t(
                        jax.lax.dynamic_index_in_dim(cache["value_codes"], i, 0, False)
                    ),
                    kcent,
                    vcent,
                    jax.lax.dynamic_index_in_dim(cache["key_residual"], i, 0, False),
                    jax.lax.dynamic_index_in_dim(cache["value_residual"], i, 0, False),
                    start,
                    r + 1,
                    layout=SUBSPACE_LAYOUT,
                    **out_kw,
                )
            if Rv_i is not None:
                attn = _rotate(attn, Rv_i.T)
        else:
            p0 = cache["length"][i]
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype)[None], (i, 0, 0, p0, 0)
            )
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype)[None], (i, 0, 0, p0, 0)
            )
            cache["length"] = cache["length"].at[i].add(1)
            kl = jax.lax.dynamic_index_in_dim(cache["k"], i, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(cache["v"], i, 0, keepdims=False)
            kmask = jnp.arange(kl.shape[2]) < cache["length"][i]
            attn = _masked_dense_decode(q[:, :, 0], kl, vl, kmask)
        attn = attn.reshape(bs, 1, -1)  # (bs, nh, d) -> (bs, 1, nh*d)
        x = x + jnp.einsum("bnf,df->bnd", attn, lp["wo"]).astype(x.dtype)
        h = _rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + _mlp(h, lp).astype(x.dtype)
        return (x, cache, i + 1), None

    if cents is None:
        cents = {"key": jnp.zeros((cfg.num_layers, 0)), "value": jnp.zeros((cfg.num_layers, 0))}
    (x, cache, _), _ = jax.lax.scan(
        layer, (x, cache, jnp.asarray(0, jnp.int32)), params["layers"]
    )
    if mode in ("pq", "pq_pallas"):
        cache = dict(cache)
        cache["r"] = jnp.full_like(cache["r"], r_s + 1)
    return _logits(params, cfg, x)[:, 0], cache


@partial(jax.jit, donate_argnums=(0,))
def _flush_write_flat(arenas, slabs, start_w, start_ow):
    """Argument-fed arena writer with DONATED arenas: a dynamic_update_slice
    whose update value is produced in the same program makes XLA
    relayout-copy the multi-GB arena (measured +21 ms of `copy` in the
    flush-step profile at 3B/32K — the same hazard the paged path's
    _commit_words documents). Slabs arrive as arguments with natural
    layouts, so this tiny program runs at ~0 temp memory."""
    z = jnp.int32(0)
    out = {}
    for k, arena in arenas.items():
        if k.endswith("_outliers"):
            idx = (z, z, z, z, z, start_ow)
        else:
            idx = (z, z, z, z, start_w)
        out[k] = jax.lax.dynamic_update_slice(arena, slabs[k], idx)
    return out


@partial(jax.jit, static_argnames=("n", "wide", "interp"))
def _flush_encode_core_flat(kres, vres, cents, n_codes, r, n, wide,
                            interp=None):
    """Encode the oldest n rows of every layer's residual window — NO
    arena access (see _flush_write_flat). Returns (slabs dict keyed like
    the arenas, rolled/cleared residuals, new n_codes, new r)."""
    from million_tpu.pq.ops import RUNTIME_FUSED_ENCODE

    Lt = kres.shape[3]
    full = n >= Lt
    slabs = {}
    for side, res in (("key", kres), ("value", vres)):
        window = res[:, :, :, :n]
        if RUNTIME_FUSED_ENCODE:
            from million_tpu.ops.pq_encode_pallas import pq_encode_fused_stacked

            codes_t = jnp.swapaxes(
                pq_encode_fused_stacked(
                    window, cents[side], SUBSPACE_LAYOUT,
                    precision=RUNTIME_ENCODE_PRECISION, interpret=interp,
                ), -1, -2,
            )
        else:
            # batched_cents over layer groups (one distance/argmin kernel
            # per group; the transient is bounded to ~2 GB — small groups
            # measured a ~0.8 ms FIXED cost per call that dominated the
            # sub-window flush)
            L = window.shape[0]
            rows = int(np.prod(window.shape[1:-1]))
            grp = max(1, min(L, 32768 // max(rows, 1)))
            parts = [
                pq_encode(window[g0:g0 + grp], cents[side][g0:g0 + grp],
                          SUBSPACE_LAYOUT, batched_cents=True,
                          precision=RUNTIME_ENCODE_PRECISION)
                for g0 in range(0, L, grp)
            ]
            codes_t = jnp.swapaxes(jnp.concatenate(parts, axis=0), -1, -2)
        slabs[side + "_codes"] = store_codes_t(codes_t, wide)
    for side, res, key in (("key", kres, "k_outlier_idx"),
                           ("value", vres, "v_outlier_idx")):
        if key in cents:
            from million_tpu.ops.pq_attention_pallas import to_byte_plane

            sel = jnp.take_along_axis(
                res[:, :, :, :n], cents[key][:, None, None, None, :], axis=-1
            )
            slabs[side + "_outliers"] = to_byte_plane(
                jnp.swapaxes(sel, -1, -2).astype(jnp.bfloat16)
            )
    if full:
        new_r = jnp.zeros_like(r)
        kres_o, vres_o = kres, vres
    else:
        new_r = r - n
        kres_o = jnp.roll(kres, -n, axis=3)
        vres_o = jnp.roll(vres, -n, axis=3)
    return slabs, kres_o, vres_o, n_codes + n, new_r


def flush_windows(cache, cents, n: int = 0, interp=None):
    """Host-split residual-window flush: encode core (no arena access) +
    argument-fed writer with donated arenas. Functionally identical to
    decode_step's in-program flush=True path but without the arena
    relayout copies that path pays (see _flush_write_flat); generate and
    bench.py call this between decode steps. n as in
    _flush_windows_stacked (0 = full window, F < Lt = sub-window)."""
    cache = dict(cache)
    Lt = cache["key_residual"].shape[3]
    if n <= 0 or n >= Lt:
        n = Lt
    if n % WORD:
        raise ValueError(f"flush size {n} must be word-aligned")
    wide = cache["key_codes"].dtype == jnp.int16
    arena_keys = [k for k in ("key_codes", "value_codes", "key_outliers",
                              "value_outliers") if k in cache]
    cents_core = {"key": cents["key"], "value": cents["value"]}
    if "key_outliers" in cache and "k_outlier_idx" in cents:
        cents_core["k_outlier_idx"] = cents["k_outlier_idx"]
    if "value_outliers" in cache and "v_outlier_idx" in cents:
        cents_core["v_outlier_idx"] = cents["v_outlier_idx"]
    arenas = {k: cache.pop(k) for k in arena_keys}
    slabs, kres, vres, new_n, new_r = _flush_encode_core_flat(
        cache["key_residual"], cache["value_residual"], cents_core,
        cache["n_codes"], cache["r"], n, wide, interp,
    )
    start = cache["n_codes"][0]
    start_w = start // (1 if wide else WORD)
    arenas = _flush_write_flat(arenas, slabs, start_w, start // WORD)
    cache.update(arenas)
    cache["key_residual"], cache["value_residual"] = kres, vres
    cache["n_codes"], cache["r"] = new_n, new_r
    return cache


def _flush_windows_stacked(cache, cents, interp=None, n: int = 0):
    """In-program form of the residual-window flush (decode_step's static
    flush=True path; the host-split form is flush_windows — generate and
    bench use that one to dodge the in-program arena-relayout cost).
    Delegates the encode/slab construction to _flush_encode_core_flat
    (single source of truth for the flush math) and applies the arena
    writes inside the current trace. n as in flush_windows."""
    cache = dict(cache)
    Lt = cache["key_residual"].shape[3]
    if n <= 0 or n >= Lt:
        n = Lt
    if n % WORD:
        raise ValueError(f"flush size {n} must be word-aligned")
    wide = cache["key_codes"].dtype == jnp.int16
    cents_core = {"key": cents["key"], "value": cents["value"]}
    if "key_outliers" in cache and "k_outlier_idx" in cents:
        cents_core["k_outlier_idx"] = cents["k_outlier_idx"]
    if "value_outliers" in cache and "v_outlier_idx" in cents:
        cents_core["v_outlier_idx"] = cents["v_outlier_idx"]
    slabs, kres, vres, new_n, new_r = _flush_encode_core_flat(
        cache["key_residual"], cache["value_residual"], cents_core,
        cache["n_codes"], cache["r"], n, wide, interp,
    )
    start = cache["n_codes"][0]
    start_w = start // (1 if wide else WORD)
    for key, slab in slabs.items():
        if key.endswith("_outliers"):
            idx = (0, 0, 0, 0, 0, start // WORD)
        else:
            idx = (0, 0, 0, 0, start_w)
        cache[key] = jax.lax.dynamic_update_slice(cache[key], slab, idx)
    cache["key_residual"], cache["value_residual"] = kres, vres
    cache["n_codes"], cache["r"] = new_n, new_r
    return cache


def _pq_pallas_attention_stacked(
    q, cache, cents, layer_idx, cfg, mesh=None, n_codes=None, r=None,
    n_bucket=None,
):
    """Fused-kernel decode attention over the STACKED cache: the kernel
    selects its layer through a scalar-prefetched index (no layer-slice
    materialization); the small residual window is sliced normally and
    LSE-merged (reference residual+reduce kernels)."""
    from million_tpu.ops.pq_attention_pallas import pq_codes_attention_stacked

    bs, nh, d = q.shape
    nh_k = cache["key_codes"].shape[2]
    G = nh // nh_k
    scale = 1.0 / (d**0.5)
    d_k, d_v = direct_flags(cents)

    check_group(G)
    qg = (q.astype(jnp.float32) * scale).reshape(bs, nh_k, G, d)
    q_pad = jnp.zeros((bs, nh_k, GROUP_PAD, d), jnp.bfloat16)
    q_pad = q_pad.at[:, :, :G].set(qg.astype(jnp.bfloat16))
    if n_codes is None:
        n_codes = cache["n_codes"][layer_idx]
    if r is None:
        r = cache["r"][layer_idx]

    if mesh is not None:
        from million_tpu.parallel.sharded_decode import (
            sharded_pq_codes_attention_stacked,
        )

        # outlier-channel corrections on the sharded path (round 5,
        # VERDICT r4 item 5): the byte-plane arenas shard with the codes
        # and the corrections merge inside the per-shard kernels
        okw = {}
        if "key_outliers" in cache:
            koidx_l = jax.lax.dynamic_index_in_dim(
                cents["k_outlier_idx"], layer_idx, 0, False
            )
            okw["qo"] = jnp.take_along_axis(
                q_pad, koidx_l[None, None, None, :], axis=-1
            )
            okw["k_outliers"] = cache["key_outliers"]
        if "value_outliers" in cache:
            okw["v_outliers"] = cache["value_outliers"]
        # interpret-mode detection must follow the MESH's devices (a CPU
        # mesh can coexist with an accelerator default backend)
        interp = True if mesh.devices.flat[0].platform == "cpu" else None
        res = sharded_pq_codes_attention_stacked(
            mesh, q_pad, cache["key_codes"], cache["value_codes"],
            cents["kpack"], cents["vpack"], layer_idx, n_codes,
            interpret=interp, direct=d_k, v_direct=d_v, n_bucket=n_bucket,
            **okw,
        )
        if "value_outliers" in cache:
            out_c, lse_c, co = res
            voidx_l = jax.lax.dynamic_index_in_dim(
                cents["v_outlier_idx"], layer_idx, 0, False
            )
            out_c = out_c.at[..., voidx_l].set(co)
        else:
            out_c, lse_c = res
    else:
        # outlier-channel corrections (north star): exact q slice for the
        # K-side score term; V side adds a third kernel output scattered
        # into the natural-order channels below
        okw = {}
        if "key_outliers" in cache:
            koidx_l = jax.lax.dynamic_index_in_dim(
                cents["k_outlier_idx"], layer_idx, 0, False
            )
            okw["qo"] = jnp.take_along_axis(
                q_pad, koidx_l[None, None, None, :], axis=-1
            )
            okw["k_outliers"] = cache["key_outliers"]
        if "value_outliers" in cache:
            okw["v_outliers"] = cache["value_outliers"]
        res = pq_codes_attention_stacked(
            q_pad, cache["key_codes"], cache["value_codes"],
            cents["kpack"], cents["vpack"],
            layer_idx, n_codes, direct=d_k, v_direct=d_v, n_bucket=n_bucket,
            **okw,
        )
        if "value_outliers" in cache:
            out_c, lse_c, co = res
            voidx_l = jax.lax.dynamic_index_in_dim(
                cents["v_outlier_idx"], layer_idx, 0, False
            )
            # decoded outlier components are exactly 0 (centroids trained
            # on zeroed channels); the correction IS the channel value.
            # (when the partial is empty, lse_c = -inf zeroes its weight in
            # the merge, so the values written here are irrelevant)
            out_c = out_c.at[..., voidx_l].set(co)
        else:
            out_c, lse_c = res
    out_r, lse_r = masked_partial_attention(
        q_pad.astype(jnp.float32),
        jax.lax.dynamic_index_in_dim(cache["key_residual"], layer_idx, 0, False),
        jax.lax.dynamic_index_in_dim(cache["value_residual"], layer_idx, 0, False),
        r,
        scale=1.0,
    )
    merged, _ = merge_two_partials(out_c, lse_c, out_r, lse_r)
    return merged[:, :, :G].reshape(bs, nh, d).astype(q.dtype)


def _pq_pallas_attention(q, cache_l, cents_l, cfg, mesh=None):
    """Fused-kernel decode attention (analogue of the reference's
    attn_forward_custom_kernel path, modeling_llama.py:455-554): Pallas
    kernel over the code arena + exact residual partial, LSE-merged.

    q (bs, nh, d) -> (bs, nh, d). Requires cents_l to carry precomputed
    "kpack"/"vpack" tables (see build_tables).
    """
    bs, nh, d = q.shape
    nh_k = cache_l["key_codes"].shape[1]
    G = nh // nh_k
    scale = 1.0 / (d**0.5)
    d_k, d_v = direct_flags(cents_l)

    check_group(G)
    qg = (q.astype(jnp.float32) * scale).reshape(bs, nh_k, G, d)
    q_pad = jnp.zeros((bs, nh_k, GROUP_PAD, d), jnp.bfloat16)
    q_pad = q_pad.at[:, :, :G].set(qg.astype(jnp.bfloat16))

    if mesh is not None:
        from million_tpu.parallel.sharded_decode import sharded_pq_codes_attention

        interp = True if mesh.devices.flat[0].platform == "cpu" else None
        out_c, lse_c = sharded_pq_codes_attention(
            mesh,
            q_pad,
            cache_l["key_codes"],
            cache_l["value_codes"],
            cents_l["kpack"],
            cents_l["vpack"],
            cache_l["n_codes"],
            interpret=interp,
            direct=d_k,
            v_direct=d_v,
        )
    else:
        out_c, lse_c = pq_codes_attention(
            q_pad,
            cache_l["key_codes"],
            cache_l["value_codes"],
            cents_l["kpack"],
            cents_l["vpack"],
            cache_l["n_codes"],
            direct=d_k,
            v_direct=d_v,
        )
    out_r, lse_r = masked_partial_attention(
        q_pad.astype(jnp.float32) / 1.0,  # already scaled
        cache_l["key_residual"],
        cache_l["value_residual"],
        cache_l["r"],
        scale=1.0,
    )
    merged, _ = merge_two_partials(out_c, lse_c, out_r, lse_r)
    return merged[:, :, :G].reshape(bs, nh, d).astype(q.dtype)


def _masked_dense_decode(q, k, v, mask):
    """Decode attention over a padded dense cache. q (bs,nh,d), k/v (bs,nk,N,d).

    GQA heads are contracted in grouped form (no head-repeat, no f32 copy of
    the KV — at 32K context a materialized f32 GQA-expanded KV is GBs of
    transient per layer); softmax statistics stay f32 via the einsum
    accumulator dtype."""
    from million_tpu.ops.pq_attention_ref import NEG_INF

    bs, nh, d = q.shape
    nh_k = k.shape[1]
    G = nh // nh_k
    scale = 1.0 / (d**0.5)
    qg = q.reshape(bs, nh_k, G, d)
    s = jnp.einsum(
        "bhgk,bhnk->bhgn", qg, k, preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhgn,bhnk->bhgk",
        p.astype(k.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(bs, nh, d).astype(q.dtype)
