"""Trainable tiny byte-level LM — the quality contract's model.

The environment ships no pretrained weights, and a random-init model is
useless for measuring quantization quality: its logits are near-uniform, so
Δppl(dense → PQ) is vacuously ~0 regardless of codebook quality. This
module therefore trains a small llama-architecture byte LM on real local
text (repo documentation + source trees — natural, structured data) and
pins its checkpoint under artifacts/quality/. The quality ladder
(quality_ladder.py) and the Δppl regression test then run the reference's
evaluation protocol (distorted-prefill teacher-forced ppl,
perplexity.py:27 + pq_utils.py:243-247) against a model whose predictions
actually depend on attention over history.

This plays the role of the reference's llama-2-7b + wikitext-2 quality
anchor (BASELINE.md ppl rows) at a scale the environment can run.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from million_tpu.models import llama
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state

REPO = Path(__file__).resolve().parents[2]

# d=32 per head -> M=16 subspaces at d_m=2, the production geometry ratio
# (M = d/2), so ladder results transfer structurally to d=128/M=64.
QUALITY_CFG = llama.ModelConfig(
    vocab_size=256,
    hidden_size=128,
    intermediate_size=384,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=32,
    dtype=jnp.float32,
)

# The round-3 quality anchor: d=64 per head (M=32 at the production d_m=2
# ratio), 6 layers, GQA 2:1, ~19M params — trained on a >=48MB real-text
# corpus (build_corpus_v2). This is the in-repo stand-in for the
# reference's llama-2-7b + wikitext-2 anchor (main_pq.py:251-407,
# BASELINE.md ppl rows) at the largest scale the environment can train
# and sweep in-session; the d=32 QUALITY_CFG stays as the fast
# regression-test model.
QUALITY_CFG_L = llama.ModelConfig(
    vocab_size=256,
    hidden_size=512,
    intermediate_size=1536,
    num_layers=6,
    num_heads=8,
    num_kv_heads=4,
    head_dim=64,
    dtype=jnp.float32,
)


def build_corpus(max_bytes: int = 4 << 20) -> np.ndarray:
    """Deterministic local text corpus: this repo's docs and sources plus
    the reference tree's sources (read as DATA — natural structured text).
    Returns a uint8 byte stream."""
    roots: Iterable[Tuple[Path, str]] = [
        (REPO, "*.md"),
        (REPO / "docs", "*.md"),
        (REPO / "million_tpu", "**/*.py"),
        (REPO / "tests", "*.py"),
        (Path("/root/reference"), "**/*.py"),
        (Path("/root/reference"), "**/*.md"),
    ]
    parts = []
    total = 0
    for root, pat in roots:
        if not root.exists():
            continue
        for p in sorted(root.glob(pat)):
            try:
                b = p.read_bytes()
            except OSError:
                continue
            parts.append(b)
            total += len(b)
            if total >= max_bytes:
                break
        if total >= max_bytes:
            break
    blob = b"\n\n".join(parts)[:max_bytes]
    if len(blob) < (1 << 18):
        raise RuntimeError(f"corpus too small ({len(blob)} bytes)")
    return np.frombuffer(blob, np.uint8).astype(np.int32)


def build_corpus_v2(max_bytes: int = 48 << 20) -> np.ndarray:
    """Large real-text corpus for the d=64 quality anchor: every .py / .pyi
    / .txt / .rst / .md under the system and venv python trees (~550MB
    available; natural, structured English + code — the environment's
    closest analogue to wikitext), deterministically ordered and
    interleaved so no single package dominates a contiguous region.

    The reference's quality corpus is wikitext-2 (perplexity.py:7-16); no
    network exists here, so local library text is the real-data stand-in.
    Returns a uint8 byte stream of exactly max_bytes (or raises).
    """
    import os

    roots = [
        "/opt/venv/lib/python3.12/site-packages",
        "/usr/lib/python3.11",
        "/usr/lib/python3/dist-packages",
    ]
    exts = (".py", ".pyi", ".txt", ".rst", ".md")
    files = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for f in sorted(filenames):
                if f.endswith(exts):
                    files.append(os.path.join(dirpath, f))
    # deterministic shuffle mixes packages/libraries through the stream so
    # train/sample/holdout regions all see the same distribution
    rng = np.random.default_rng(0)
    order = rng.permutation(len(files))
    parts, total = [], 0
    per_file_cap = 256 << 10  # no single file dominates
    for i in order:
        try:
            b = Path(files[i]).read_bytes()[:per_file_cap]
        except OSError:
            continue
        # keep it textual: skip files that are mostly non-ASCII binary
        if len(b) == 0 or sum(c > 127 for c in b[:4096]) > 512:
            continue
        parts.append(b)
        total += len(b) + 2
        if total >= max_bytes:
            break
    blob = b"\n\n".join(parts)[:max_bytes]
    if len(blob) < max_bytes:
        raise RuntimeError(f"corpus v2 too small ({len(blob)} bytes)")
    return np.frombuffer(blob, np.uint8).astype(np.int32)


def _loss_fn(params, cfg, ids, cache):
    logits, _ = llama.prefill(params, cfg, ids, cache, None, mode="dense")
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def train_tiny_lm(
    tokens: np.ndarray,
    cfg: llama.ModelConfig = QUALITY_CFG,
    *,
    steps: int = 2000,
    bs: int = 8,
    ctx: int = 256,
    lr: float = 3e-3,
    seed: int = 0,
    holdout: int = 1 << 16,
    log_every: int = 200,
):
    """AdamW + cosine training on random windows of tokens[:-holdout].
    Returns (params, final_train_loss_nats)."""
    import optax

    train_tokens = tokens[:-holdout]
    params = llama.init_params(cfg, jax.random.PRNGKey(seed))
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.1)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    opt_state = opt.init(params)
    dcfg = DenseCacheConfig(
        bs=bs, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=ctx,
        dtype=cfg.dtype,
    )

    @jax.jit
    def step(params, opt_state, ids):
        cache = init_dense_state(dcfg, cfg.num_layers)
        loss, grads = jax.value_and_grad(_loss_fn)(params, cfg, ids, cache)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    loss = np.nan
    for i in range(steps):
        starts = rng.integers(0, len(train_tokens) - ctx - 1, bs)
        ids = jnp.asarray(
            np.stack([train_tokens[s : s + ctx] for s in starts]), jnp.int32
        )
        params, opt_state, loss = step(params, opt_state, ids)
        if log_every and (i + 1) % log_every == 0:
            print(f"  step {i+1}/{steps} loss {float(loss):.4f} nats "
                  f"({float(loss)/np.log(2):.3f} bits/byte)", flush=True)
    return params, float(loss)


def checkpoint_path() -> Path:
    return REPO / "artifacts" / "quality" / "tiny_lm_v1.npz"


def checkpoint_path_l() -> Path:
    """The d=64 quality-anchor checkpoint (QUALITY_CFG_L)."""
    return REPO / "artifacts" / "quality" / "lm_l_v1.npz"


def save_checkpoint(params, cfg: llama.ModelConfig, path: Path | None = None):
    path = path or checkpoint_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    # stable string keys from the key path
    flat = {}
    for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in kp
        )
        flat[key] = np.asarray(v)
    meta = {
        f.name: (getattr(cfg, f.name) if f.name != "dtype" else "float32")
        for f in dataclasses.fields(cfg)
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **flat)


def load_checkpoint(path: Path | None = None):
    """Returns (params, cfg). Raises FileNotFoundError if never trained."""
    path = path or checkpoint_path()
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    meta["dtype"] = jnp.float32
    cfg = llama.ModelConfig(**meta)
    params: dict = {}
    for key in z.files:
        if key == "__meta__":
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(z[key])
    return params, cfg


def main():
    import argparse

    ap = argparse.ArgumentParser(description="train the quality LM")
    ap.add_argument("--model", choices=("tiny", "large"), default="tiny")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--ctx", type=int, default=None)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--holdout", type=int, default=None)
    args = ap.parse_args()
    if args.model == "large":
        cfg, path = QUALITY_CFG_L, checkpoint_path_l()
        tokens = build_corpus_v2()
        steps = args.steps or 6000
        bs = args.bs or 16
        ctx = args.ctx or 1024
        holdout = args.holdout or (2 << 20)
        log_every = 100
    else:
        cfg, path = QUALITY_CFG, checkpoint_path()
        tokens = build_corpus()
        steps = args.steps or 2000
        bs = args.bs or 8
        ctx = args.ctx or 256
        holdout = args.holdout or (1 << 16)
        log_every = 200
    print(f"corpus: {len(tokens)} bytes", flush=True)
    params, loss = train_tiny_lm(
        tokens, cfg, steps=steps, bs=bs, ctx=ctx, lr=args.lr,
        holdout=holdout, log_every=log_every,
    )
    save_checkpoint(params, cfg, path)
    print(f"saved {path} (final loss {loss:.4f} nats)")


if __name__ == "__main__":
    main()
