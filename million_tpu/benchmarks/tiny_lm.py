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

    ap = argparse.ArgumentParser(description="train the quality tiny LM")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()
    tokens = build_corpus()
    print(f"corpus: {len(tokens)} bytes", flush=True)
    params, loss = train_tiny_lm(
        tokens, steps=args.steps, bs=args.bs, ctx=args.ctx, lr=args.lr
    )
    save_checkpoint(params, QUALITY_CFG)
    print(f"saved {checkpoint_path()} (final loss {loss:.4f} nats)")


if __name__ == "__main__":
    main()
