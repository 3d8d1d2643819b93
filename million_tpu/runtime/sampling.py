"""Token sampling for the decode loop (greedy / temperature / top-k).

The reference drives HF `model.generate` with greedy decoding
(speedtest.py:67-77, do_sample=False); this is the standalone equivalent,
jit-friendly (pure function of logits + PRNG key).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no top-k filtering


def sample(
    logits: jax.Array,  # (bs, V) f32
    key: jax.Array,
    cfg: SamplingConfig = SamplingConfig(),
) -> jax.Array:
    """Return (bs,) int32 sampled token ids."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
