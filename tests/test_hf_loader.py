"""Cross-framework parity: a tiny HF LlamaForCausalLM checkpoint loaded by
hf_loader must reproduce HF's logits through our functional model.

This is the strongest validation of the model math (RMSNorm, RoPE, GQA,
SwiGLU, tied/untied head) — the reference trusts transformers for all of it
(main_pq.py:142-148); we re-implemented it, so we prove equivalence.
"""

import json

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from million_tpu.models import llama
from million_tpu.models.hf_loader import config_from_hf, load_hf_weights
from million_tpu.cache.dense_cache import DenseCacheConfig, init_dense_state


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_tiny")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)

    ids = np.array([[3, 17, 99, 4, 56, 23, 8, 120]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    return d, ids.astype(np.int32), want


def test_config_from_hf(hf_checkpoint):
    d, _, _ = hf_checkpoint
    cfg = config_from_hf(str(d))
    assert cfg.vocab_size == 128
    assert cfg.num_layers == 2
    assert cfg.num_heads == 4 and cfg.num_kv_heads == 2
    assert cfg.head_dim == 16
    assert not cfg.tie_word_embeddings


def test_logits_match_transformers(hf_checkpoint):
    d, ids, want = hf_checkpoint
    cfg = config_from_hf(str(d))
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    params = load_hf_weights(str(d), cfg, dtype=jnp.float32)
    dc = DenseCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=32,
                          dtype=jnp.float32)
    cache = init_dense_state(dc, cfg.num_layers)
    logits, _ = llama.prefill(
        params, cfg, jnp.asarray(ids), cache, None, mode="dense"
    )
    got = np.asarray(logits)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_yarn_rope_matches_transformers(tmp_path):
    """YaRN RoPE (the reference's 128K model family,
    configs/yarn-llama-2-7b.json): our frequencies + attention factor must
    reproduce transformers' logits on a yarn-configured checkpoint."""
    import dataclasses

    d = tmp_path / "hf_yarn"
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "yarn",
            "factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    ids = np.array([[5, 80, 33, 2, 61, 17, 9, 44, 71, 20]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()

    cfg = config_from_hf(str(d))
    assert cfg.rope_scaling == "yarn"
    assert cfg.rope_original_max_position == 64
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    params = load_hf_weights(str(d), cfg, dtype=jnp.float32)
    dc = DenseCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=32,
                          dtype=jnp.float32)
    cache = init_dense_state(dc, cfg.num_layers)
    logits, _ = llama.prefill(
        params, cfg, jnp.asarray(ids.astype(np.int32)), cache, None, mode="dense"
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=3e-4, atol=3e-4)


def test_qwen2_logits_match_transformers(tmp_path):
    """Qwen2 family (q/k/v biases): loader + functional model reproduce
    transformers' logits — the second model family beyond llama."""
    import dataclasses

    d = tmp_path / "hf_qwen2"
    hf_cfg = transformers.Qwen2Config(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(hf_cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    ids = np.array([[8, 21, 90, 4, 33, 57, 2, 75]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()

    cfg = config_from_hf(str(d))
    assert cfg.attn_bias
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    params = load_hf_weights(str(d), cfg, dtype=jnp.float32)
    assert "bq" in params["layers"]
    dc = DenseCacheConfig(bs=1, nh_k=cfg.num_kv_heads, d=cfg.head_dim, N_max=32,
                          dtype=jnp.float32)
    cache = init_dense_state(dc, cfg.num_layers)
    logits, _ = llama.prefill(
        params, cfg, jnp.asarray(ids.astype(np.int32)), cache, None, mode="dense"
    )
    np.testing.assert_allclose(np.asarray(logits), want, rtol=3e-4, atol=3e-4)
