"""Load HuggingFace Llama checkpoints into the stacked-params layout.

Replaces the reference's direct dependence on transformers'
AutoModelForCausalLM (main_pq.py:142-148): here only the weights are read
(safetensors), transposed to our (in, out) matmul convention and stacked on
the layer axis for lax.scan.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from million_tpu.models.llama import ModelConfig, Params


def _open_safetensors(model_dir: Path):
    from safetensors import safe_open  # ships with transformers' deps

    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {model_dir}")
    handles = [safe_open(str(f), framework="np") for f in files]
    index: Dict[str, int] = {}
    for i, h in enumerate(handles):
        for k in h.keys():
            index[k] = i
    return handles, index


def load_hf_weights(model_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    model_dir = Path(model_dir)
    handles, index = _open_safetensors(model_dir)

    def get(name: str) -> np.ndarray:
        return handles[index[name]].get_tensor(name)

    L = cfg.num_layers

    def stack(fmt: str, transpose: bool = True) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = get(fmt.format(i=i))
            mats.append(w.T if transpose else w)  # HF Linear stores (out, in)
        return jnp.asarray(np.stack(mats), dtype)

    params: Params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
        "layers": {
            "attn_norm": jnp.asarray(
                np.stack([get(f"model.layers.{i}.input_layernorm.weight") for i in range(L)]),
                dtype,
            ),
            "mlp_norm": jnp.asarray(
                np.stack(
                    [get(f"model.layers.{i}.post_attention_layernorm.weight") for i in range(L)]
                ),
                dtype,
            ),
            # q/k/v/o keep HF (out, in) orientation: contracting dim minor
            "wq": stack("model.layers.{i}.self_attn.q_proj.weight", transpose=False),
            "wk": stack("model.layers.{i}.self_attn.k_proj.weight", transpose=False),
            "wv": stack("model.layers.{i}.self_attn.v_proj.weight", transpose=False),
            # wo keeps HF (out, in) orientation: contracting dim minor (see init_params)
            "wo": stack("model.layers.{i}.self_attn.o_proj.weight", transpose=False),
            "w_gate": stack("model.layers.{i}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{i}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{i}.mlp.down_proj.weight"),
        },
    }
    if cfg.attn_bias:
        for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"), ("bv", "v_proj")):
            params["layers"][ours] = jnp.asarray(
                np.stack(
                    [get(f"model.layers.{i}.self_attn.{theirs}.bias") for i in range(L)]
                ),
                dtype,
            )
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def config_from_hf(model_dir: str) -> ModelConfig:
    """Build a ModelConfig from a HF config.json (covers llama 1/2/3)."""
    with open(Path(model_dir) / "config.json") as f:
        c = json.load(f)
    rs = c.get("rope_scaling") or {}
    rope_type = rs.get("rope_type") or rs.get("type")
    # qwen2 always carries q/k/v biases; llama-family configs may set
    # attention_bias explicitly
    attn_bias = c.get("model_type") == "qwen2" or bool(c.get("attention_bias"))
    return ModelConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        intermediate_size=c["intermediate_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        num_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
        head_dim=c.get("head_dim", c["hidden_size"] // c["num_attention_heads"]),
        rope_theta=c.get("rope_theta", 10000.0),
        rms_eps=c.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=c.get("tie_word_embeddings", False),
        rope_scaling=rope_type if rope_type in ("llama3", "yarn") else None,
        rope_scaling_factor=rs.get("factor", 8.0),
        rope_low_freq_factor=rs.get("low_freq_factor", 1.0),
        rope_high_freq_factor=rs.get("high_freq_factor", 4.0),
        rope_original_max_position=rs.get(
            "original_max_position_embeddings",
            c.get("max_position_embeddings", 8192) if rope_type == "yarn" else 8192,
        ),
        rope_beta_fast=rs.get("beta_fast") or 32.0,
        rope_beta_slow=rs.get("beta_slow") or 1.0,
        rope_attention_factor=rs.get("attention_factor"),
        attn_bias=attn_bias,
    )
