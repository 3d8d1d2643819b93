"""Device mesh + sharding layouts.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed,
no collectives, `# TODO: support multi-gpu` at main_pq.py:74). This module
is therefore new design, not a port: a `jax.sharding.Mesh` over up to three
axes —

  dp : data parallel, shards the batch;
  tp : tensor parallel, shards attention heads and the MLP intermediate
       dim (Megatron layout: column-parallel in, row-parallel out);
  sp : sequence parallel for the KV code arena — each sp shard owns a
       contiguous slice of quantized tokens and computes a (partial, lse)
       pair, merged with the same associative LSE combine the reference
       uses across its intra-GPU splits (Kernel.cuh:1211-1270).

Codebooks/tables are tiny (M*C*d_m fp32 ~ 128 KB) and replicated.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, dcn: int = 1, devices=None) -> Mesh:
    """Mesh axes ("dcn", "dp", "tp", "sp").

    dcn is the multi-slice axis (slices connected over the data-center
    network, not ICI): the KV code sequence shards over ("dcn", "sp"), so
    each slice owns a contiguous super-range of tokens and the per-token
    traffic stays on ICI — only the tiny (partial, lse) pairs cross DCN in
    the final merge. dcn=1 (the default) degenerates to single-slice; all
    other arrays are replicated over dcn unless sharded explicitly.
    """
    devices = devices if devices is not None else jax.devices()
    n = dcn * dp * tp * sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dcn, dp, tp, sp)
    return Mesh(arr, ("dcn", "dp", "tp", "sp"))


def param_shardings(mesh: Mesh, attn_bias: bool = False) -> Dict[str, Any]:
    """NamedShardings for the stacked-layer Llama-family params (Megatron
    TP).

    wq/wk/wv column-parallel (heads split over tp), wo row-parallel;
    w_gate/w_up column-parallel, w_down row-parallel; embeddings and norms
    replicated (vocab-parallel embedding is a later refinement). attn_bias
    adds the qwen2-family q/k/v bias rows, sharded with their columns.
    """
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    extra = (
        {"bq": s(None, "tp"), "bk": s(None, "tp"), "bv": s(None, "tp")}
        if attn_bias
        else {}
    )
    return {
        "embed": s(None, None),
        "final_norm": s(None),
        "lm_head": s(None, None),
        "layers": {
            "attn_norm": s(None, None),
            "mlp_norm": s(None, None),
            "wq": s(None, "tp", None),  # transposed storage (L, out, in)
            "wk": s(None, "tp", None),
            "wv": s(None, "tp", None),
            "wo": s(None, None, "tp"),  # transposed storage (L, D, nh*dh)
            "w_gate": s(None, None, "tp"),
            "w_up": s(None, None, "tp"),
            "w_down": s(None, "tp", None),
            **extra,
        },
    }


def pq_cache_shardings(mesh: Mesh) -> Dict[str, Any]:
    """Cache pytree shardings: codes sequence-sharded over ("dcn", "sp") —
    contiguous super-ranges per slice, ICI-local shards within — batch over
    dp, KV heads over tp; the residual window is small (Lt tokens) and
    replicated across the sequence axes."""
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    seq = ("dcn", "sp") if "dcn" in mesh.shape else "sp"
    return {
        "key_codes": s(None, "dp", "tp", None, seq),
        "value_codes": s(None, "dp", "tp", None, seq),
        # byte-plane exact outlier channels (L, bs, nh_k, 4, O, NW):
        # sequence-sharded with the codes they correct
        "key_outliers": s(None, "dp", "tp", None, None, seq),
        "value_outliers": s(None, "dp", "tp", None, None, seq),
        "key_residual": s(None, "dp", "tp", None, None),
        "value_residual": s(None, "dp", "tp", None, None),
        "n_codes": s(None),
        "r": s(None),
    }


def dense_cache_shardings(mesh: Mesh) -> Dict[str, Any]:
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    return {
        "k": s(None, "dp", "tp", "sp", None),
        "v": s(None, "dp", "tp", "sp", None),
        "length": s(None),
    }


def shard_pytree(tree: Any, shardings: Any) -> Any:
    """device_put every leaf with its sharding. Dicts align by the TREE's
    keys, so a shardings table may cover optional state (e.g. the outlier
    arenas) that a particular cache doesn't carry."""
    if isinstance(tree, dict) and isinstance(shardings, dict):
        return {k: shard_pytree(v, shardings[k]) for k, v in tree.items()}
    return jax.tree.map(lambda x, sh: jax.device_put(x, sh), tree, shardings)
