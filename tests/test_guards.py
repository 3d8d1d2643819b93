"""Regression tests for the round-3 robustness guards (VERDICT r2 item 6):
(a) GQA group wider than the kernel's GROUP_PAD fails loudly,
(b) the allocate_pages -1 exhaustion sentinel is detected on readback,
(c) sub-512-token pages are rejected up front when the compiled kernel
    would run.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from million_tpu.cache.paged_pq_cache import (
    PagedPQCacheConfig,
    init_paged_state,
    paged_cache_stats,
)
from million_tpu.models.llama import PRESETS, build_tables, init_params
from million_tpu.ops.pq_attention_pallas import GROUP_PAD, check_group
from million_tpu.runtime.scheduler import Scheduler
import million_tpu.runtime.scheduler as scheduler_mod


def test_check_group_rejects_wide_gqa():
    check_group(GROUP_PAD)  # boundary passes
    with pytest.raises(ValueError, match="GQA group"):
        check_group(GROUP_PAD + 1)


def test_wide_gqa_model_raises_before_kernel(rng):
    """nh/nh_k = 16 (e.g. nh=32, nh_k=2 class) must raise the explicit
    group-size error, not a shape error deep in tracing."""
    from million_tpu.cache.pq_cache import PQCacheConfig, init_state
    from million_tpu.models import llama

    cfg = dataclasses.replace(
        PRESETS["test-tiny"],
        num_heads=16, num_kv_heads=1, hidden_size=16 * 16, head_dim=16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    cents = {
        "key": jnp.asarray(rng.standard_normal((2, 8, 64, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((2, 8, 64, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    pqc = PQCacheConfig(bs=1, nh_k=1, d=16, M=8, C=64, Lt=8, N_max=64,
                        dtype=jnp.float32)
    cache = init_state(pqc, cfg.num_layers)
    from million_tpu.runtime.generate import generate

    with pytest.raises(ValueError, match="GQA group"):
        generate(
            params, cfg, jnp.zeros((1, 8), jnp.int32), cache, tables,
            mode="pq_pallas", max_new_tokens=2,
        )


def _paged_cfg(**kw):
    base = dict(
        num_layers=1, nh_k=1, d=16, M=8, C=64, Lt=8,
        page_size=128, n_pages=4, max_seqs=2, pages_per_seq=2,
        dtype=jnp.float32,
    )
    base.update(kw)
    return PagedPQCacheConfig(**base)


def test_page_table_sentinel_detected():
    pcfg = _paged_cfg()
    state = init_paged_state(pcfg)
    assert paged_cache_stats(state, pcfg)["page_table_errors"] == 0
    # simulate host/device divergence: seq 0 active with 2 pages claimed,
    # but the table holds the -1 exhaustion sentinel in its range
    state["seq_active"] = state["seq_active"].at[0].set(1)
    state["seq_n_pages"] = state["seq_n_pages"].at[0].set(2)
    state["page_table"] = state["page_table"].at[0, 1].set(-1)
    state["page_table"] = state["page_table"].at[0, 0].set(0)
    assert paged_cache_stats(state, pcfg)["page_table_errors"] == 1


def test_scheduler_stats_raise_on_sentinel(rng):
    cfg = dataclasses.replace(
        PRESETS["test-tiny"],
        num_layers=1, num_heads=2, num_kv_heads=1, hidden_size=32,
        head_dim=16, intermediate_size=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    cents = {
        "key": jnp.asarray(rng.standard_normal((1, 8, 64, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((1, 8, 64, 2)), jnp.float32),
    }
    sched = Scheduler(params, cfg, _paged_cfg(), build_tables(cents))
    sched.stats()  # clean state passes
    sched.state["seq_active"] = sched.state["seq_active"].at[0].set(1)
    sched.state["seq_n_pages"] = sched.state["seq_n_pages"].at[0].set(1)
    sched.state["page_table"] = sched.state["page_table"].at[0, 0].set(-1)
    with pytest.raises(RuntimeError, match="page-table corruption"):
        sched.stats()


def test_small_pages_rejected_on_compiled_backend(rng, monkeypatch):
    cfg = dataclasses.replace(
        PRESETS["test-tiny"],
        num_layers=1, num_heads=2, num_kv_heads=1, hidden_size=32,
        head_dim=16, intermediate_size=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    cents = {
        "key": jnp.asarray(rng.standard_normal((1, 8, 64, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((1, 8, 64, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    # pretend we are on a compiled backend: the guard must fire before any
    # device work happens
    monkeypatch.setattr(scheduler_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="page_size"):
        Scheduler(params, cfg, _paged_cfg(page_size=128), tables)
    monkeypatch.undo()
    Scheduler(params, cfg, _paged_cfg(page_size=128), tables)  # cpu ok


def test_scheduler_rejects_oversized_pages():
    """page_size >> admit_chunk must be rejected at construction: the
    chunked-admission transients OOM at the serving shape (measured at
    8192-token pages) — fail loud, not mid-admission (VERDICT r3 item 9)."""
    import jax
    import pytest

    from million_tpu.cache.paged_pq_cache import PagedPQCacheConfig
    from million_tpu.models.llama import PRESETS, init_params, build_tables
    from million_tpu.runtime.scheduler import Scheduler
    import jax.numpy as jnp
    import numpy as np

    cfg = PRESETS["test-tiny"]
    params = init_params(cfg, jax.random.PRNGKey(0))
    M = cfg.head_dim // 2
    rng = np.random.default_rng(0)
    cents = {
        "key": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((cfg.num_layers, M, 32, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    pcfg = PagedPQCacheConfig(
        num_layers=cfg.num_layers, nh_k=cfg.num_kv_heads, d=cfg.head_dim,
        M=M, C=32, Lt=8, page_size=8192, n_pages=4, max_seqs=2,
        pages_per_seq=2,
    )
    with pytest.raises(ValueError, match="admit_chunk"):
        Scheduler(params, cfg, pcfg, tables)
