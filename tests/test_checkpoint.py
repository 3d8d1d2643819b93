"""Serving-session checkpoint/resume (runtime/checkpoint.py).

The contract under test: a snapshot taken mid-generation restores into a
fresh Scheduler that emits BIT-IDENTICAL continuations — the paged pools,
residual windows, page tables, slot bookkeeping, queued requests, and the
sampling RNG are all part of the snapshot. (The reference checkpoints only
offline artifacts — SURVEY.md §5.)"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from million_tpu.cache.paged_pq_cache import PagedPQCacheConfig
from million_tpu.cache.pq_cache import PQCacheConfig, init_state
from million_tpu.models.llama import PRESETS, build_tables, init_params
from million_tpu.runtime.checkpoint import (
    load_cache,
    load_session,
    save_cache,
    save_session,
)
from million_tpu.runtime.sampling import SamplingConfig
from million_tpu.runtime.scheduler import Request, Scheduler


CFG = dataclasses.replace(
    PRESETS["test-tiny"],
    num_layers=2, hidden_size=64, num_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=128, vocab_size=300, dtype=jnp.float32,
)


def build(rng):
    params = init_params(CFG, jax.random.PRNGKey(0))
    M = 16
    cents = {
        "key": jnp.asarray(rng.standard_normal((2, M, 64, 2)), jnp.float32),
        "value": jnp.asarray(rng.standard_normal((2, M, 64, 2)), jnp.float32),
    }
    tables = build_tables(cents)
    pcfg = PagedPQCacheConfig(
        num_layers=2, nh_k=2, d=32, M=M, C=64, Lt=8,
        page_size=128, n_pages=12, max_seqs=2, pages_per_seq=4,
        dtype=jnp.float32,
    )
    return params, tables, pcfg


def test_session_resume_is_bit_identical(rng, tmp_path):
    """Kill a scheduler mid-flight (one request mid-generation, one still
    queued), restore from the snapshot, and require the exact token streams
    of an uninterrupted run — across a residual-window flush boundary."""
    params, tables, pcfg = build(rng)
    prompts = [
        rng.integers(0, 300, 14).astype(np.int32),
        rng.integers(0, 300, 9).astype(np.int32),
        rng.integers(0, 300, 11).astype(np.int32),
    ]

    def submit_all(s):
        # max_seqs=2: the third request queues behind the first two
        s.submit(Request(rid=0, prompt=prompts[0], max_new_tokens=16))
        s.submit(Request(rid=1, prompt=prompts[1], max_new_tokens=12))
        s.submit(Request(rid=2, prompt=prompts[2], max_new_tokens=10))

    # uninterrupted reference run (greedy -> deterministic)
    ref = Scheduler(params, CFG, pcfg, tables)
    submit_all(ref)
    ref_done = {f.rid: f.tokens for f in ref.run_to_completion(max_ticks=200)}

    # interrupted run: 5 ticks (rid 0/1 mid-generation, past nothing yet;
    # 5 more decode tokens each -> crosses no flush), snapshot, DISCARD,
    # restore, finish
    sched = Scheduler(params, CFG, pcfg, tables)
    submit_all(sched)
    for _ in range(5):
        sched.step()
    path = str(tmp_path / "session.npz")
    save_session(path, sched)
    del sched

    resumed = load_session(path, params, CFG, pcfg, tables)
    done = {f.rid: f.tokens for f in resumed.run_to_completion(max_ticks=200)}

    assert sorted(done.keys()) == sorted(ref_done.keys()) == [0, 1, 2]
    for rid in (0, 1, 2):
        np.testing.assert_array_equal(
            done[rid], ref_done[rid],
            err_msg=f"rid {rid} diverged after resume",
        )


def test_session_resume_across_flush_and_sampling_rng(rng, tmp_path):
    """Stochastic sampling: the RNG key is part of the snapshot, so a
    temperature>0 run also resumes bit-identically; the interruption point
    crosses the Lt=8 residual-flush boundary."""
    params, tables, pcfg = build(rng)
    prompt = rng.integers(0, 300, 12).astype(np.int32)
    sampling = SamplingConfig(temperature=0.8, top_k=20)

    ref = Scheduler(params, CFG, pcfg, tables, sampling=sampling, seed=7)
    ref.submit(Request(rid=0, prompt=prompt, max_new_tokens=15))
    ref_done = ref.run_to_completion(max_ticks=100)[0].tokens

    sched = Scheduler(params, CFG, pcfg, tables, sampling=sampling, seed=7)
    sched.submit(Request(rid=0, prompt=prompt, max_new_tokens=15))
    for _ in range(9):  # crosses r: 0 -> 8 (flush) on tick 9
        sched.step()
    path = str(tmp_path / "flush.npz")
    save_session(path, sched)
    resumed = load_session(path, params, CFG, pcfg, tables, sampling=sampling)
    done = resumed.run_to_completion(max_ticks=100)[0].tokens
    np.testing.assert_array_equal(done, ref_done)


def test_session_shape_mismatch_rejected(rng, tmp_path):
    params, tables, pcfg = build(rng)
    sched = Scheduler(params, CFG, pcfg, tables)
    sched.submit(Request(rid=0, prompt=rng.integers(0, 300, 8).astype(np.int32),
                         max_new_tokens=4))
    sched.step()
    path = str(tmp_path / "s.npz")
    save_session(path, sched)
    import pytest

    bad = dataclasses.replace(pcfg, n_pages=pcfg.n_pages + 1)
    with pytest.raises(ValueError, match="shape|mismatch"):
        load_session(path, params, CFG, bad, tables)


def test_flat_cache_roundtrip(rng, tmp_path):
    """Flat single-stream cache: save mid-generation, restore, and continue
    with decode_step — logits identical to the uninterrupted session."""
    from million_tpu.models.llama import decode_step, prefill

    params, tables, _ = build(rng)
    pq_cfg = PQCacheConfig(bs=1, nh_k=2, d=32, M=16, C=64, Lt=8, N_max=128,
                           dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 300, (1, 10)), jnp.int32)
    _, cache = prefill(params, CFG, ids, init_state(pq_cfg, 2), tables,
                       mode="pq", last_logit_only=True)
    tok = jnp.asarray([5], jnp.int32)
    l1, cache = decode_step(params, CFG, tok, jnp.asarray(10, jnp.int32),
                            cache, tables, mode="pq")

    path = str(tmp_path / "cache.npz")
    save_cache(path, cache, pos=11)
    cache2, pos = load_cache(path)
    assert pos == 11
    tok2 = jnp.asarray([int(np.argmax(np.asarray(l1)[0]))], jnp.int32)
    la, _ = decode_step(params, CFG, tok2, jnp.asarray(pos, jnp.int32),
                        cache, tables, mode="pq")
    lb, _ = decode_step(params, CFG, tok2, jnp.asarray(pos, jnp.int32),
                        cache2, tables, mode="pq")
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
