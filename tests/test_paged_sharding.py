"""Mesh-sharded paged serving (round 5, VERDICT r4 item 1): the
continuous-batching stack — paged pool, fused multi-tick, window flush,
chunked admission, outlier pools — running on a virtual device mesh with
the pool sequence-sharded over sp and heads over tp, compared against the
single-device scheduler on identical requests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from million_tpu.cache.paged_pq_cache import PagedPQCacheConfig
from million_tpu.models.llama import PRESETS, build_tables, init_params
from million_tpu.parallel.mesh import make_mesh, param_shardings, shard_pytree
from million_tpu.runtime.scheduler import Request, Scheduler, ShardedScheduler


CFG = dataclasses.replace(
    PRESETS["test-tiny"],
    num_layers=2, hidden_size=64, num_heads=4, num_kv_heads=2,
    head_dim=32, intermediate_size=128, vocab_size=300, dtype=jnp.float32,
)


def build(rng, n_pages=8, max_seqs=2, pages_per_seq=4, OK=0, OV=0):
    params = init_params(CFG, jax.random.PRNGKey(0))
    M = 16
    if OK or OV:
        koidx = np.sort(rng.choice(32, OK, replace=False)).astype(np.int32)
        voidx = np.sort(rng.choice(32, OV, replace=False)).astype(np.int32)
        ck = rng.standard_normal((2, M, 64, 2)).astype(np.float32)
        cv = rng.standard_normal((2, M, 64, 2)).astype(np.float32)
        for c in koidx:
            ck[:, c % M, :, c // M] = 0.0
        for c in voidx:
            cv[:, c % M, :, c // M] = 0.0
        cents = {
            "key": jnp.asarray(ck), "value": jnp.asarray(cv),
            "k_outlier_idx": jnp.asarray(np.stack([koidx] * 2)),
            "v_outlier_idx": jnp.asarray(np.stack([voidx] * 2)),
        }
    else:
        cents = {
            "key": jnp.asarray(rng.standard_normal((2, M, 64, 2)), jnp.float32),
            "value": jnp.asarray(rng.standard_normal((2, M, 64, 2)), jnp.float32),
        }
    tables = build_tables(cents)
    pcfg = PagedPQCacheConfig(
        num_layers=2, nh_k=2, d=32, M=M, C=64, Lt=8,
        page_size=128, n_pages=n_pages, max_seqs=max_seqs,
        pages_per_seq=pages_per_seq, dtype=jnp.float32, OK=OK, OV=OV,
    )
    return params, cents, tables, pcfg


def make_serving_mesh(tp=2, sp=2, dcn=1):
    return make_mesh(dp=1, tp=tp, sp=sp, dcn=dcn)


def run_sched(sched, reqs, max_ticks=300):
    for r in reqs:
        sched.submit(r)
    done = sched.run_to_completion(max_ticks=max_ticks)
    return {f.rid: f.tokens for f in done}


def reqs_for(specs):
    return [
        Request(
            rid=rid,
            prompt=np.random.default_rng(rid).integers(
                0, CFG.vocab_size, n).astype(np.int32),
            max_new_tokens=m,
        )
        for rid, (n, m) in enumerate(specs)
    ]


def _sharded(params, cfg, pcfg, tables, mesh, **kw):
    p_sh = param_shardings(mesh)
    if cfg.tie_word_embeddings and "lm_head" in p_sh:
        del p_sh["lm_head"]
    params_s = shard_pytree(params, p_sh)
    return ShardedScheduler(params_s, cfg, pcfg, tables, mesh=mesh, **kw)


def test_sharded_scheduler_matches_single_device(rng):
    """Greedy serving on a tp=2 x sp=2 mesh must produce the same tokens
    as the single-device scheduler: crosses several window flushes and a
    page-boundary growth, so admission commits, flush routing, growth
    allocation, and the per-shard LSE-merged decode are all exercised."""
    params, cents, tables, pcfg = build(rng, n_pages=8, max_seqs=2)
    mesh = make_serving_mesh(tp=2, sp=2)
    specs = [(60, 30), (130, 20)]  # rid 1 admission spans 2 pages

    want = run_sched(Scheduler(params, CFG, pcfg, tables), reqs_for(specs))
    got = run_sched(
        _sharded(params, CFG, pcfg, tables, mesh), reqs_for(specs)
    )
    assert set(got) == set(want)
    for rid in got:
        assert len(got[rid]) == len(want[rid])
        agree = (got[rid] == want[rid]).mean()
        assert agree >= 0.85, f"rid {rid}: {agree}: {got[rid]} vs {want[rid]}"


def test_sharded_chunked_admission_matches_single_device(rng):
    """A prompt longer than admit_chunk admits through the SHARDED chunked
    path (per-shard history kernel + sharded commits) and generates the
    same tokens as the single-device chunked admission."""
    params, cents, tables, pcfg = build(
        rng, n_pages=8, max_seqs=2, pages_per_seq=4
    )
    mesh = make_serving_mesh(tp=2, sp=2)
    specs = [(300, 10)]

    base = Scheduler(params, CFG, pcfg, tables)
    base.admit_chunk = 128
    want = run_sched(base, reqs_for(specs))

    shard = _sharded(params, CFG, pcfg, tables, mesh)
    shard.admit_chunk = 128
    got = run_sched(shard, reqs_for(specs))
    agree = (got[0] == want[0]).mean()
    assert agree >= 0.8, f"{agree}: {got[0]} vs {want[0]}"


def test_sharded_outlier_geometry(rng):
    """Outlier byte-plane pools through the sharded path: OK/OV pools
    shard with the code pools, the kernel corrections ride the same LSE
    merge, and generation tracks the single-device outlier scheduler."""
    params, cents, tables, pcfg = build(
        rng, n_pages=8, max_seqs=2, OK=4, OV=4
    )
    mesh = make_serving_mesh(tp=2, sp=2)
    specs = [(40, 14)]

    want = run_sched(Scheduler(params, CFG, pcfg, tables), reqs_for(specs))
    got = run_sched(_sharded(params, CFG, pcfg, tables, mesh), reqs_for(specs))
    agree = (got[0] == want[0]).mean()
    assert agree >= 0.85, f"{agree}: {got[0]} vs {want[0]}"


def test_sharded_dcn_axis(rng):
    """Multi-slice serving: the sequence shards span ("dcn","sp") —
    2 slices x 2 sp shards x 2 tp = 8 devices; the merge psum crosses
    DCN only for the tiny (G, d+1) partials."""
    params, cents, tables, pcfg = build(
        rng, n_pages=8, max_seqs=2, pages_per_seq=4
    )
    mesh = make_serving_mesh(tp=2, sp=2, dcn=2)  # n_sp = 4
    specs = [(60, 12)]

    want = run_sched(Scheduler(params, CFG, pcfg, tables), reqs_for(specs))
    got = run_sched(_sharded(params, CFG, pcfg, tables, mesh), reqs_for(specs))
    agree = (got[0] == want[0]).mean()
    assert agree >= 0.85, f"{agree}: {got[0]} vs {want[0]}"


def test_sharded_preemption_per_shard_pressure(rng):
    """Pool pressure in the sharded allocator: two growing sequences whose
    demand exceeds shard capacity trigger recompute preemption with the
    same no-token-loss invariant as the single-device scheduler."""
    params, cents, tables, _ = build(rng)
    pcfg = PagedPQCacheConfig(
        num_layers=2, nh_k=2, d=32, M=16, C=64, Lt=8,
        page_size=128, n_pages=4, max_seqs=2, pages_per_seq=4,
        dtype=jnp.float32,
    )
    mesh = make_serving_mesh(tp=2, sp=2)
    sched = _sharded(params, CFG, pcfg, tables, mesh)
    for rid in (0, 1):
        sched.submit(Request(
            rid=rid,
            prompt=np.random.default_rng(rid).integers(
                0, 300, 100).astype(np.int32),
            max_new_tokens=60,
        ))
    done = sched.run_to_completion(max_ticks=500)
    assert sorted(f.rid for f in done) == [0, 1]
    for f in done:
        assert len(f.tokens) == 60
        assert np.isfinite(f.tokens).all()
    assert sched.preemptions >= 1
    assert not sched.h_used.any()


def test_sharded_session_checkpoint_resume(rng, tmp_path):
    """save_session/load_session on the mesh-sharded scheduler: a session
    snapshotted mid-generation and restored (state re-placed with mesh
    shardings, host allocator mirrors rebuilt) continues to the same
    greedy tokens as the uninterrupted run."""
    from million_tpu.runtime.checkpoint import load_session, save_session

    params, cents, tables, pcfg = build(rng, n_pages=8, max_seqs=2)
    mesh = make_serving_mesh(tp=2, sp=2)
    specs = [(60, 24), (30, 18)]

    ref = _sharded(params, CFG, pcfg, tables, mesh)
    want = run_sched(ref, reqs_for(specs))

    sched = _sharded(params, CFG, pcfg, tables, mesh)
    for r in reqs_for(specs):
        sched.submit(r)
    for _ in range(3):
        sched.step()
    p = str(tmp_path / "sess.npz")
    save_session(p, sched)
    del sched
    resumed = load_session(p, ref.params, CFG, pcfg, tables, mesh=mesh)
    assert resumed.h_used.shape == (2, 4)
    done = resumed.run_to_completion(max_ticks=200)
    got = {f.rid: f.tokens for f in done}
    assert set(got) == set(want)
    for rid in got:
        assert len(got[rid]) == len(want[rid])
        np.testing.assert_array_equal(got[rid], want[rid])
