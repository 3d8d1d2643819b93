"""The reference's own TPOT protocol: bs=1, 32K context, PQ vs dense
(BASELINE results.jsonl rows 13-14 measured 146.4 -> 57.4 ms on A100).
Reuses bench.py's measurement machinery at bs=1.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

import bench

cfg, params, _ = bench.build_model()
dt_d = bench.measure_dense(cfg, params, 1, 16)
print(f"dense bs=1 tpot: {dt_d*1e3:.2f} ms")
dt_p = bench.measure_pq(cfg, params, 1, 16)
print(f"pq    bs=1 tpot: {dt_p*1e3:.2f} ms   ratio {dt_d/dt_p:.2f}x")
