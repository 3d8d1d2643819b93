"""Faiss-style .fvecs sample files (reference fvecio.py:23-90).

Format: per vector, int32 dim followed by dim float32 values. Used by the
sampling stage to persist KV head-vectors for offline codebook training.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def write_fvecs(path: str | Path, x: np.ndarray, append: bool = True) -> None:
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.ndim != 2:
        raise ValueError("expected (n, d)")
    n, d = x.shape
    rec = np.empty((n, d + 1), np.float32)
    rec[:, 0] = np.frombuffer(np.int32(d).tobytes() * n, np.float32).reshape(n)
    rec[:, 1:] = x
    mode = "ab" if append else "wb"
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, mode) as f:
        rec.tofile(f)


def read_fvecs(path: str | Path, max_n: int | None = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.float32)
    if raw.size == 0:
        return np.empty((0, 0), np.float32)
    d = raw[:1].view(np.int32)[0]
    rec = raw.reshape(-1, d + 1)
    out = rec[:, 1:]
    if max_n is not None:
        out = out[:max_n]
    return np.ascontiguousarray(out)
