"""ctypes bindings for the native PQ library (native/pqlib.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source); falls back to the pure-JAX implementations when no compiler is
available. The native trainer serves the offline pipeline on CPU hosts —
the role faiss plays in the reference (pq_utils.py:586-609) — while the
accelerator stays on serving work.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "pqlib.cpp"
_SO = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_unavailable: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable is not None:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", str(_SRC), "-o", str(_SO)],
                    check=True, capture_output=True, text=True, timeout=300,
                )
            lib = ctypes.CDLL(str(_SO))
            lib.pq_train.restype = ctypes.c_int
            lib.pq_train.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.pq_encode.restype = ctypes.c_int
            lib.pq_encode.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception as e:  # noqa: BLE001
            _unavailable = str(e)
        return _lib


def native_available() -> bool:
    return _load() is not None


_LAYOUTS = {"contiguous": 0, "strided": 1}


def train_pq_native(
    samples: np.ndarray,
    M: int,
    nbits: int = 8,
    iters: int = 25,
    seed: int = 0,
    layout: str = "contiguous",
) -> np.ndarray:
    """Multithreaded native codebook training; same contract as
    million_tpu.pq.kmeans.train_pq. Raises RuntimeError if no native lib."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pqlib unavailable: {_unavailable}")
    x = np.ascontiguousarray(samples, np.float32)
    n, d = x.shape
    C = 2**nbits
    out = np.empty((M, C, d // M), np.float32)
    rc = lib.pq_train(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, M, C, iters,
        seed, _LAYOUTS[layout],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"pq_train failed (rc={rc}); check n >= C and d % M == 0")
    return out


def encode_native(
    x: np.ndarray, cents: np.ndarray, layout: str = "contiguous"
) -> np.ndarray:
    """Batch nearest-centroid encode on host threads; same contract as
    pq.ops.pq_encode (token-major output)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native pqlib unavailable: {_unavailable}")
    xx = np.ascontiguousarray(x, np.float32)
    shape = xx.shape
    n = int(np.prod(shape[:-1]))
    d = shape[-1]
    cc = np.ascontiguousarray(cents, np.float32)
    M, C, d_m = cc.shape
    out = np.empty((n, M), np.uint8)
    rc = lib.pq_encode(
        xx.reshape(-1, d).ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
        cc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), M, C,
        _LAYOUTS[layout],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"pq_encode failed (rc={rc})")
    return out.reshape(*shape[:-1], M)
