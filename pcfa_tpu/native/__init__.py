"""Native (C++/OpenMP) host kernels with ctypes bindings.

The reference ships four C++/CUDA extension packages for its correlation /
warping kernels (SURVEY.md §2.5). On TPU those live in `pcfa_tpu/ops` as
XLA/Pallas programs; this package provides the native host-side builds —
compiled on first use with g++ — used as independent golden oracles in
kernel tests and as a CPU fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "correlation.cpp")
_LIB = os.path.join(_HERE, "_build", "libpcfa_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise RuntimeError(f"native build failed: {detail}") from e
    return _LIB


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        i64 = ctypes.c_int64
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.local_correlation_f32.argtypes = [fp, fp, fp, i64, i64, i64, i64, i64]
        lib.local_correlation_f32.restype = None
        lib.global_correlation_f32.argtypes = [fp, fp, fp, i64, i64, i64, i64,
                                               i64, i64]
        lib.global_correlation_f32.restype = None
        lib.native_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load()
        return True
    except RuntimeError:
        return False


def local_correlation(f1: np.ndarray, f2: np.ndarray, patch_size: int = 9
                      ) -> np.ndarray:
    """Native local correlation on (B, H, W, C) float32 arrays."""
    lib = load()
    f1 = np.ascontiguousarray(f1, np.float32)
    f2 = np.ascontiguousarray(f2, np.float32)
    B, H, W, C = f1.shape
    out = np.empty((B, H, W, patch_size * patch_size), np.float32)
    lib.local_correlation_f32(f1, f2, out, B, H, W, C, patch_size)
    return out


def global_correlation(f1: np.ndarray, f2: np.ndarray,
                       max_displacement: int = 20, stride2: int = 2
                       ) -> np.ndarray:
    """Native global correlation on (B, H, W, C) float32 arrays."""
    lib = load()
    f1 = np.ascontiguousarray(f1, np.float32)
    f2 = np.ascontiguousarray(f2, np.float32)
    B, H, W, C = f1.shape
    D = 2 * (max_displacement // stride2) + 1
    out = np.empty((B, H, W, D * D), np.float32)
    lib.global_correlation_f32(f1, f2, out, B, H, W, C, max_displacement,
                               stride2)
    return out
