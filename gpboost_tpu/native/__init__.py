"""Native (C++) runtime components: multithreaded data loading.

The compute path is JAX/XLA; IO stays native like the reference's
``src/LightGBM/io`` layer. The shared library is compiled on first use with
the system toolchain and cached next to this file; everything degrades
gracefully to numpy if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB = os.path.join(_HERE, "libgpbloader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _ensure_built():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", _SRC, "-o", _LIB],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.gpb_parse_csv.restype = ctypes.POINTER(ctypes.c_double)
            lib.gpb_parse_csv.argtypes = [
                ctypes.c_char_p, ctypes.c_char, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int]
            lib.gpb_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except OSError:
            _build_failed = True
            return None
    return _lib


def load_table(path: str, sep: str = "", has_header: bool = False,
               num_threads: int = 0) -> np.ndarray:
    """Parse a CSV/TSV numeric file into a [rows, cols] float64 array.

    Uses the native multithreaded parser when available, otherwise numpy.
    ``sep=""`` auto-detects tab vs comma.
    """
    lib = _ensure_built()
    if lib is None:
        return np.genfromtxt(path, delimiter=(sep or None),
                             skip_header=1 if has_header else 0)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    sep_b = sep.encode()[:1] if sep else b"\x00"
    ptr = lib.gpb_parse_csv(path.encode(), ctypes.c_char(sep_b),
                            1 if has_header else 0, ctypes.byref(rows),
                            ctypes.byref(cols), num_threads)
    if not ptr:
        raise IOError(f"native loader failed to parse {path}")
    try:
        n, c = rows.value, cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n, c)).copy()
    finally:
        lib.gpb_free(ptr)
    return arr


def native_loader_available() -> bool:
    return _ensure_built() is not None


def load_libsvm(path: str, num_features: int = 0):
    """Parse a LibSVM-format file (``label idx:val idx:val ...``; 1-based or
    0-based indices autodetected) into (X [n, F] float64, y [n]).

    Reference: ``src/LightGBM/io/parser.cpp`` LibSVM branch. Host-side
    parser; missing entries are 0 like the reference's sparse semantics.
    """
    labels = []
    rows = []
    max_idx = -1
    min_idx = 1 << 30
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            labels.append(float(parts[0]))
            feats = []
            for tok in parts[1:]:
                i, v = tok.split(":", 1)
                i = int(i)
                feats.append((i, float(v)))
                max_idx = max(max_idx, i)
                min_idx = min(min_idx, i)
            rows.append(feats)
    one_based = min_idx >= 1
    F = max(num_features, max_idx + (0 if one_based else 1))
    X = np.zeros((len(rows), F))
    for r, feats in enumerate(rows):
        for i, v in feats:
            X[r, i - 1 if one_based else i] = v
    return X, np.asarray(labels)
