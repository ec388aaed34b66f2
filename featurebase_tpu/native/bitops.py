"""ctypes wrapper for the C++ host-side bitmap hot paths (bitops.cpp),
with numpy fallbacks.  Same build-on-demand pattern as the roaring codec
(native/roaring.py): first use compiles the shared object with g++; any
failure falls back to the pure-numpy implementations in ops/bitwise.py."""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _so_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libbitops.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if sys.byteorder != "little":
        return None  # the 64-bit reinterpret assumes little-endian words
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _so_path()
        src = os.path.join(os.path.dirname(__file__), "bitops.cpp")
        if not os.path.exists(so) or (os.path.exists(src) and
                                      os.path.getmtime(src) >
                                      os.path.getmtime(so)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True, timeout=120)
            except Exception:  # noqa: BLE001
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        lib.bitops_words_to_cols.restype = ctypes.c_longlong
        lib.bitops_words_to_cols.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.bitops_cols_to_words.restype = None
        lib.bitops_cols_to_words.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t]
        lib.bitops_popcount.restype = ctypes.c_longlong
        lib.bitops_popcount.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        _lib = lib
        return _lib


def words_to_cols(words: np.ndarray, base: int = 0) -> Optional[np.ndarray]:
    """Native set-bit decode; None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(words.reshape(-1), dtype=np.uint32)
    n_set = int(lib.bitops_popcount(w.ctypes.data, w.size))
    out = np.empty(n_set, dtype=np.uint64)
    got = lib.bitops_words_to_cols(w.ctypes.data, w.size,
                                   ctypes.c_uint64(base),
                                   out.ctypes.data, n_set)
    if got != n_set:
        return None  # racing mutation; fall back
    return out


def cols_to_words(cols: np.ndarray, n_words: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(cols, dtype=np.int64)
    out = np.zeros(n_words, dtype=np.uint32)
    lib.bitops_cols_to_words(c.ctypes.data, c.size, out.ctypes.data,
                             out.size)
    return out
