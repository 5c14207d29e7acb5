"""ctypes bindings for the C++ host data engine (native/host_data.cpp).

Falls back to numpy transparently when the shared library hasn't been built
(``make -C native``). The engine parallelizes the host-side bulk uint8 work
that sits between disk and the device: row gathers for transfer batches,
exemplar-buffer concat, and deterministic shuffles.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libhostdata.so"),
    os.path.join(os.path.dirname(__file__), "libhostdata.so"),
]


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _SO_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.lct_gather_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_int64,
                ]
                lib.lct_concat_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ]
                lib.lct_shuffled_indices.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _lib() is not None


def gather_rows(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """out[i] = src[indices[i]] — multithreaded for uint8 row blocks."""
    lib = _lib()
    row_bytes = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    small = len(indices) * row_bytes < (1 << 20)  # ctypes overhead dominates
    if lib is None or small or src.dtype != np.uint8 or not src.flags.c_contiguous:
        return src[indices]
    idx = np.ascontiguousarray(indices, np.int64)
    n = src.shape[0]
    if idx.size:
        # the C memcpy loop does no bounds checks — resolve numpy's negative
        # indexing here and refuse out-of-range values so the native path has
        # exactly the fallback's semantics instead of undefined behavior
        idx = np.where(idx < 0, idx + n, idx)
        lo, hi = int(idx.min()), int(idx.max())
        if lo < 0 or hi >= n:
            raise IndexError(
                f"gather_rows: index out of range for {n} rows "
                f"(resolved min {lo}, max {hi})"
            )
    out = np.empty((len(idx),) + src.shape[1:], np.uint8)
    row_bytes = int(np.prod(src.shape[1:]))
    lib.lct_gather_u8(
        src.ctypes.data, idx.ctypes.data, out.ctypes.data, len(idx), row_bytes
    )
    return out


def concat_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _lib()
    if (
        lib is None
        or a.dtype != np.uint8
        or b.dtype != np.uint8
        or a.shape[1:] != b.shape[1:]
        or not (a.flags.c_contiguous and b.flags.c_contiguous)
    ):
        return np.concatenate([a, b])
    out = np.empty((len(a) + len(b),) + a.shape[1:], np.uint8)
    row_bytes = int(np.prod(a.shape[1:]))
    lib.lct_concat_u8(
        a.ctypes.data, len(a), b.ctypes.data, len(b), out.ctypes.data, row_bytes
    )
    return out


def _xorshift_permutation(n: int, seed: int) -> np.ndarray:
    """Pure-python mirror of host_data.cpp lct_shuffled_indices: splitmix64
    seed mix + xorshift64* Fisher-Yates. Exactly the native stream, so a
    seeded run produces the SAME batch order whether or not libhostdata.so
    is built on the machine."""
    mask = (1 << 64) - 1
    s = (seed + 0x9E3779B97F4A7C15) & mask
    s = ((s ^ (s >> 30)) * 0xBF58476D1CE4E5B9) & mask
    s = ((s ^ (s >> 27)) * 0x94D049BB133111EB) & mask
    s ^= s >> 31
    if not s:
        s = 0x9E3779B97F4A7C15
    out = np.arange(n, dtype=np.int64)
    for i in range(n - 1, 0, -1):
        s ^= s >> 12
        s = (s ^ (s << 25)) & mask
        s ^= s >> 27
        r = (s * 0x2545F4914F6CDD1D) & mask
        j = r % (i + 1)
        out[i], out[j] = out[j], out[i]
    return out


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    lib = _lib()
    if lib is None:
        return _xorshift_permutation(n, seed)
    out = np.empty((n,), np.int64)
    # the C++ side remaps a 0 state internally (host_data.cpp); clamping
    # here would collapse seeds 0 and 1 onto the same stream
    lib.lct_shuffled_indices(out.ctypes.data, n, np.uint64(seed))
    return out
