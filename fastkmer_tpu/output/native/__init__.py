"""ctypes bindings for the native k-way merge (fkmerge.cpp).

Same build-on-first-import pattern as ingest.native: g++ when available,
clean fallback otherwise.  The numpy path in pipeline.merge_partials stays
the semantic reference; tests assert identical outputs.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fkmerge.cpp")
_SO = os.path.join(_DIR, "libfkmerge.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    # content-hash staleness (never mtimes): a binary is only trusted when
    # its sidecar hash proves it was built from THIS source on this machine
    from ...utils.nativebuild import ensure_built

    if not ensure_built(_SRC, _SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.fk_merge.restype = ctypes.c_int64
    lib.fk_merge.argtypes = [
        ctypes.POINTER(u32p), ctypes.POINTER(i64p), ctypes.POINTER(i32p),
        i64p, ctypes.c_int64, ctypes.c_int64, u32p, i64p, i32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def merge_sorted_parts(parts: list, W: int):
    """K-way merge of [(words [n,W] u32 ascending-unique, counts i64,
    bins i32), ...] -> (words, counts, bins) with equal keys summed.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    P = len(parts)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    wp = (u32p * P)()
    cp = (i64p * P)()
    bp = (i32p * P)()
    sizes = (ctypes.c_int64 * P)()
    keep = []  # hold contiguous buffers alive through the call
    total = 0
    for i, (w, c, b) in enumerate(parts):
        w = np.ascontiguousarray(w, dtype=np.uint32)
        c = np.ascontiguousarray(c, dtype=np.int64)
        b = np.ascontiguousarray(b, dtype=np.int32)
        keep.append((w, c, b))
        wp[i] = w.ctypes.data_as(u32p)
        cp[i] = c.ctypes.data_as(i64p)
        bp[i] = b.ctypes.data_as(i32p)
        sizes[i] = w.shape[0]
        total += w.shape[0]
    ow = np.empty((total, W), np.uint32)
    oc = np.empty(total, np.int64)
    ob = np.empty(total, np.int32)
    n = lib.fk_merge(
        wp, cp, bp, sizes, P, W,
        ow.ctypes.data_as(u32p), oc.ctypes.data_as(i64p), ob.ctypes.data_as(i32p),
    )
    return ow[:n], oc[:n], ob[:n]
