"""ctypes bindings for the native ingest library (fkingest.cpp).

Builds the shared library on first import if a compiler is available
(g++ -O3 -march=native); falls back cleanly when not — callers must check
``available()``.  The pure-python path in ingest.fasta remains the semantic
reference; tests assert byte-identical batches from both paths.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fkingest.cpp")
_SO = os.path.join(_DIR, "libfkingest.so")

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

    if not ensure_built(_SRC, _SO, extra_flags=("-lz",)):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    for fn in ("fk_parse_fasta", "fk_parse_fastq"):
        f = getattr(lib, fn)
        f.restype = ctypes.c_int64
        f.argtypes = [u8p, ctypes.c_int64, u8p, i64p, ctypes.c_int64]
    lib.fk_encode.restype = ctypes.c_int64
    lib.fk_encode.argtypes = [u8p, ctypes.c_int64, u8p]
    try:  # symbol added later than the parsers: a stale .so (mtime newer
        # than the source, e.g. copied artifacts) must degrade cleanly
        lib.fk_dump_lines.restype = ctypes.c_int64
        lib.fk_dump_lines.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), i64p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, u8p,
        ]
    except AttributeError:
        lib.fk_dump_lines = None
    try:  # stale .so guard, as above
        lib.fk_gunzip.restype = ctypes.c_int64
        lib.fk_gunzip.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
    except AttributeError:
        lib.fk_gunzip = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def parse_file(path: str, fmt: str = "fasta"):
    """Parse+encode a whole file natively.

    Returns (codes: uint8[n_total], rec_starts: int64[n_records+1]).
    Raises RuntimeError when the native library is unavailable or the file
    is malformed — callers fall back to the python parser.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.shape[0] >= 2 and raw[0] == 0x1F and raw[1] == 0x8B:
        raw = gunzip(raw)  # native zlib inflate (multi-member gzip)
    n = raw.shape[0]
    codes = np.empty(n, dtype=np.uint8)
    # record-count bound: one record per '>' / '@' header line, +1 slack
    max_recs = int((raw == (ord(">") if fmt == "fasta" else ord("@"))).sum()) + 2
    starts = np.empty(max_recs + 1, dtype=np.int64)
    fn = lib.fk_parse_fasta if fmt == "fasta" else lib.fk_parse_fastq
    nrec = fn(
        _as_u8p(raw),
        ctypes.c_int64(n),
        _as_u8p(codes),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(max_recs),
    )
    if nrec < 0:
        raise RuntimeError(f"native parse failed with code {nrec}")
    total = starts[nrec]
    return codes[:total], starts[: nrec + 1].copy()


def dump_lines(words: np.ndarray, counts: np.ndarray, k: int) -> bytes:
    """Decode packed k-mer rows + counts into ``<KMER>\\t<count>\\n`` bytes
    (the reference's per-bin line format) in one native pass."""
    lib = _load()
    if lib is None or lib.fk_dump_lines is None:
        raise RuntimeError("native library unavailable")
    words = np.ascontiguousarray(words, dtype=np.uint32)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n, W = words.shape
    out = np.empty(n * (k + 22), dtype=np.uint8)
    m = lib.fk_dump_lines(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n), ctypes.c_int32(k), ctypes.c_int32(W),
        _as_u8p(out),
    )
    return out[:m].tobytes()


def encode(data: bytes) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    raw = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(raw.shape[0], dtype=np.uint8)
    lib.fk_encode(_as_u8p(raw), ctypes.c_int64(raw.shape[0]), _as_u8p(out))
    return out


def gunzip(raw: np.ndarray) -> np.ndarray:
    """Native gzip inflate; grows the output buffer on -1 and retries."""
    lib = _load()
    if lib is None or lib.fk_gunzip is None:
        raise RuntimeError("native gunzip unavailable")
    cap = max(4 * int(raw.shape[0]), 1 << 16)
    while True:
        out = np.empty(cap, dtype=np.uint8)
        m = lib.fk_gunzip(
            _as_u8p(raw), ctypes.c_int64(raw.shape[0]),
            _as_u8p(out), ctypes.c_int64(cap),
        )
        if m == -1:
            cap *= 2
            continue
        if m < 0:
            raise RuntimeError(f"native gunzip failed with code {m}")
        return out[:m]


def has_gunzip() -> bool:
    lib = _load()
    return lib is not None and lib.fk_gunzip is not None
