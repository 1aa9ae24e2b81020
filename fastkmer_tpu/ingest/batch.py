"""Fixed-shape device batching of encoded reads.

Everything dynamic in the reference (per-read ArrayBuffers, iterator
pipelines) becomes fixed-capacity [R, L] uint8 code matrices here, padded
with the invalid code 4.  Because downstream window validity is simply
"window contains no code >= 4" (the array form of the reference's N-split,
SparkBinKmerCounter.scala:78-97), invalid padding needs no separate length
mask: tail windows poison themselves.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np

from ..core import bits


def batch_codes(
    reads: Iterable[bytes | np.ndarray],
    reads_per_batch: int,
    read_len: int,
) -> Iterator[Tuple[np.ndarray, int, int]]:
    """Pack encoded reads ONE PER ROW into [R, L] uint8 batches padded with
    INVALID_CODE.

    Yields (codes, n_reads, n_bases) per batch; the final batch is padded
    with empty rows so every batch has identical shape (one jit trace).
    Reads longer than ``read_len`` must have been chunked upstream
    (ingest.fasta.iter_reads); a longer read raises.

    Row-per-read keeps a read <-> row correspondence (needed by multiseq's
    per-row sequence ids); the counting drivers use ``batch_codes_dense``.
    """
    buf = np.full((reads_per_batch, read_len), bits.INVALID_CODE, dtype=np.uint8)
    row = 0
    n_bases = 0
    for r in reads:
        codes = r if isinstance(r, np.ndarray) else bits.encode_ascii(r)
        if codes.shape[0] > read_len:
            raise ValueError(f"read of length {codes.shape[0]} > batch read_len {read_len}")
        buf[row, : codes.shape[0]] = codes
        n_bases += codes.shape[0]
        row += 1
        if row == reads_per_batch:
            yield buf, row, n_bases
            buf = np.full((reads_per_batch, read_len), bits.INVALID_CODE, dtype=np.uint8)
            row = 0
            n_bases = 0
    if row > 0:
        yield buf, row, n_bases


class _DensePacker:
    """Greedy row filler: multiple reads per row, separated by ONE
    INVALID_CODE cell.

    Exactness: a k-window crossing a separator contains code 4 and is
    discarded by the same validity logic that splits on 'N' runs
    (the array form of firstAndLastOccurrenceOfInvalidNucleotide,
    reference: package.scala:739-754) — so record boundaries cost one
    wasted cell instead of a whole padded row.  With 150 bp reads and the
    default 4096-base rows, utilization goes from ~3.7% (row-per-read) to
    ~97%, i.e. ~26x less device work per base.
    """

    def __init__(self, reads_per_batch: int, read_len: int):
        self.R, self.L = reads_per_batch, read_len
        self._new()

    def _new(self):
        self.buf = np.full((self.R, self.L), bits.INVALID_CODE, dtype=np.uint8)
        self.row = 0
        self.col = 0
        self.n_reads = 0
        self.n_bases = 0

    def add(self, codes: np.ndarray):
        """Place one encoded read; yields a full batch when one completes."""
        n = codes.shape[0]
        if n > self.L:
            raise ValueError(f"read of length {n} > batch read_len {self.L}")
        need = n if self.col == 0 else n + 1  # +1 separator cell
        if self.col + need > self.L:
            self.row += 1
            self.col = 0
            need = n
            if self.row == self.R:
                out = (self.buf, self.n_reads, self.n_bases)
                self._new()
                yield out
        start = self.col + (need - n)
        self.buf[self.row, start : start + n] = codes
        self.col = start + n
        self.n_reads += 1
        self.n_bases += n

    def flush(self):
        if self.n_reads:
            yield self.buf, self.n_reads, self.n_bases
            self._new()


class _TaggedDensePacker:
    """_DensePacker variant for multisequence ingest: every row is
    dedicated to ONE sequence id (the row's reads may differ, their tag may
    not), so a per-ROW sid array is enough to label every extracted window
    — dense packing and per-read sequence attribution stop conflicting.
    Rows switch (wasting only the row tail) when the incoming tag differs.
    """

    def __init__(self, reads_per_batch: int, read_len: int):
        self.R, self.L = reads_per_batch, read_len
        self._new()

    def _new(self):
        self.buf = np.full((self.R, self.L), bits.INVALID_CODE, dtype=np.uint8)
        self.sids = np.zeros(self.R, dtype=np.int32)
        self.row = 0
        self.col = 0
        self.n_reads = 0
        self.n_bases = 0

    def _advance_row(self):
        self.row += 1
        self.col = 0
        if self.row == self.R:
            out = (self.buf, self.sids, self.n_reads, self.n_bases)
            self._new()
            return out
        return None

    def add(self, codes: np.ndarray, tag: int):
        n = codes.shape[0]
        if n > self.L:
            raise ValueError(f"read of length {n} > batch read_len {self.L}")
        if self.col > 0 and tag != int(self.sids[self.row]):
            full = self._advance_row()
            if full is not None:
                yield full
        need = n if self.col == 0 else n + 1  # +1 separator cell
        if self.col + need > self.L:
            full = self._advance_row()
            if full is not None:
                yield full
            need = n
        start = self.col + (need - n)
        self.buf[self.row, start : start + n] = codes
        self.sids[self.row] = tag
        self.col = start + n
        self.n_reads += 1
        self.n_bases += n

    def flush(self):
        if self.n_reads:
            yield self.buf, self.sids, self.n_reads, self.n_bases
            self._new()


def batch_codes_dense_tagged(
    tagged_reads: Iterable[tuple[int, bytes | np.ndarray]],
    reads_per_batch: int,
    read_len: int,
) -> Iterator[Tuple[np.ndarray, np.ndarray, int, int]]:
    """(sid, read) stream -> (codes [R, L], sids [R], n_reads, n_bases)
    batches, densely packed with one-sequence-per-row (_TaggedDensePacker)."""
    packer = _TaggedDensePacker(reads_per_batch, read_len)
    for tag, r in tagged_reads:
        codes = r if isinstance(r, np.ndarray) else bits.encode_ascii(r)
        yield from packer.add(codes, tag)
    yield from packer.flush()


def batch_codes_dense(
    reads: Iterable[bytes | np.ndarray],
    reads_per_batch: int,
    read_len: int,
) -> Iterator[Tuple[np.ndarray, int, int]]:
    """Like batch_codes but densely packed (see _DensePacker): identical
    count tables, up to read_len/avg_read_len times fewer batches."""
    packer = _DensePacker(reads_per_batch, read_len)
    for r in reads:
        codes = r if isinstance(r, np.ndarray) else bits.encode_ascii(r)
        yield from packer.add(codes)
    yield from packer.flush()


def batch_file(
    path: str,
    sequence_type: int,
    k: int,
    reads_per_batch: int,
    read_len: int,
    use_native: bool | None = None,
    dense: bool = True,
) -> Iterator[Tuple[np.ndarray, int, int]]:
    """File -> fixed-shape code batches (short or long sequence mode).

    Prefers the native C++ parse+encode path (ingest.native) when built and
    the file is a plain FASTA/FASTQ; falls back to the python parser
    (which also handles gzip).  Both paths produce identical batches.

    ``dense`` (default) packs several records per row with one-invalid-cell
    separators — identical count tables, ~read_len/avg_read_len fewer
    batches for short reads; set False for a read <-> row correspondence.
    """
    from . import fasta

    if use_native is not False:
        try:
            from . import native

            with open(path, "rb") as f:
                magic = f.read(2)
            gz = magic == b"\x1f\x8b"
            if native.available() and (not gz or native.has_gunzip()):
                fmt = fasta.sniff_format(path)
                codes, starts = native.parse_file(path, fmt)
                return _batches_from_parsed(
                    codes, starts, k, reads_per_batch, read_len, dense
                )
        except Exception:
            if use_native:
                raise
    reads = (seq for _, seq in fasta.iter_reads(path, sequence_type, k, chunk_len=read_len))
    packer = batch_codes_dense if dense else batch_codes
    return packer(reads, reads_per_batch, read_len)


def _batches_from_parsed(
    codes: np.ndarray, starts: np.ndarray, k: int, reads_per_batch: int,
    read_len: int, dense: bool = True,
) -> Iterator[Tuple[np.ndarray, int, int]]:
    """Assemble batches from natively parsed (codes, record offsets):
    records longer than read_len are chunked with k-1 overlap (the long-mode
    PartialSequence semantics), shorter ones pass through."""
    stride = read_len - (k - 1)
    rows: list[tuple[int, int]] = []  # (offset, length)
    for i in range(starts.shape[0] - 1):
        off, end = int(starts[i]), int(starts[i + 1])
        ln = end - off
        if ln <= read_len:
            rows.append((off, ln))
        else:
            pos = off
            while pos < end:
                rows.append((pos, min(read_len, end - pos)))
                if pos + read_len >= end:
                    break
                pos += stride

    if dense:
        packer = _DensePacker(reads_per_batch, read_len)
        for off, ln in rows:
            yield from packer.add(codes[off : off + ln])
        yield from packer.flush()
        return

    buf = np.full((reads_per_batch, read_len), bits.INVALID_CODE, dtype=np.uint8)
    row = 0
    n_bases = 0
    for off, ln in rows:
        buf[row, :ln] = codes[off : off + ln]
        n_bases += ln
        row += 1
        if row == reads_per_batch:
            yield buf, row, n_bases
            buf = np.full((reads_per_batch, read_len), bits.INVALID_CODE, dtype=np.uint8)
            row = 0
            n_bases = 0
    if row > 0:
        yield buf, row, n_bases
