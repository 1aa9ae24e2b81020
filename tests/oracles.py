"""Brute-force Python oracles for exactness testing.

These mirror the *semantics* of the reference pipeline (what k-mers get
counted, canonicalization, signature, binning) in the most obvious possible
way, so device results can be diffed against them.  They intentionally share
no code with the array implementations:

* canonical form uses plain string reverse-complement + min() — vs the
  reference's getOrientation two-pointer compare (package.scala:702-728);
* signature scans every m-window with the table from fill_norm — vs the
  rolling Mmer / lastM incremental update (SparkBinKmerCounter.scala:98-139);
* counting is a dict over every clean window — vs super-k-mer + (k,x)-mer
  sort/merge (SparkBinKmerCounter.scala:428-660).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from fastkmer_tpu.core import bits

_COMP = str.maketrans("ACGT", "TGCA")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def canonical(s: str) -> str:
    return min(s, revcomp(s))


def clean_kmers(read: str, k: int):
    """All k-length windows consisting only of ACGT (uppercase)."""
    for i in range(len(read) - k + 1):
        w = read[i : i + k]
        if all(c in "ACGT" for c in w):
            yield w


def mmer_value(s: str) -> int:
    v = 0
    for c in s:
        v = (v << 2) | "ACGT".index(c)
    return v


def signature(kmer: str, m: int, norm) -> int:
    """min over m-windows of norm[m-mer] (reference getSignature,
    package.scala:337-357 — value only; position is irrelevant to binning)."""
    return min(int(norm[mmer_value(kmer[i : i + m])]) for i in range(len(kmer) - m + 1))


def count_reads(reads, k: int) -> Counter:
    """Canonical k-mer -> count over all clean windows of all reads."""
    c: Counter = Counter()
    for r in reads:
        for w in clean_kmers(r, k):
            c[canonical(w)] += 1
    return c


def count_reads_binned(reads, k: int, m: int, B: int):
    """bin -> {canonical k-mer -> count}, the per-bin-file ground truth."""
    norm = bits.fill_norm(m)
    out: dict[int, Counter] = defaultdict(Counter)
    for r in reads:
        for w in clean_kmers(r, k):
            b = bits.hash_to_bucket(signature(w, m, norm), B)
            out[b][canonical(w)] += 1
    return dict(out)
