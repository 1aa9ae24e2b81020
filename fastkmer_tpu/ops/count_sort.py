"""Sort-based exact counting (the reduce side, default engine).

TPU re-design of the reference's sort path (``extractKXmers``,
SparkBinKmerCounter.scala:428-660): the reference expands super-k-mers into
(k,x)-mer run buckets, quicksorts each, and streams a heap-merge of shifted
scanners (RIndex / priorityQueueWithIndexes, package.scala:562-681).  All of
that machinery exists to enumerate k-mers in globally sorted order so equal
runs become counts.  On TPU the same output semantics collapse to:

    lax.sort on (validity, word_0..word_{W-1}) keys   # bitonic, MXU-free
    run-boundary detection + run-length via reverse cummin

with no scatter, no heap, no dynamic shapes.  Invalid entries carry a 1 in
the leading key word so they sort strictly after every real k-mer and can
never merge with an all-T k-mer (whose words can equal the sentinel).

The bin id rides along as a sort *value* (all equal k-mers share a bin since
the signature is a pure function of the k-mer string — SURVEY.md §0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SortedCounts(NamedTuple):
    """Sorted unique-run view over N input slots.

    words:    [N, W] uint32 sorted k-mer words (valid first, then sentinels)
    bins:     [N]    int32 bin of each row
    is_start: [N]    bool  True at the first row of each distinct valid k-mer
    counts:   [N]    int32 run length, meaningful where is_start
    n_valid:  []     int32 total number of valid k-mer instances
    """

    words: jnp.ndarray
    bins: jnp.ndarray
    is_start: jnp.ndarray
    counts: jnp.ndarray
    n_valid: jnp.ndarray


def count_sorted(
    words: jnp.ndarray,
    bins: jnp.ndarray | None,
    valid: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    sentinel_safe: bool = False,
) -> SortedCounts:
    """words [N, W] uint32, valid [N] bool -> SortedCounts.

    ``bins`` ([N] int32) and ``weights`` ([N] int32) are OPTIONAL carried
    columns — every extra column is permuted by every pass of the device
    sort, so callers that can recompute bins from the unique words
    (ops.binhash.bins_from_words) or that count unweighted instances should
    pass None; the returned SortedCounts.bins is then None and counts are
    plain run lengths.

    ``weights`` generalizes instance counting to *merging* pre-counted
    partials: feeding back unique k-mers with their counts as weights sums
    counts per k-mer — used to combine batches and, across chips,
    all-to-all'd partial tables.

    ``sentinel_safe=True`` (valid when k % 16 != 0, i.e. the last word has
    zero pad bits) drops the leading validity key: invalid rows are rewritten
    to all-ones words, which no real k-mer can equal because its last word
    always has low zero bits.  One fewer sort key = one fewer permuted
    column per bitonic pass.
    """
    N, W = words.shape
    values: list = []
    if bins is not None:
        values.append(bins)
    if weights is not None:
        values.append(jnp.where(valid, weights.astype(jnp.int32), 0))
    if sentinel_safe:
        ones = jnp.uint32(0xFFFFFFFF)
        wcols = [jnp.where(valid, words[:, w], ones) for w in range(W)]
        out = jax.lax.sort(tuple(wcols) + tuple(values), num_keys=W, is_stable=False)
        swords = out[:W]
        svals = out[W:]
        svalid = swords[W - 1] != jnp.uint32(0xFFFFFFFF)
    else:
        flag = jnp.where(valid, jnp.uint32(0), jnp.uint32(1))
        keys = [flag] + [words[:, w] for w in range(W)]
        out = jax.lax.sort(tuple(keys) + tuple(values), num_keys=W + 1, is_stable=False)
        swords = out[1 : W + 1]
        svals = out[W + 1 :]
        svalid = out[0] == jnp.uint32(0)
    sbins = svals[0] if bins is not None else None
    sw = svals[-1] if weights is not None else None

    diff = jnp.zeros(N, dtype=bool).at[0].set(True)
    for w in range(W):
        diff = diff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), swords[w][1:] != swords[w][:-1]]
        )
    diff = diff | jnp.concatenate([jnp.zeros(1, dtype=bool), svalid[1:] != svalid[:-1]])
    is_start = diff & svalid

    # run extent via the next-boundary index (suffix cummin)
    idx = jnp.arange(N, dtype=jnp.int32)
    bpos = jnp.where(diff, idx, jnp.int32(N))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(jnp.concatenate([bpos[1:], jnp.full(1, N, jnp.int32)]))))
    if weights is None:
        counts = jnp.where(is_start, nxt - idx, 0)  # plain run length
        n_valid = jnp.sum(svalid.astype(jnp.int32))
    else:
        cw = jnp.flip(jnp.cumsum(jnp.flip(sw)))  # cw[i] = sum_{j>=i} sw[j]
        cw_ext = jnp.concatenate([cw, jnp.zeros(1, jnp.int32)])
        counts = jnp.where(is_start, cw - cw_ext[nxt], 0)
        n_valid = jnp.sum(sw)

    return SortedCounts(
        words=jnp.stack(swords, axis=1),
        bins=sbins,
        is_start=is_start,
        counts=counts,
        n_valid=n_valid,
    )


def count_presentineled(cols: list, weights: jnp.ndarray | None = None) -> SortedCounts:
    """Count from pre-sentineled key columns (invalid rows already all-ones,
    e.g. from ops.pallas_extract.extract_pallas_sentinel or accumulator
    merge rows): sorts the bare keys and derives validity from the sentinel
    — zero pre-sort rewrites.  ``weights`` (int32, already 0 on sentinel
    rows) turns run-length counting into weighted merging.  bins in the
    result are None."""
    W = len(cols)
    N = cols[0].shape[0]
    ops = tuple(cols) + (() if weights is None else (weights,))
    out = jax.lax.sort(ops, num_keys=W, is_stable=False)
    swords = out[:W]
    svalid = swords[W - 1] != jnp.uint32(0xFFFFFFFF)

    diff = jnp.zeros(N, dtype=bool).at[0].set(True)
    for w in range(W):
        diff = diff | jnp.concatenate(
            [jnp.ones(1, dtype=bool), swords[w][1:] != swords[w][:-1]]
        )
    is_start = diff & svalid

    idx = jnp.arange(N, dtype=jnp.int32)
    bpos = jnp.where(diff, idx, jnp.int32(N))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(jnp.concatenate([bpos[1:], jnp.full(1, N, jnp.int32)]))))
    if weights is None:
        counts = jnp.where(is_start, nxt - idx, 0)
        n_valid = jnp.sum(svalid.astype(jnp.int32))
    else:
        sw = out[W]
        cw = jnp.flip(jnp.cumsum(jnp.flip(sw)))  # cw[i] = sum_{j>=i} sw[j]
        cw_ext = jnp.concatenate([cw, jnp.zeros(1, jnp.int32)])
        counts = jnp.where(is_start, cw - cw_ext[nxt], 0)
        n_valid = jnp.sum(sw)

    return SortedCounts(
        words=jnp.stack(swords, axis=1),
        bins=None,
        is_start=is_start,
        counts=counts,
        n_valid=n_valid,
    )


def sentinel_safe_for(k: int) -> bool:
    """True when the last packed word has zero pad bits (k % 16 != 0), so
    the all-ones sentinel cannot collide with any real k-mer."""
    return k % 16 != 0


def bin_histogram(bins: jnp.ndarray, valid: jnp.ndarray, B: int) -> jnp.ndarray:
    """Per-bin k-mer instance counts — the array form of the reference's
    sampled estimate pre-pass (``getBinsEstimateSizes``,
    SparkBinKmerCounter.scala:172-288) and of the binSizes upper bound used
    to size hash tables (:290-426)."""
    return jnp.bincount(
        jnp.where(valid, bins, B), weights=None, length=B + 1
    )[:B].astype(jnp.int32)
