"""Distributed bin exchange — the TPU-native replacement for the Spark
shuffle (reference: ``reduceByKey``/``partitionBy`` at
SparkBinKmerCounter.scala:1031-1044).

Design (SURVEY.md §5 "Distributed communication backend"):

* reads are data-parallel over a 1-D device mesh axis ("data"), the
  analogue of HDFS-split parallelism (SparkBinKmerCounter.scala:1032);
* every chip extracts (bin, canonical k-mer) entries locally, then routes
  each entry to its bin's *owner chip* through one padded
  ``lax.all_to_all`` over ICI — arbitrary-size JVM shuffle payloads become
  fixed-capacity uint32 lanes;
* the owner table is either ``bin % n`` (hash partitioning) or the LPT map
  from the sampled histogram pre-pass (parallel.partitioner), closed over
  as a jit constant — the device-side ``Partitioner``;
* per-chip bin histograms are exchanged with ``psum`` (the analogue of the
  estimate job's ``reduceByKey(_+_).collect()``, :1024);
* overflowed capacity is *detected, never silent*: the step returns a
  psum'd dropped-entry count so the host can retry with a bigger ``cap``
  (the moral equivalent of Spark spilling, made explicit).

Grouping entries for the send buffer is itself sort-based (sort by owner)
so the whole step stays scatter-free except one unique-index write.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import count_sort, extract

AXIS = "data"


class ShardCounts(NamedTuple):
    """Per-chip counting result, stacked over the mesh axis.

    words:    [n, S, W]  sorted unique-run view per chip (S = n*cap slots)
    bins:     [n, S]
    is_start: [n, S]
    counts:   [n, S]
    n_valid:  [n]        counted instances per chip
    dropped:  []         total entries dropped by capacity overflow (global)
    """

    words: jnp.ndarray
    bins: jnp.ndarray
    is_start: jnp.ndarray
    counts: jnp.ndarray
    n_valid: jnp.ndarray
    dropped: jnp.ndarray


def _route_local(ex: extract.Extracted, owner_tab: jnp.ndarray, n: int, cap: int):
    """Group local entries by destination chip into an [n*cap, W+2] buffer.

    Returns (payload words [n*cap, W], bins [n*cap], ok [n*cap], n_dropped).
    """
    N, W = ex.words.shape
    owner = owner_tab[ex.bins]  # [N] int32
    sort_key = jnp.where(ex.valid, owner, n).astype(jnp.int32)
    cols = tuple(ex.words[:, w] for w in range(W)) + (ex.bins,)
    sorted_ = jax.lax.sort((sort_key,) + cols, num_keys=1, is_stable=False)
    skey = sorted_[0]
    swords = sorted_[1 : W + 1]
    sbins = sorted_[W + 1]

    hist = jnp.bincount(skey, length=n + 1)[:n].astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(hist)[:-1]])
    idx = jnp.arange(N, dtype=jnp.int32)
    in_range = skey < n
    rank = idx - offsets[jnp.clip(skey, 0, n - 1)]
    ok = in_range & (rank < cap)
    slot = jnp.where(ok, jnp.clip(skey, 0, n - 1) * cap + rank, n * cap)  # overflow -> trash row

    buf_words = jnp.zeros((n * cap + 1, W), jnp.uint32)
    buf_words = buf_words.at[slot].set(jnp.stack(swords, axis=1), mode="drop")
    buf_bins = jnp.zeros(n * cap + 1, jnp.int32).at[slot].set(sbins, mode="drop")
    buf_ok = jnp.zeros(n * cap + 1, jnp.uint32).at[slot].set(
        jnp.where(ok, jnp.uint32(1), jnp.uint32(0)), mode="drop"
    )
    n_dropped = jnp.sum((in_range & ~ok).astype(jnp.int32))
    return buf_words[:-1], buf_bins[:-1], buf_ok[:-1], n_dropped  # ok as uint32 (collective-safe)


def build_distributed_count(mesh: Mesh, k: int, m: int, B: int, cap: int, owner_map: np.ndarray):
    """Returns jit(step): codes [R, L] (sharded over rows) -> ShardCounts.

    One fused device program per chip: extract -> route -> all_to_all ->
    sort-count of owned bins.  ``cap`` is the per-(src,dst) entry capacity.

    The owner table rides as a replicated *argument*, not a closure
    constant: jax materializes closed-over device arrays during lowering,
    which is pathologically slow through remote-device tunnels.
    """
    n = mesh.shape[AXIS]
    owner_arr = np.asarray(owner_map, dtype=np.int32)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None), P()),
        out_specs=ShardCounts(
            words=P(AXIS), bins=P(AXIS), is_start=P(AXIS), counts=P(AXIS),
            n_valid=P(AXIS), dropped=P(),
        ),
    )
    def step(codes: jnp.ndarray, owner_tab: jnp.ndarray) -> ShardCounts:
        ex = extract.extract(codes, k, m, B)
        bw, bb, bok, ndrop = _route_local(ex, owner_tab, n, cap)
        # exchange: row block [d*cap:(d+1)*cap) goes to chip d
        rw = jax.lax.all_to_all(bw, AXIS, split_axis=0, concat_axis=0, tiled=True)
        rb = jax.lax.all_to_all(bb, AXIS, split_axis=0, concat_axis=0, tiled=True)
        rok = jax.lax.all_to_all(bok, AXIS, split_axis=0, concat_axis=0, tiled=True)
        sc = count_sort.count_sorted(
            rw, rb, rok == jnp.uint32(1), sentinel_safe=count_sort.sentinel_safe_for(k)
        )
        dropped = jax.lax.psum(ndrop, AXIS)
        return ShardCounts(
            words=sc.words[None], bins=sc.bins[None], is_start=sc.is_start[None],
            counts=sc.counts[None], n_valid=sc.n_valid[None], dropped=dropped,
        )

    jitted = jax.jit(step)
    return lambda codes: jitted(codes, owner_arr)


def estimate_bin_sizes(mesh: Mesh, k: int, m: int, B: int):
    """jit fn: codes [R, L] sharded -> int32[B] global per-bin k-mer counts.

    The TPU form of the sampled pre-pass
    (``getBinsEstimateSizes`` + ``reduceByKey(_+_).collect()``,
    SparkBinKmerCounter.scala:172-288, 1024): run it on a sampled subset of
    batches, feed the result to partitioner.lpt_owner_map.
    """

    @partial(jax.shard_map, mesh=mesh, in_specs=P(AXIS, None), out_specs=P())
    def est(codes: jnp.ndarray) -> jnp.ndarray:
        ex = extract.extract(codes, k, m, B)
        hist = count_sort.bin_histogram(ex.bins, ex.valid, B)
        return jax.lax.psum(hist, AXIS)

    return jax.jit(est)


def shard_batch(mesh: Mesh, codes: np.ndarray):
    """Place a [R, L] host batch row-sharded over the mesh."""
    return jax.device_put(codes, NamedSharding(mesh, P(AXIS, None)))


def compact_shard_counts(sc: ShardCounts):
    """Host: ShardCounts -> list per chip of (words, counts, bins) uniques."""
    words = np.asarray(sc.words)
    bins = np.asarray(sc.bins)
    is_start = np.asarray(sc.is_start)
    counts = np.asarray(sc.counts)
    out = []
    for c in range(words.shape[0]):
        idx = np.flatnonzero(is_start[c])
        out.append((words[c][idx], counts[c][idx].astype(np.int64), bins[c][idx]))
    return out
