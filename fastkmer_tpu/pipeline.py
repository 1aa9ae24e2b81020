"""Job orchestration — the TPU equivalent of ``executeJob``
(reference: SparkBinKmerCounter.scala:989-1046).

The Spark plan  ``mapPartitions(getSuperKmers) -> reduceByKey(shuffle) ->
foreachPartition(extractKXmers)``  becomes:

    host ingest -> fixed-shape code batches
      -> jit[ stage-1 extract + per-batch sort-count ]      (device)
      -> host compaction of per-batch unique partials
      -> final weighted merge                               (device or host)
      -> per-bin text/binary output                         (host)

Single-chip path here; the multi-chip path (shard_map + all-to-all bin
exchange, replacing the Spark shuffle) lives in ``parallel.exchange`` and is
driven by ``execute_job`` when a mesh is provided.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import JobConfig
from .core.bits import num_words
from .ingest import batch as batching
from .ops import count_sort, extract
from .output import writer
from .utils.timing import StageTimer
from .utils import jaxcache  # noqa: F401  (enables persistent XLA cache)


class CountResult(NamedTuple):
    words: np.ndarray  # [U, W] uint32 unique canonical k-mers, ascending
    counts: np.ndarray  # [U] int64
    bins: np.ndarray  # [U] int32
    n_instances: int  # total counted k-mer instances
    n_bases: int
    n_reads: int
    timings: dict


@partial(jax.jit, static_argnames=("k", "m", "B"))
def _batch_count(codes: jnp.ndarray, k: int, m: int, B: int) -> count_sort.SortedCounts:
    """One fused device step: extract all windows, sort, run-length count.

    The sort carries ONLY the key words (no bin/weight lanes) — bins are
    recomputed from the sorted words afterwards (ops.binhash), which costs
    elementwise VPU work instead of a permuted column per sort pass.
    """
    from .ops import binhash

    ex = extract.extract(codes, k, m, B)
    sc = count_sort.count_sorted(
        ex.words, None, ex.valid, sentinel_safe=count_sort.sentinel_safe_for(k)
    )
    return sc._replace(bins=binhash.bins_from_words(sc.words, k, m, B))


@partial(jax.jit, static_argnames=("k", "m", "B", "with_bins"))
def _batch_count_pallas(
    codes: jnp.ndarray, k: int, m: int, B: int, with_bins: bool = True
) -> count_sort.SortedCounts:
    """TPU fast path: fused Pallas stage-1 emitting pre-sentineled sort keys
    directly (k <= 32, k % 16 != 0).  ``with_bins=False`` defers the bin
    recomputation — the device accumulator computes bins once at finalize,
    so the per-batch pass is pure keys."""
    from .ops import binhash, pallas_extract

    cols = pallas_extract.extract_pallas_sentinel(codes, k, m, B)
    sc = count_sort.count_presentineled(cols)
    if with_bins:
        sc = sc._replace(bins=binhash.bins_from_words(sc.words, k, m, B))
    return sc


def pallas_count_available(k: int) -> bool:
    import os

    import jax as _jax

    from .ops import pallas_extract

    return (
        os.environ.get("FASTKMER_NO_PALLAS") != "1"
        and _jax.default_backend() not in ("cpu",)
        and pallas_extract.supported(k)
        and count_sort.sentinel_safe_for(k)
    )


@partial(jax.jit, static_argnames=("k", "m", "B"))
def _batch_count_ht(codes: jnp.ndarray, k: int, m: int, B: int):
    """HT-engine device step (useHT=1): fingerprint-keyed counting."""
    from .ops import count_hash

    ex = extract.extract(codes, k, m, B)
    return count_hash.count_hashed(ex.words, ex.bins, ex.valid)


@partial(jax.jit, static_argnames=())
def _to_merge_rows(sc: count_sort.SortedCounts):
    """SortedCounts -> (word cols, weights) in 'merge row' form: unique rows
    keep their words + total count, all other rows become sentinel/0."""
    W = sc.words.shape[1]
    ones = jnp.uint32(0xFFFFFFFF)
    cols = tuple(jnp.where(sc.is_start, sc.words[:, w], ones) for w in range(W))
    return cols, jnp.where(sc.is_start, sc.counts, 0)


@partial(jax.jit, static_argnames=())
def _merge_rows(cols: tuple, wts: jnp.ndarray):
    """Weighted dedup-sort of merge rows; returns (SortedCounts, n_unique)."""
    W = len(cols)
    valid = cols[W - 1] != jnp.uint32(0xFFFFFFFF)
    sc = count_sort.count_sorted(
        jnp.stack(cols, axis=1), None, valid, weights=wts, sentinel_safe=True
    )
    return sc, jnp.sum(sc.is_start.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cap",))
def _compact_rows(sc: count_sort.SortedCounts, cap: int):
    """Stream-compact unique rows of a merged table to a [cap] prefix.

    Order-preserving compaction without a sort or scatter (both the wrong
    shape on TPU — a scatter serializes, a second full sort doubles the
    merge cost): the j-th unique row sits at the first index where
    cumsum(is_start) == j+1, found with a vectorized binary search
    (ops.count_sort.compact_by_mask)."""
    W = sc.words.shape[1]
    cols = [sc.words[:, w] for w in range(W)] + [sc.counts]
    outs, _n = count_sort.compact_by_mask(sc.is_start, cols, cap)
    return tuple(outs[:W]), outs[W]


@partial(jax.jit, static_argnames=("k", "m", "B"))
def _stack_with_bins(cols: tuple, wts: jnp.ndarray, k: int, m: int, B: int) -> jnp.ndarray:
    """[cap] cols + weights -> one [cap, W+2] uint32 matrix (words, count,
    bin) so the host pull is a single contiguous transfer."""
    from .ops import binhash

    words = jnp.stack(cols, axis=1)
    bins = binhash.bins_from_words(words, k, m, B)
    return jnp.concatenate(
        [words, wts.astype(jnp.uint32)[:, None], bins.astype(jnp.uint32)[:, None]], axis=1
    )


class DeviceAccumulator:
    """Device-resident cross-batch merging.

    The Spark reference merges partials through the JVM shuffle; the naive
    TPU translation (pull every batch's table to the host, numpy-merge at
    the end) drowns in D2H — through a remote-device tunnel it is ~100x the
    device time.  This accumulator keeps per-batch unique tables ON DEVICE
    in 'merge row' form, periodically collapse-merges them with one weighted
    device sort, stream-compacts to the distinct-k-mer count, and pulls ONE
    stacked (words, count, bin) matrix at the end.
    """

    def __init__(
        self,
        k: int,
        fanin: int = 8,
        max_device_rows: int = 192_000_000,
        m: int = 10,
        B: int = 512,
    ):
        self.k = k
        self.W = num_words(k)
        self.m = m
        self.B = B
        self.fanin = fanin
        self.max_device_rows = max_device_rows
        self.parts: list = []  # (cols tuple, weights) on device
        self.rows = 0
        self.host_spills: list = []  # (words, counts) np arrays

    def add(self, sc: count_sort.SortedCounts) -> None:
        cols, wts = _to_merge_rows(sc)
        self.parts.append((cols, wts))
        self.rows += int(wts.shape[0])
        if len(self.parts) >= self.fanin:
            self._collapse(spill=self.rows > self.max_device_rows)

    def _collapse(self, spill: bool = False) -> None:
        if not self.parts:
            return
        if len(self.parts) == 1:
            cols, wts = self.parts[0]
        else:
            cols = tuple(
                jnp.concatenate([p[0][w] for p in self.parts]) for w in range(self.W)
            )
            wts = jnp.concatenate([p[1] for p in self.parts])
        # canonicalize the merge shape to the next power of two (sentinel
        # padding): every distinct input size would otherwise trigger a
        # fresh XLA compile, which dominates cold starts through the
        # remote-compile hop
        n_rows = wts.shape[0]
        cap_in = 1 << max(10, (n_rows - 1).bit_length())
        if cap_in != n_rows:
            pad = cap_in - n_rows
            cols = tuple(
                jnp.concatenate([c, jnp.full(pad, 0xFFFFFFFF, jnp.uint32)]) for c in cols
            )
            wts = jnp.concatenate([wts, jnp.zeros(pad, jnp.int32)])
        sc, n_u = _merge_rows(cols, wts)
        n_unique = int(np.asarray(n_u))  # one scalar transfer
        cap = 1 << max(10, (max(n_unique, 1) - 1).bit_length())
        ccols, cwts = _compact_rows(sc, cap)
        if spill:
            stacked = _stack_with_bins(ccols, cwts, self.k, self.m, self.B)
            table = np.asarray(stacked[:n_unique])  # ONE device-to-host transfer
            self.host_spills.append(
                (
                    table[:, : self.W],
                    table[:, self.W].astype(np.int64),
                    table[:, self.W + 1].astype(np.int32),
                )
            )
            self.parts = []
            self.rows = 0
        else:
            self.parts = [(ccols, cwts)]
            self.rows = cap

    def finalize(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (unique words [U, W] ascending, counts [U], bins [U]) on host."""
        self._collapse(spill=True)
        if not self.host_spills:
            return (
                np.zeros((0, self.W), np.uint32),
                np.zeros(0, np.int64),
                np.zeros(0, np.int32),
            )
        if len(self.host_spills) == 1:
            return self.host_spills[0]
        return merge_partials(self.host_spills, self.W)


def _compact(sc: count_sort.SortedCounts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Device SortedCounts -> host (unique words, counts, bins)."""
    is_start = np.asarray(sc.is_start)
    idx = np.flatnonzero(is_start)
    return (
        np.asarray(sc.words)[idx],
        np.asarray(sc.counts)[idx].astype(np.int64),
        np.asarray(sc.bins)[idx],
    )


def merge_partials(
    parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]], W: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host merge of per-batch unique tables: lexsort + reduceat.

    Semantically the cross-partition half of the reference's
    ``reduceByKey(_ ++ _)`` + heap merge; here the per-batch tables are
    already unique+sorted so merging is a weighted group-by."""
    words = np.concatenate([p[0] for p in parts], axis=0)
    counts = np.concatenate([p[1] for p in parts], axis=0)
    bins = np.concatenate([p[2] for p in parts], axis=0)
    if words.shape[0] == 0:
        return words, counts, bins
    order = np.lexsort(tuple(words[:, w] for w in reversed(range(W))))
    ws, cs, bs = words[order], counts[order], bins[order]
    new = np.empty(ws.shape[0], dtype=bool)
    new[0] = True
    np.any(ws[1:] != ws[:-1], axis=1, out=new[1:])
    starts = np.flatnonzero(new)
    return ws[starts], np.add.reduceat(cs, starts), bs[starts]


def count_batches(
    batches: Iterable[tuple[np.ndarray, int, int]],
    k: int,
    m: int,
    B: int,
    timer: StageTimer | None = None,
    engine: str = "sort",
    checkpointer=None,
    device_accumulate: bool | None = None,
) -> CountResult:
    timer = timer or StageTimer()
    parts = []
    n_reads = 0
    n_bases = 0
    W = num_words(k)
    skip = 0
    if checkpointer is not None:
        skip = checkpointer.completed_batches()
        parts.extend(checkpointer.load_parts())
    use_pallas = engine == "sort" and pallas_count_available(k)
    if device_accumulate is None:
        device_accumulate = (
            checkpointer is None
            and engine == "sort"
            and count_sort.sentinel_safe_for(k)
            and jax.default_backend() != "cpu"
        )
    device_accumulate = (
        device_accumulate and engine == "sort" and count_sort.sentinel_safe_for(k)
        and checkpointer is None
    )
    acc = DeviceAccumulator(k, m=m, B=B) if device_accumulate else None
    for batch_idx, (codes, nr, nb) in enumerate(batches):
        if batch_idx < skip:  # already counted before the interruption
            n_reads += nr
            n_bases += nb
            continue
        with timer.span("device_count"):
            if engine == "hash":
                sc, collision = _batch_count_ht(jnp.asarray(codes), k, m, B)
                if bool(collision):
                    from .ops.count_hash import FingerprintCollision

                    raise FingerprintCollision(
                        "64-bit fingerprint collision; re-run with the sort engine"
                    )
            elif use_pallas:
                sc = _batch_count_pallas(
                    jnp.asarray(codes), k, m, B, with_bins=acc is None
                )
            else:
                sc = _batch_count(jnp.asarray(codes), k, m, B)
        if acc is not None:
            with timer.span("device_merge"):
                acc.add(sc)
        else:
            with timer.span("host_compact"):
                part = _compact(sc)
                parts.append(part)
                if checkpointer is not None:
                    checkpointer.save_batch(batch_idx, *part)
        n_reads += nr
        n_bases += nb
    with timer.span("merge"):
        if acc is not None:
            words, counts, bins = acc.finalize()
        elif parts:
            words, counts, bins = merge_partials(parts, W)
        else:
            words = np.zeros((0, W), np.uint32)
            counts = np.zeros(0, np.int64)
            bins = np.zeros(0, np.int32)
    return CountResult(
        words, counts, bins, int(counts.sum()), n_bases, n_reads, timer.as_dict()
    )


def execute_job(
    cfg: JobConfig,
    verbose: bool = True,
    checkpoint_dir: str | None = None,
    trace_dir: str | None = None,
) -> CountResult:
    """Count k-mers in cfg.dataset and (optionally) write per-bin files.

    Mirrors the reference orchestrator's switch matrix
    (SparkBinKmerCounter.scala:1023-1044); the sort and HT engines must
    produce identical tables, so engine choice only affects the device step.

    ``checkpoint_dir`` enables batch-level resume (output.manifest);
    ``trace_dir`` wraps the run in a jax.profiler trace.
    ``use_kryo_serializer`` maps to the binary output format (the Kryo
    writer was the reference's binary variant, SparkBinKmerCounter.scala:557).
    """
    from .output import manifest as manifest_mod
    from .utils.timing import maybe_profile

    timer = StageTimer(verbose=False)
    if verbose:
        print(cfg.describe())
    ckpt = manifest_mod.BatchCheckpointer(checkpoint_dir) if checkpoint_dir else None
    from .ingest.prefetch import prefetched

    batches = prefetched(
        batching.batch_file(
            cfg.dataset, cfg.sequence_type, cfg.k, cfg.reads_per_batch, cfg.read_len
        )
    )
    engine = "hash" if cfg.use_ht else "sort"
    with maybe_profile(trace_dir):
        res = count_batches(
            batches, cfg.k, cfg.m, cfg.b, timer, engine=engine, checkpointer=ckpt
        )
    if cfg.write:
        with timer.span("write_output"):
            if cfg.use_kryo_serializer:
                writer.write_binary(cfg.output_dir, res.words, res.counts, res.bins, cfg.k)
            else:
                writer.write_bin_files(
                    cfg.output_dir, res.words, res.counts, res.bins, cfg.k,
                    eof_sentinel=not cfg.use_ht,
                )
            manifest_mod.write_manifest(
                cfg.output_dir, dataclasses_dict(cfg), res.words, res.counts, res.bins
            )
    if ckpt is not None:
        ckpt.clear()  # run completed; checkpoints no longer needed
    return res._replace(timings=timer.as_dict())


def dataclasses_dict(cfg: JobConfig) -> dict:
    import dataclasses

    return {k: v for k, v in dataclasses.asdict(cfg).items() if not callable(v)}


def repair_output(cfg: JobConfig, verbose: bool = True) -> dict:
    """Idempotent re-run of failed bins (SURVEY §5: the recovery mechanism
    the reference's commented-out bin bookkeeping gestured at,
    SparkBinKmerCounter.scala:608-639): verify the manifest, recount, and
    rewrite ONLY the missing/mismatched bin files."""
    from .output import manifest as manifest_mod

    status = manifest_mod.verify_output(cfg.output_dir)
    if status["ok"]:
        return status
    bad = set(status["missing"]) | set(status["mismatched"])
    if verbose:
        print(f"repairing {len(bad)} bins: {sorted(bad)}")
    # recount (pure) and rewrite only the bad bins
    res = execute_job(dataclasses_replace(cfg, write=False), verbose=False)
    sel = np.isin(res.bins, list(bad))
    writer.write_bin_files(
        cfg.output_dir, res.words[sel], res.counts[sel], res.bins[sel], cfg.k,
        eof_sentinel=not cfg.use_ht,
    )
    return manifest_mod.verify_output(cfg.output_dir)


def dataclasses_replace(cfg: JobConfig, **kw) -> JobConfig:
    import dataclasses

    return dataclasses.replace(cfg, **kw)
