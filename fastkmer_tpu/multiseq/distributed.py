"""Distributed multisequence counting over a device mesh.

The reference's multiseq job is the same shuffle with sequence-tagged
payloads (``aggregateByKey``, SparkMultiSequenceKmerCounter.scala:587-588);
here the sequence id rides the all-to-all as one extra uint32 lane
(parallel.stream.DistributedCounter with_seq=True) and the owner chips keep
device-resident (k-mer, seq) count tables across batches — the same
extra-key-word trick as the single-chip path.  Distances are accumulated
host-side from the merged table (multiseq.pipeline.accumulate_distances)
and, unlike the reference (README.md:126), actually aggregated and
returned.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh

from ..core.bits import num_words
from ..parallel import exchange
from .pipeline import _sequence_tag

AXIS = exchange.AXIS


def execute_multiseq_job_distributed(cfg, mesh: Mesh, cap: int | None = None,
                                     verbose: bool = True,
                                     checkpoint_dir: str | None = None,
                                     checkpoint_interval: int = 32,
                                     unique_ub: int | None = None,
                                     prededup: bool | None = None,
                                     keep_table: bool = False):
    """Multi-chip execute_multiseq_job (same MultiseqConfig / result type).

    Honors ``use_custom_partitioner``/``num_partition_tasks`` with the same
    sampled LPT pre-pass as the counting driver — the reference multiseq
    orchestrator supports the custom partitioner too
    (SparkMultiSequenceKmerCounter.scala:580-583).  Ingest uses tagged DENSE
    row packing (multiple reads per row, one sequence per row), and the
    exchange capacity is sized from the sampled histogram, not worst-case.

    ``checkpoint_dir`` enables kill-and-resume via the same spill-flow
    checkpoints as the counting driver; ``unique_ub`` (a bound on distinct
    (k-mer, sequence) PAIRS) enables the sync-free feed.  ``prededup``
    selects the duplication-aware exchange transport (the seq id is a key
    lane, so dedup counts (k-mer, seq) pairs locally before routing);
    None = adaptive probing, the counting driver's default.
    """
    from ..ingest import batch as batching, fasta
    from ..utils.timing import StageTimer
    from . import distances as dist_mod
    from .pipeline import (MultiseqResult, _write_multiseq_output,
                           accumulate_distances)

    timer = StageTimer()
    measure = dist_mod.get_measure(cfg.distance_measure)
    import jax

    if jax.process_count() > 1:
        # the multiseq driver's ingest is not striped across processes and
        # its distance accumulation is per-process — running it multi-host
        # would double-count and emit partial distances.  Explicit error
        # instead of silent corruption; the count job supports multi-host.
        raise NotImplementedError(
            "distributed multiseq runs on a single-process mesh; multi-host "
            "ingest striping + distance aggregation are not wired for it"
        )
    n = mesh.shape[AXIS]
    W = num_words(cfg.k)
    R = -(-cfg.reads_per_batch // n) * n
    L = cfg.read_len
    from ..parallel import exchange as ex_mod, partitioner, stream

    seq_names: list[str] = []
    name_to_id: dict[str, int] = {}

    def tagged_reads():
        # seq ids are assigned in first-seen order, which is deterministic
        # across the sampling pre-pass and the main pass
        for name, seq in fasta.iter_reads(cfg.dataset, cfg.sequence_type, cfg.k, L):
            base_name = _sequence_tag(name)
            if base_name not in name_to_id:
                name_to_id[base_name] = len(seq_names)
                seq_names.append(base_name)
            yield name_to_id[base_name], seq

    def batches():
        return batching.batch_codes_dense_tagged(tagged_reads(), R, L)

    # --- optional LPT pre-pass on a sample of batches (reference:
    # SparkMultiSequenceKmerCounter.scala:580-583, 1%/10% sampling) ---
    hist = np.zeros(cfg.b, dtype=np.int64)
    if cfg.use_custom_partitioner:
        est = ex_mod.estimate_bin_sizes(mesh, cfg.k, cfg.m, cfg.b)
        take = max(1, int(round(1.0 / max(cfg.sample_fraction, 1e-9))))
        with timer.span("lpt_prepass"):
            for i, (codes, _sids, _, _) in enumerate(batches()):
                if i % take == 0:
                    hist += np.asarray(
                        est(ex_mod.shard_batch(mesh, codes)), dtype=np.int64
                    )
        T = cfg.num_partition_tasks or n
        task_map = partitioner.lpt_owner_map(hist, T, cfg.b)
        owner_map = (task_map % n).astype(np.int32)
        balance = partitioner.balance_stats(hist, owner_map, n)
    else:
        owner_map = partitioner.hash_owner_map(cfg.b, n)
        balance = {"sampled": False}

    positions = (R // n) * (L - cfg.k + 1)
    if cap is None:
        if not hist.any():
            est = ex_mod.estimate_bin_sizes(mesh, cfg.k, cfg.m, cfg.b)
            with timer.span("cap_sizing"):
                for codes, _sids, _, _ in batches():
                    hist += np.asarray(
                        est(ex_mod.shard_batch(mesh, codes)), dtype=np.int64
                    )
                    break
        cap = partitioner.size_exchange_cap(hist, owner_map, n, positions)

    # streaming device-resident (k-mer, seq) tables — the seq id rides the
    # all-to-all as an extra key lane; per-batch host pulls eliminated
    acc_cap = 1 << max(14, (2 * n * cap - 1).bit_length())
    ctr = stream.DistributedCounter(
        mesh, cfg.k, cfg.m, cfg.b, cap, acc_cap, owner_map, with_seq=True,
        unique_ub=unique_ub, prededup=prededup,
    )

    ckpt = None
    skip = 0
    persisted = 0
    if checkpoint_dir:
        import jax

        from ..output import manifest as manifest_mod
        from ..parallel import multihost

        ckpt = manifest_mod.BatchCheckpointer(checkpoint_dir, checkpoint_interval)
        skip = ckpt.completed_batches()
        if jax.process_count() > 1:
            skip = ckpt.rollback_to(multihost.agree_min(skip))
        ctr.host_spills.extend(ckpt.load_parts())
        persisted = len(ctr.host_spills)

    with timer.span("count"):
        for i, (codes, sids, nr, nb) in enumerate(batches()):
            if i < skip:
                continue  # counted before the interruption (names rebuilt)
            ctr.feed(codes, n_reads=nr, n_bases=nb, seq_ids=sids)
            if ckpt is not None and (i + 1) % ckpt.interval == 0:
                ctr.spill()
                ctr.materialize_spills(block=True)  # persist = landed
                ckpt.save_spills(i + 1, ctr.host_spills[persisted:], persisted)
                persisted = len(ctr.host_spills)

    with timer.span("merge"):
        words_ext, counts, bins = ctr.finalize()
    words = words_ext[:, :W]
    seqs = words_ext[:, W].astype(np.int32)

    S = len(seq_names)
    with timer.span("distances"):
        D = accumulate_distances(words, seqs, counts, S, measure) if S else np.zeros((0, 0))
        pair_dist = {}
        for s1 in range(S):
            for s2 in range(s1 + 1, S):
                pair_dist[(seq_names[s1], seq_names[s2])] = measure.finalize(float(D[s1, s2]), 0)
                if not measure.symmetric:
                    pair_dist[(seq_names[s2], seq_names[s1])] = measure.finalize(
                        float(D[s2, s1]), 0
                    )

    if cfg.write:
        with timer.span("write_output"):
            _write_multiseq_output(cfg, words, counts, bins, pair_dist, measure,
                                   keep_table=keep_table)
    if ckpt is not None:
        ckpt.clear()  # run completed

    return MultiseqResult(
        words, seqs, counts, bins, seq_names, pair_dist, int(counts.sum()),
        timer.as_dict(), exchange_bytes=ctr.exchange_bytes, balance=balance,
    )
