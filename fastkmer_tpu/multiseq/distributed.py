"""Distributed multisequence counting over a device mesh.

The reference's multiseq job is the same shuffle with sequence-tagged
payloads (``aggregateByKey``, SparkMultiSequenceKmerCounter.scala:587-588);
here the sequence id rides the all-to-all as one extra uint32 lane and the
owner chip counts (k-mer, seq) pairs — the same extra-key-word trick as the
single-chip path.  Distances are accumulated host-side from the merged
table (multiseq.pipeline.accumulate_distances) and, unlike the reference
(README.md:126), actually aggregated and returned.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.bits import num_words
from ..ops import binhash, count_sort, extract
from ..parallel import exchange

AXIS = exchange.AXIS


def build_distributed_count_seq(mesh: Mesh, k: int, m: int, B: int, cap: int,
                                owner_map: np.ndarray):
    """jit step: (codes [R, L], seq_ids [R]) sharded -> per-chip sorted
    (k-mer, seq) count tables (exchange.ShardCounts; words have W+1 cols
    with the seq id last)."""
    n = mesh.shape[AXIS]
    owner_arr = np.asarray(owner_map, dtype=np.int32)
    W = num_words(k)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P()),
        out_specs=exchange.ShardCounts(
            words=P(AXIS), bins=P(AXIS), is_start=P(AXIS), counts=P(AXIS),
            n_valid=P(AXIS), dropped=P(),
        ),
    )
    def step(codes, seq_ids, owner_tab) -> exchange.ShardCounts:
        ex = extract.extract(codes, k, m, B)
        R, L = codes.shape
        Pp = L - k + 1
        seq_col = jnp.broadcast_to(
            seq_ids[:, None].astype(jnp.uint32), (R, Pp)
        ).reshape(R * Pp)
        owner = owner_tab[ex.bins]
        cols = tuple(ex.words[:, w] for w in range(W)) + (seq_col,)
        routed, bok, ndrop = exchange.route_by_owner(owner, ex.valid, cols, n, cap)
        recv = [exchange._all_to_all(c) for c in routed] + [exchange._all_to_all(bok)]
        rw = jnp.stack(recv[: W + 1], axis=1)  # words + seq lane
        rok = recv[W + 1] == jnp.uint32(1)
        # seq lane never equals the all-ones sentinel for valid rows
        sc = count_sort.count_sorted(rw, None, rok, sentinel_safe=True)
        bins = binhash.bins_from_words(sc.words[:, :W], k, m, B)
        dropped = jax.lax.psum(ndrop, AXIS)
        return exchange.ShardCounts(
            words=sc.words[None], bins=bins[None], is_start=sc.is_start[None],
            counts=sc.counts[None], n_valid=sc.n_valid[None], dropped=dropped,
        )

    jitted = jax.jit(step)
    return lambda codes, seq_ids: jitted(codes, seq_ids, owner_arr)


def _sequence_tag(header: str) -> str:
    """Sequence name from a read header: the leading word-character run,
    matching the reference's ``"(\\w+)."`` extraction
    (SparkMultiSequenceKmerCounter.scala:61-62) — SRA-style reads
    ``SRR197985.1``, ``SRR197985.2`` tag the same sequence ``SRR197985``.
    Chunk suffixes (``#i``) from long-mode splitting are stripped first."""
    import re as _re

    head = header.split("#")[0]
    mobj = _re.match(r"(\w+)", head)
    return mobj.group(1) if mobj else head.split()[0]


def execute_multiseq_job_distributed(cfg, mesh: Mesh, cap: int | None = None,
                                     verbose: bool = True):
    """Multi-chip execute_multiseq_job (same MultiseqConfig / result type)."""
    from .. import pipeline as base
    from ..core import bits as bmod
    from ..ingest import fasta
    from ..output import writer
    from ..utils.timing import StageTimer
    from . import distances as dist_mod
    from .pipeline import (MultiseqResult, _sum_over_sequences, _write_distances,
                           accumulate_distances)

    timer = StageTimer()
    measure = dist_mod.get_measure(cfg.distance_measure)
    n = mesh.shape[AXIS]
    W = num_words(cfg.k)
    R = -(-cfg.reads_per_batch // n) * n
    L = cfg.read_len
    if cap is None:
        cap = (R // n) * (L - cfg.k + 1)
    from ..parallel import partitioner

    owner_map = partitioner.hash_owner_map(cfg.b, n)
    step = build_distributed_count_seq(mesh, cfg.k, cfg.m, cfg.b, cap, owner_map)

    seq_names: list[str] = []
    name_to_id: dict[str, int] = {}
    parts: list = []
    n_rows = 0

    buf = np.full((R, L), 4, dtype=np.uint8)
    sid = np.zeros(R, dtype=np.int32)
    row = 0

    def flush():
        sharded = exchange.shard_batch(mesh, buf)
        sid_sharded = jax.device_put(sid, NamedSharding(mesh, P(AXIS)))
        sc = step(sharded, sid_sharded)
        if int(sc.dropped):
            raise RuntimeError("exchange capacity overflow; raise cap")
        for part in exchange.compact_shard_counts(sc):
            parts.append(part)

    with timer.span("count"):
        for name, seq in fasta.iter_reads(cfg.dataset, cfg.sequence_type, cfg.k, L):
            base_name = _sequence_tag(name)
            if base_name not in name_to_id:
                name_to_id[base_name] = len(seq_names)
                seq_names.append(base_name)
            codes = bmod.encode_ascii(seq)
            buf[row, : codes.shape[0]] = codes
            sid[row] = name_to_id[base_name]
            row += 1
            n_rows += 1
            if row == R:
                flush()
                buf.fill(4)
                sid.fill(0)
                row = 0
        if row:
            flush()

    with timer.span("merge"):
        if parts:
            words_ext, counts, bins = base.merge_partials(parts, W + 1)
        else:
            words_ext = np.zeros((0, W + 1), np.uint32)
            counts = np.zeros(0, np.int64)
            bins = np.zeros(0, np.int32)
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
            uw, uc, ub = _sum_over_sequences(words, counts, bins)
            writer.write_bin_files(cfg.output_dir, uw, uc, ub, cfg.k)
            _write_distances(cfg.output_dir, pair_dist, measure)

    return MultiseqResult(
        words, seqs, counts, bins, seq_names, pair_dist, int(counts.sum()), timer.as_dict()
    )
