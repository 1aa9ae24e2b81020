"""Streaming distributed counter with per-chip device-resident tables.

parallel.driver's simple path pulls every batch's per-chip table to the
host; across a remote-device link (and even over PCIe at scale) that is the
wrong shape.  This module keeps all cross-batch state INSIDE the device:

  per batch   exchange_step(codes, owner_tab) ->
                extract -> route -> all_to_all          (as exchange.py)
              (NO sort-count per batch; the received rows are buffered
              on device — "pending" parts)

  every ``fanin`` batches (or when the accumulator budget forces it)
              merge_step(parts..., acc) ->
                ONE weighted sentinel-sort over (pending rows, accumulated
                uniques) + scan-only run totals + block-compaction
                (count_sort.compact_marked) back to the [acc_cap]
                accumulator

This is the device analogue of the reference's reduce-side state (Spark
shuffle files + ``reduceByKey`` aggregation buffers,
SparkBinKmerCounter.scala:1035): sorted-run merging instead of a JVM heap.
Batching ``fanin`` exchanges per merge amortizes the big sort exactly like
the reference amortizes its per-bin quicksort over a whole partition.

The host only ever moves scalars (overflow counters, at merge boundaries at
most) and pulls each chip's final stacked (words, count, bin) table once at
the end — or, when the distinct-k-mer count outgrows ``acc_cap``, spills
the accumulator to the host at a merge boundary and keeps going, so any
genome fits regardless of the device budget.

Fixed capacities (TPU has no dynamic shapes): ``cap`` bounds per-(src,dst)
exchange lanes, ``acc_cap`` bounds distinct k-mers held per chip; all
overflow is DETECTED via psum'd counters, never silent.

Compaction back to acc_cap is block-local sorts + scan placement
(count_sort.compact_marked) — never a scatter (TPU scatters serialize)
and never a gather (a random gather costs ~9 ns/elem on TPU, ~3x a whole
sort pass per binary-search step; benchmarks/primitives.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.bits import num_words
from ..ops import binhash, count_sort
from . import exchange

AXIS = exchange.AXIS
_ONES = jnp.uint32(0xFFFFFFFF)
_WT_LIMIT = count_sort.WEIGHT_LIMIT  # int32 run-total wrap guard
_INIT_CACHE: dict = {}  # (mesh, n, acc_cap, W) -> jitted on-device init


class AccState(NamedTuple):
    words: jnp.ndarray  # [n, acc_cap, W] sentinel-padded unique k-mers, sorted
    wts: jnp.ndarray  # [n, acc_cap] int32 counts
    n_unique: jnp.ndarray  # [n] int32, REPLICATED (all_gathered at merge)
    dropped: jnp.ndarray  # [] int32 cumulative exchange overflow
    overflow: jnp.ndarray  # [] int32 cumulative accumulator overflow


class DistributedCounter:
    """Multi-batch streaming counter over a 1-D mesh (k % 16 != 0).

    ``cap``      per-(src,dst) all_to_all lane capacity (k-mers).
    ``acc_cap``  distinct k-mers held on each chip between host spills.
    ``fanin``    exchanges buffered per merge sort.
    ``with_seq`` multisequence mode: a per-read sequence id rides the
                 exchange as one extra uint32 key lane, so the tables
                 count (k-mer, seq) pairs — the KmerWithSequence analogue
                 (reference: package.scala:506-509, multiseq shuffle at
                 SparkMultiSequenceKmerCounter.scala:587-588).
    ``unique_ub`` caller-asserted bound on TOTAL distinct k-mers (e.g.
                 genome length).  Makes the feed loop SYNC-FREE, exactly
                 like the single-chip DeviceAccumulator: acc_cap is bumped
                 to cover the bound, all host-side room checks and the
                 per-merge dropped-counter pull are skipped, and the
                 device counters (overflow AND exchange drops) are
                 verified once at finalize — asserted, never trusted.
                 The Spark analogue is the fire-and-forget shuffle write:
                 no ack per record, failure surfaces at stage end.
    """

    def __init__(self, mesh: Mesh, k: int, m: int, B: int, cap: int, acc_cap: int,
                 owner_map: np.ndarray, fanin: int = 4, with_seq: bool = False,
                 use_pallas: bool | None = None, pallas_interpret: bool = False,
                 retry_on_overflow: bool = True, unique_ub: int | None = None):
        assert count_sort.sentinel_safe_for(k) or with_seq, (
            "streaming counter needs k % 16 != 0 (or a seq lane, which is "
            "itself sentinel-safe)"
        )
        self.mesh = mesh
        self.k, self.m, self.B = k, m, B
        self.with_seq = with_seq
        self.Wk = num_words(k)  # k-mer words only
        self.W = self.Wk + (1 if with_seq else 0)  # key lanes incl. seq
        self.n = mesh.shape[AXIS]
        self.cap = cap
        self.assume_fits = unique_ub is not None
        if unique_ub is not None:
            # next 64Ki granule with ~6% headroom (bins partition k-mers
            # across chips, so any one chip holds <= the global bound)
            acc_cap = max(
                acc_cap, -(-int(unique_ub * 1.0625) // (1 << 16)) * (1 << 16)
            )
        self.acc_cap = acc_cap
        self.fanin = fanin
        self.owner = np.asarray(owner_map, dtype=np.int32)
        use_pallas = exchange.resolve_use_pallas(k, mesh, use_pallas)
        self._extract = exchange._extract_fn(k, m, B, use_pallas, pallas_interpret)
        self._check_vma = exchange._check_vma(use_pallas, pallas_interpret)
        self._use_pallas = use_pallas
        self._pallas_interpret = pallas_interpret
        self._exchange = self._build_exchange()
        self._merge_cache: dict[tuple, callable] = {}
        self._stack = None  # built lazily (first table pull)
        self.state = self._init_state()
        self.pending: list = []  # [(cols tuple [n, n*cap], ndrop)]
        self.host_spills: list = []  # (words, counts, bins) np arrays
        self._acc_ub = 0  # conservative upper bound on per-chip uniques
        self._pend_ub = 0  # conservative upper bound on pending new uniques
        self._wt_dev = 0  # bound on total instance weight on device
        self.n_bases = 0
        self.n_reads = 0
        self.retry_on_overflow = retry_on_overflow
        self._window: list = []  # current merge window's inputs, for replay
        self._cap_limit = cap  # grows with observed per-src positions
        self.exchange_bytes = 0  # cumulative bytes crossing the interconnect
        self.n_retries = 0

    def _init_state(self) -> AccState:
        # built ON DEVICE: device_put of host sentinel padding ships
        # n*acc_cap*(W+1)*4 bytes over the host link for nothing (measured
        # ~2.5 s per 2^24-row accumulator through the tunnel)
        key = (self.mesh, self.n, self.acc_cap, self.W)
        fn = _INIT_CACHE.get(key)
        if fn is None:
            n, acc_cap, W = self.n, self.acc_cap, self.W
            dev = NamedSharding(self.mesh, P(AXIS))
            rep = NamedSharding(self.mesh, P())
            fn = jax.jit(
                lambda: AccState(
                    words=jnp.full((n, acc_cap, W), 0xFFFFFFFF, jnp.uint32),
                    wts=jnp.zeros((n, acc_cap), jnp.int32),
                    n_unique=jnp.zeros(n, jnp.int32),  # replicated (see merge)
                    dropped=jnp.int32(0),
                    overflow=jnp.int32(0),
                ),
                out_shardings=AccState(dev, dev, rep, rep, rep),
            )
            _INIT_CACHE[key] = fn
        return fn()

    # ------------------------------------------------------------------ #
    # per-batch exchange: extract -> route -> all_to_all (NO sort/count) #
    # ------------------------------------------------------------------ #
    def _build_exchange(self):
        k, m, B, n, cap = self.k, self.m, self.B, self.n, self.cap
        Wk, W, with_seq = self.Wk, self.W, self.with_seq
        in_specs = (P(AXIS, None), P(AXIS), P()) if with_seq else (P(AXIS, None), P())

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(tuple(P(AXIS) for _ in range(W)), P()),
            check_vma=self._check_vma,
        )
        def ex_step(codes, *rest):
            owner_tab = rest[-1]
            ex = self._extract(codes)
            owner = owner_tab[ex.bins]
            cols = [jnp.where(ex.valid, ex.words[:, w], _ONES) for w in range(Wk)]
            if with_seq:
                R, L = codes.shape
                Pp = L - k + 1
                seq_col = jnp.broadcast_to(
                    rest[0][:, None].astype(jnp.uint32), (R, Pp)
                ).reshape(R * Pp)
                cols.append(jnp.where(ex.valid, seq_col, _ONES))
            routed, bok, ndrop = exchange.route_by_owner(
                owner, ex.valid, tuple(cols), n, cap
            )
            recv = [exchange._all_to_all(c) for c in routed] + [exchange._all_to_all(bok)]
            rok = recv[W] == jnp.uint32(1)
            # sentinel the unfilled slots so the merge can weigh rows by
            # sentinel-test alone (no ok lane buffered)
            rcols = [jnp.where(rok, recv[w], _ONES) for w in range(W)]
            return tuple(c[None] for c in rcols), jax.lax.psum(ndrop, AXIS)

        jitted = jax.jit(ex_step)
        owner_arr = self.owner
        if with_seq:
            return lambda codes, seq_ids: jitted(codes, seq_ids, owner_arr)
        return lambda codes: jitted(codes, owner_arr)

    # ------------------------------------------------------------------ #
    # merge: pending parts + accumulator -> accumulator                  #
    # ------------------------------------------------------------------ #
    def _build_merge(self, nparts: int):
        n, acc_cap, W = self.n, self.acc_cap, self.W
        n_rows = nparts * n * self.cap + acc_cap
        cap_in = -(-n_rows // (1 << 16)) * (1 << 16)  # 64Ki granules, bounded compiles
        # pad to a power of two when within 10%: lax.sort at pow2 row
        # counts measured 21% cheaper per element (split_merge_probe.py)
        p2 = 1 << (n_rows - 1).bit_length()
        if p2 <= n_rows * 1.10:
            cap_in = max(cap_in, p2)
        specs_part = tuple(tuple(P(AXIS) for _ in range(W)) for _ in range(nparts))
        acc_spec = AccState(P(AXIS), P(AXIS), P(), P(), P())

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(specs_part, tuple(P() for _ in range(nparts)), acc_spec),
            out_specs=acc_spec,
        )
        def merge(parts, ndrops, acc: AccState) -> AccState:
            pad = cap_in - n_rows
            mcols = []
            for w in range(W):
                segs = [p[w][0] for p in parts] + [acc.words[0][:, w]]
                if pad:
                    segs.append(jnp.full(pad, _ONES, jnp.uint32))
                mcols.append(jnp.concatenate(segs))
            # received rows weigh 1, accumulated uniques weigh their count
            part_valid = jnp.concatenate([p[W - 1][0] for p in parts]) != _ONES
            wts = jnp.concatenate(
                [part_valid.astype(jnp.int32), acc.wts[0]]
                + ([jnp.zeros(pad, jnp.int32)] if pad else [])
            )
            # all inputs are pre-sentineled with zero weights on sentinel
            # rows — skip count_sorted's validity rewrite pass entirely
            sc = count_sort.count_presentineled(mcols, weights=wts)
            # compaction to acc_cap: block-local sorts + scan placement
            # (count_sort.compact_marked) — never a global sort (7x dearer
            # at merge width), never a gather/scatter; sentinel-safety is
            # asserted in the ctor
            ncols, new_wts, n_u, over = count_sort.compact_marked(
                tuple(sc.words[:, w] for w in range(W)), sc.counts, sc.is_uniq,
                acc_cap, block=1 << 15,
                pallas=count_sort.pallas_compact_opt_in() and self._use_pallas,
                pallas_interpret=self._pallas_interpret,
            )
            new_words = jnp.stack(ncols, axis=1)
            return AccState(
                words=new_words[None],
                wts=new_wts[None],
                # replicated: every process can fetch it and reach the
                # same spill decision (an axis-sharded vector would span
                # non-addressable devices on a multi-host mesh).  One-hot
                # psum, not all_gather: psum output is statically known
                # to be replicated (out_specs P() demands that proof)
                n_unique=jax.lax.psum(
                    jnp.where(
                        jnp.arange(n, dtype=jnp.int32)
                        == jax.lax.axis_index(AXIS),
                        jnp.minimum(n_u, acc_cap),
                        0,
                    ),
                    AXIS,
                ),
                # ndrops are replicated psums already — no psum here
                dropped=acc.dropped + sum(ndrops),
                overflow=acc.overflow + jax.lax.psum(over, AXIS),
            )

        # donate only the accumulator: part buffers never alias any output
        # shape, so donating them just emits 'unusable donation' warnings
        return jax.jit(merge, donate_argnums=(2,))

    def _merge_pending(self) -> None:
        if not self.pending:
            return
        # assume_fits: the dropped-counter pull is itself a host sync —
        # skip it; the accumulated state.dropped raises at finalize
        if self.retry_on_overflow and not self.assume_fits:
            self._retry_window_if_dropped()
        nparts = len(self.pending)
        key = (nparts, self.cap)
        if key not in self._merge_cache:
            self._merge_cache[key] = self._build_merge(nparts)
        parts = tuple(p[0] for p in self.pending)
        ndrops = tuple(p[1] for p in self.pending)
        self.state = self._merge_cache[key](parts, ndrops, self.state)
        self.pending = []
        self._window = []
        self._acc_ub = min(self._acc_ub + self._pend_ub, self.acc_cap)
        self._pend_ub = 0
        # start the counters' D2H copies NOW (hides tunnel round trips if
        # the host later needs them for a spill decision)
        for a in (self.state.n_unique, self.state.dropped, self.state.overflow):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def _ensure_room(self, incoming: int) -> None:
        """Keep the next merge's unique-count bound within acc_cap, spilling
        the accumulator to the host when it genuinely cannot absorb the
        incoming batch.  Conservative bounds avoid device pulls entirely in
        the common case; at most a few scalar pulls happen per spill."""
        if self._acc_ub + self._pend_ub + incoming <= self.acc_cap:
            return
        stats = self._stats()  # exact occupancy before deciding to spill
        self._acc_ub = max(stats["n_unique"], default=0)
        while self._acc_ub + self._pend_ub + incoming > self.acc_cap:
            if self.pending:
                # merge first: duplicates may collapse the conservative
                # pending bound far below acc_cap (no spill needed at all)
                self._merge_pending()
                stats = self._stats()
                self._acc_ub = max(stats["n_unique"], default=0)
            elif self._acc_ub > 0:
                self._raise_if_lost(stats)
                self.host_spills.extend(self._pull_tables(stats))
                self.state = self._init_state()
                self._acc_ub = 0
                self._wt_dev = 0  # pending is empty on this branch
                self.materialize_spills(block=False)  # free landed spills
                self._bound_inflight()
            else:
                # a single batch exceeds acc_cap: the device overflow
                # counter records the loss and finalize raises
                break

    def feed(self, codes: np.ndarray, n_reads: int = 0, n_bases: int = 0,
             seq_ids: np.ndarray | None = None) -> None:
        """Dispatch one batch's exchange.  ``codes``/``seq_ids`` may be
        aliased zero-copy by jax (CPU backend) and the dispatch is async:
        the caller MUST NOT mutate them afterwards — pass fresh arrays."""
        R, L = codes.shape
        # multi-host: codes is this process's stripe; bounds are global
        R = R * jax.process_count()
        # per-chip new-unique bound: a chip cannot receive more rows than
        # its n*cap exchange lanes hold, nor more than the batch contains
        positions = min(R * max(L - self.k + 1, 0), self.n * self.cap)
        if self._wt_dev + positions > _WT_LIMIT:
            # int32 run-total wrap guard — applies even under assume_fits
            # (it bounds weights, not capacity); forces one host spill per
            # ~2^31 instances, so the guard never shows up in steady state
            self.spill()
        if not self.assume_fits:
            self._ensure_room(positions)
        sharded = exchange.shard_batch(self.mesh, codes)
        sids = None
        if self.with_seq:
            sids = exchange.shard_vector(
                self.mesh, np.asarray(seq_ids, dtype=np.int32)
            )
        self._dispatch(sharded, sids)
        # retry needs the (immutable) device inputs and per-src extraction
        # bound; per-src rows also bound how far cap can usefully grow
        src_positions = (-(-R // self.n)) * max(L - self.k + 1, 0)
        if not self.assume_fits:  # sync-free mode never replays a window
            self._window.append((sharded, sids, R * max(L - self.k + 1, 0)))
        self._cap_limit = max(self._cap_limit, src_positions)
        self._pend_ub += positions
        self._wt_dev += positions
        self.n_reads += n_reads
        self.n_bases += n_bases
        if len(self.pending) >= self.fanin:
            self._merge_pending()

    def _dispatch(self, sharded, sids) -> None:
        if self.with_seq:
            self.pending.append(self._exchange(sharded, sids))
        else:
            self.pending.append(self._exchange(sharded))
        # PER-CHIP bytes per step (key lanes + ok lane), the one definition
        # shared with exchange.exchange_bytes_per_step — the per-batch
        # driver path accumulates the same quantity, so
        # DistributedResult.exchange_bytes means one thing regardless of
        # ``streaming`` (VERDICT r2 weak #7)
        self.exchange_bytes += self.n * self.cap * (self.W + 1) * 4

    def _retry_window_if_dropped(self) -> None:
        """Exchange-overflow recovery (the moral equivalent of Spark
        spilling): pull the window's psum'd dropped counters (one small
        transfer — the merge would wait on the newest exchange anyway) and,
        if any entry was dropped, rebuild the exchange at doubled capacity
        and replay the retained window inputs.  Capacity is clipped at the
        per-src worst case, where overflow is impossible by construction.

        The replay re-runs the feed-time CAPACITY checks per batch: the
        doubled cap raises each replayed batch's per-chip unique bound, so
        a window that fit acc_cap when fed can exceed it when retried — the
        replay must be allowed to merge sub-windows and spill between them,
        exactly like feed() (found by the retry+spill fuzz,
        tests/test_adaptive_fuzz.py).  _ensure_room may recurse into
        _merge_pending for the ALREADY-replayed prefix; self._window holds
        exactly that prefix at all times, so a nested retry replays a
        consistent set."""
        while True:
            drops = np.asarray(jnp.stack([p[1] for p in self.pending]))
            if int(drops.sum()) == 0:
                return
            if self.cap >= self._cap_limit:
                raise RuntimeError(
                    f"exchange overflow at worst-case cap={self.cap}: "
                    f"{int(drops.sum())} entries dropped"
                )
            self.cap = min(self.cap * 2, self._cap_limit)
            self.n_retries += 1
            self._exchange = self._build_exchange()
            window = self._window
            self.pending = []
            self._window = []
            self._pend_ub = 0
            for sharded, sids, pos in window:
                positions = min(pos, self.n * self.cap)
                # fresh conservative charge; the original feed's (smaller)
                # charge stays — overcounting _wt_dev only spills earlier
                self._wt_dev += positions
                self._ensure_room(positions)
                self._dispatch(sharded, sids)
                self._window.append((sharded, sids, pos))
                self._pend_ub += positions

    def _stats(self) -> dict:
        """Counters of merges completed so far (pending parts excluded);
        usually already prefetched by the post-merge async copies."""
        return {
            "n_unique": np.asarray(self.state.n_unique).tolist(),
            "dropped": int(np.asarray(self.state.dropped)),
            "overflow": int(np.asarray(self.state.overflow)),
        }

    def check(self) -> dict:
        """Flush pending parts into the accumulator, then return the
        capacity counters.  NOTE: this forces a merge (one weighted sort +
        one compaction sort, possibly at a sub-fanin part count) — poll
        sparingly; the counters themselves are prefetched and cheap."""
        self._merge_pending()
        return self._stats()

    def _raise_if_lost(self, stats: dict) -> None:
        if stats["dropped"]:
            raise RuntimeError(
                f"exchange overflow: {stats['dropped']} entries; raise cap"
            )
        if stats["overflow"]:
            raise RuntimeError(
                f"accumulator overflow: {stats['overflow']} uniques; raise acc_cap"
            )

    def spill(self) -> None:
        """Pull the accumulated per-chip tables to the host and reset the
        device accumulator — the pressure valve that makes acc_cap a budget,
        not a limit."""
        stats = self.check()
        self._raise_if_lost(stats)
        self.host_spills.extend(self._pull_tables(stats))
        self.state = self._init_state()
        self._acc_ub = 0
        self._wt_dev = 0  # spilled weights left the device (pending is empty)
        self.materialize_spills(block=False)  # free landed spills
        self._bound_inflight()

    def _pull_tables(self, stats: dict) -> list:
        """Per-chip table pulls, ASYNC: each chip's device slice is returned
        with its D2H copy merely started; entries materialize to numpy
        lazily (materialize_spills) so spills overlap the continuing feed
        instead of stalling it for the whole transfer."""
        if not any(stats["n_unique"]):
            return []
        if self._stack is None:
            self._stack = _build_stack_all(self.mesh, self.k, self.m, self.B, self.Wk)
        stacked = self._stack(self.state.words, self.state.wts)
        parts = []
        # per-chip pulls via addressable shards (indexing a sharded axis in
        # the global view would require ambiguous-sharding gathers); the
        # chip id comes from the shard's GLOBAL index — on a multi-host
        # mesh this process only addresses a subset of chips
        for shard in stacked.addressable_shards:
            c = shard.index[0].start or 0
            u = stats["n_unique"][c]
            if u == 0:
                continue
            sl = shard.data[0, :u]  # device-side slice
            try:
                sl.copy_to_host_async()
            except AttributeError:
                pass
            parts.append(sl)
        return parts

    def _to_np_spill(self, arr) -> tuple:
        tab = np.asarray(arr)
        return (
            tab[:, : self.W], tab[:, self.W].astype(np.int64),
            tab[:, self.W + 1].astype(np.int32),
        )

    def materialize_spills(self, block: bool = True) -> None:
        """Convert pending device-side spill slices to numpy tuples;
        block=False converts only already-landed transfers.  Must be called
        with block=True before persisting host_spills to a checkpoint."""
        for i, s in enumerate(self.host_spills):
            if isinstance(s, tuple):
                continue
            if not block:
                try:
                    if not s.is_ready():
                        continue
                except AttributeError:
                    pass
            self.host_spills[i] = self._to_np_spill(s)

    # at most this many SPILLS' worth of per-chip slices may be in flight
    # (device buffers alive, D2H unlanded) before the next spill blocks on
    # the oldest — unbounded pending spills would pin per-chip tables in
    # HBM faster than a slow link drains them
    MAX_INFLIGHT_SPILLS = 2

    def _bound_inflight(self) -> None:
        limit = self.MAX_INFLIGHT_SPILLS * self.n  # n slices per mesh spill
        pend = [i for i, s in enumerate(self.host_spills)
                if not isinstance(s, tuple)]
        for i in pend[: max(0, len(pend) - limit)]:
            self.host_spills[i] = self._to_np_spill(self.host_spills[i])

    def finalize(self):
        """-> (words [U, W], counts [U], bins [U]) merged across chips.

        Bins partition k-mers across chips, so per-chip tables are disjoint
        and spills never share k-mers with later tables *of other chips*;
        the same chip may spill the same k-mer twice, so the host merge is
        a weighted group-by (pipeline.merge_partials).  One stacked D2H per
        chip per spill.
        """
        stats = self.check()
        self._raise_if_lost(stats)
        from .. import pipeline as base

        parts = self.host_spills + self._pull_tables(stats)
        parts = [
            p if isinstance(p, tuple) else self._to_np_spill(p) for p in parts
        ]
        if not parts:
            return (
                np.zeros((0, self.W), np.uint32),
                np.zeros(0, np.int64),
                np.zeros(0, np.int32),
            )
        return base.merge_partials(parts, self.W)


# module-level cache: one trace per (mesh, k, m, B, Wk) across
# DistributedCounter instances — retraces through the remote compile hop
# are expensive (CLAUDE.md), so instances must share stacks like they share
# merges (_merge_cache bounds compiles per instance; this bounds them
# globally).
_STACK_CACHE: dict[tuple, callable] = {}


def _build_stack_all(mesh: Mesh, k: int, m: int, B: int, Wk: int):
    """jit fn: [n, acc_cap, W] words + [n, acc_cap] wts -> [n, acc_cap, W+2]
    uint32 with bins appended.  A shard_map: bins are recomputed per chip
    from its own words (no cross-shard reshape — a global-view reshape over
    the sharded axis both moves data and, under explicit-sharding meshes,
    produces concat operands with mismatched shardings).

    ``Wk`` = k-mer word count; bins are a function of the k-mer words only
    (any trailing seq lane is excluded from the hash)."""
    key = (mesh, k, m, B, Wk)
    if key in _STACK_CACHE:
        return _STACK_CACHE[key]

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(AXIS), P(AXIS)), out_specs=P(AXIS))
    def stack(words, wts):
        flat = words[0]  # [acc_cap, W] local
        bins = binhash.bins_from_words(flat[:, :Wk], k, m, B)
        return jnp.concatenate(
            [flat, wts[0][:, None].astype(jnp.uint32), bins[:, None].astype(jnp.uint32)],
            axis=1,
        )[None]

    fn = jax.jit(stack)
    _STACK_CACHE[key] = fn
    return fn
