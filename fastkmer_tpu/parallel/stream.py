"""Streaming distributed counter with per-chip device-resident tables.

parallel.driver pulls every batch's per-chip table to the host; across a
remote-device link (and even over PCIe at scale) that is the wrong shape.
This module keeps a per-chip accumulator table INSIDE the jitted step:

    step(codes, owner_tab, acc) -> acc'
      chip-local: extract -> route -> all_to_all      (as exchange.py)
      then ONE weighted sentinel-sort merges the received k-mer instances
      (weight 1) with the chip's accumulated unique table (weight = count),
      stream-compacts to the accumulator capacity, and returns it.

The host only ever moves scalars per batch (overflow/unique counters) and
pulls each chip's final stacked (words, count, bin) table once at the end —
the device-resident analogue of Spark's reduce-side state.

Fixed capacities (TPU has no dynamic shapes): ``cap`` bounds per-(src,dst)
exchange lanes, ``acc_cap`` bounds distinct k-mers per chip; both overflow
DETECTED via psum'd counters, never silent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.bits import num_words
from ..ops import binhash, count_sort, extract
from . import exchange

AXIS = exchange.AXIS


class AccState(NamedTuple):
    words: jnp.ndarray  # [n, acc_cap, W] sentinel-padded unique k-mers, sorted
    wts: jnp.ndarray  # [n, acc_cap] int32 counts
    n_unique: jnp.ndarray  # [n] int32
    dropped: jnp.ndarray  # [] int32 cumulative exchange overflow
    overflow: jnp.ndarray  # [] int32 cumulative accumulator overflow


class DistributedCounter:
    """Multi-batch streaming counter over a 1-D mesh (k % 16 != 0)."""

    def __init__(self, mesh: Mesh, k: int, m: int, B: int, cap: int, acc_cap: int,
                 owner_map: np.ndarray):
        assert count_sort.sentinel_safe_for(k), "streaming counter needs k % 16 != 0"
        self.mesh = mesh
        self.k, self.m, self.B = k, m, B
        self.W = num_words(k)
        self.n = mesh.shape[AXIS]
        self.cap = cap
        self.acc_cap = acc_cap
        self.owner = np.asarray(owner_map, dtype=np.int32)
        self._step = self._build_step()
        self.state = self._init_state()
        self.n_bases = 0
        self.n_reads = 0

    def _init_state(self) -> AccState:
        n, acc_cap, W = self.n, self.acc_cap, self.W
        dev = NamedSharding(self.mesh, P(AXIS))
        rep = NamedSharding(self.mesh, P())
        return AccState(
            words=jax.device_put(np.full((n, acc_cap, W), 0xFFFFFFFF, np.uint32), dev),
            wts=jax.device_put(np.zeros((n, acc_cap), np.int32), dev),
            n_unique=jax.device_put(np.zeros(n, np.int32), dev),
            dropped=jax.device_put(np.int32(0), rep),
            overflow=jax.device_put(np.int32(0), rep),
        )

    def _build_step(self):
        k, m, B, n, cap, acc_cap, W = (
            self.k, self.m, self.B, self.n, self.cap, self.acc_cap, self.W,
        )

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(AXIS, None), P(), AccState(P(AXIS), P(AXIS), P(AXIS), P(), P())),
            out_specs=AccState(P(AXIS), P(AXIS), P(AXIS), P(), P()),
        )
        def step(codes, owner_tab, acc: AccState) -> AccState:
            ex = extract.extract(codes, k, m, B)
            owner = owner_tab[ex.bins]
            ones = jnp.uint32(0xFFFFFFFF)
            cols = tuple(
                jnp.where(ex.valid, ex.words[:, w], ones) for w in range(W)
            )
            routed, bok, ndrop = exchange.route_by_owner(owner, ex.valid, cols, n, cap)
            recv = [exchange._all_to_all(c) for c in routed] + [exchange._all_to_all(bok)]
            rok = recv[W] == jnp.uint32(1)
            rcols = [jnp.where(rok, recv[w], ones) for w in range(W)]

            # one weighted merge of (received instances, accumulated uniques)
            aw = acc.words[0]  # [acc_cap, W] (leading mesh dim is local-1)
            mcols = [
                jnp.concatenate([rcols[w], aw[:, w]]) for w in range(W)
            ]
            wts = jnp.concatenate(
                [jnp.where(rok, 1, 0).astype(jnp.int32), acc.wts[0]]
            )
            valid = mcols[W - 1] != ones
            sc = count_sort.count_sorted(
                jnp.stack(mcols, axis=1), None, valid, weights=wts, sentinel_safe=True
            )
            n_u = jnp.sum(sc.is_start.astype(jnp.int32))

            # stream-compact to acc_cap (sort on a monotone float-to-front key)
            N = sc.is_start.shape[0]
            idx = jnp.arange(N, dtype=jnp.int32)
            key = jnp.where(sc.is_start, idx, idx + jnp.int32(N))
            out = jax.lax.sort(
                (key,) + tuple(sc.words[:, w] for w in range(W)) + (sc.counts,),
                num_keys=1, is_stable=False,
            )
            keep = out[0][:acc_cap] < jnp.int32(N)
            new_words = jnp.stack(
                [jnp.where(keep, out[1 + w][:acc_cap], ones) for w in range(W)], axis=1
            )
            new_wts = jnp.where(keep, out[W + 1][:acc_cap], 0)

            over = jnp.maximum(n_u - acc_cap, 0)
            return AccState(
                words=new_words[None],
                wts=new_wts[None],
                n_unique=jnp.minimum(n_u, acc_cap)[None],
                dropped=acc.dropped + jax.lax.psum(ndrop, AXIS),
                overflow=acc.overflow + jax.lax.psum(over, AXIS),
            )

        jitted = jax.jit(step, donate_argnums=(2,))
        owner_arr = self.owner
        return lambda codes, acc: jitted(codes, owner_arr, acc)

    def feed(self, codes: np.ndarray, n_reads: int = 0, n_bases: int = 0) -> None:
        sharded = exchange.shard_batch(self.mesh, codes)
        self.state = self._step(sharded, self.state)
        self.n_reads += n_reads
        self.n_bases += n_bases

    def check(self) -> dict:
        """Pull overflow scalars (cheap) to validate capacities mid-run."""
        return {
            "dropped": int(np.asarray(self.state.dropped)),
            "overflow": int(np.asarray(self.state.overflow)),
            "n_unique": np.asarray(self.state.n_unique).tolist(),
        }

    def finalize(self):
        """-> (words [U, W], counts [U], bins [U]) merged across chips.

        Bins partition k-mers across chips, so per-chip tables are disjoint
        and concatenation + one host lexsort-free merge (tables are sorted;
        chips' ranges interleave, so one final sort) yields the global
        table.  One stacked D2H per chip.
        """
        stats = self.check()
        if stats["dropped"]:
            raise RuntimeError(f"exchange overflow: {stats['dropped']} entries; raise cap")
        if stats["overflow"]:
            raise RuntimeError(
                f"accumulator overflow: {stats['overflow']} uniques; raise acc_cap"
            )
        from .. import pipeline as base

        stacked = _stack_all(self.state.words, self.state.wts, self.k, self.m, self.B)
        parts = []
        # per-chip pulls via addressable shards (indexing a sharded axis in
        # the global view would require ambiguous-sharding gathers)
        shards = sorted(stacked.addressable_shards, key=lambda s: s.index[0].start or 0)
        for c, shard in enumerate(shards):
            u = stats["n_unique"][c]
            if u == 0:
                continue
            tab = np.asarray(shard.data[0, :u])  # device-side slice, one transfer
            parts.append(
                (tab[:, : self.W], tab[:, self.W].astype(np.int64),
                 tab[:, self.W + 1].astype(np.int32))
            )
        if not parts:
            return (
                np.zeros((0, self.W), np.uint32),
                np.zeros(0, np.int64),
                np.zeros(0, np.int32),
            )
        words = np.concatenate([p[0] for p in parts])
        counts = np.concatenate([p[1] for p in parts])
        bins = np.concatenate([p[2] for p in parts])
        order = np.lexsort(tuple(words[:, w] for w in reversed(range(self.W))))
        return words[order], counts[order], bins[order]


@partial(jax.jit, static_argnames=("k", "m", "B"))
def _stack_all(words: jnp.ndarray, wts: jnp.ndarray, k: int, m: int, B: int) -> jnp.ndarray:
    """[n, acc_cap, W] + [n, acc_cap] -> [n, acc_cap, W+2] uint32 with bins."""
    n, acc_cap, W = words.shape
    flat = words.reshape(n * acc_cap, W)
    bins = binhash.bins_from_words(flat, k, m, B).reshape(n, acc_cap)
    return jnp.concatenate(
        [words, wts.astype(jnp.uint32)[..., None], bins.astype(jnp.uint32)[..., None]],
        axis=2,
    )
