"""Bitonic merge of two sorted halves — RETIRED from the production
package (round 4, VERDICT r3 item #6).

The kernel is hardware-exact and fast (0.51 ns/elem at 2^27, measured
round 3), but every candidate production call site loses on arithmetic:

* merging resume/spill parts: the parts live on the HOST and the merged
  table is consumed on the host (writer/finalize), so a device merge pays
  H2D + D2H for data the native loser-tree merge (output/native fkmerge,
  18-31 M rows/s = 300-500 MB/s effective) processes in place.  Through
  the measured link (H2D 116 MB/s, D2H 6-33 MB/s; CLAUDE.md) the round
  trip alone is 10-60x the host merge; even on locally-attached PCIe the
  mandatory D2H of the result caps the win below the host rate.
* replacing the accumulator's merge sort: closed on paper round 3
  (BASELINE.md "one more merge formulation") — splitting the weighted
  merge to exploit the O(n log n) merge caps the winnings at ~6% for real
  complexity.

Kept here (with its exactness test, tests/test_pallas_sort.py) because
the kernel is the right building block the moment a DEVICE-RESIDENT
consumer of merged runs exists; the shared bitonic helpers stay in
ops.pallas_sort (sort_blocks uses them in production).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastkmer_tpu.ops.pallas_sort import (  # noqa: F401
    _I, _U, _bias, _unbias, _load_biased, _mk_block_sort_kernel, _stage,
    _store_unbiased,
)

# --------------------------------------------------------------------- #
# global bitonic merge of two sorted halves                             #
# --------------------------------------------------------------------- #
#
# Why: lax.sort's cost/elem is SUPER-linear at merge scale (3.79 ns at 2^26
# vs 5.45 at 2^27.2, BASELINE.md), so sorting two pow2 halves and MERGING
# them costs less than one big sort — IF the merge is O(n log n): a bitonic
# merge of [A ascending, B descending] is log2(N) compare-exchange stages,
# each a bandwidth-cheap static-pattern pass (partner = i XOR s), vs the
# full network's log^2 stages.  Cross-block stages get the XOR partner by a
# RESHAPE, not arithmetic: viewing [N] as (G, 2, t, R, 128) makes the
# stride-t·BL partner the second axis, so one BlockSpec block (1, 2, 1, R,
# 128) holds both sides of every pair — no scalar prefetch, no manual DMA.
# Sub-block stages all fuse into one final in-VMEM pass per block (the
# standard bitonic-merge recursion leaves each block bitonic and blocks
# mutually ordered).


def _mk_cross_kernel(n_lanes: int, n_keys: int):
    """One compare-exchange stage between block pairs at some cross-block
    stride: the loaded (1, 2, 1, R, 128) block holds (low, high) sides.
    Direction is ascending everywhere (merge network)."""

    def kernel(*refs):
        ins, outs = refs[:n_lanes], refs[n_lanes:]
        lo, hi = [], []
        for i, ref in enumerate(ins):
            x = ref[0]
            a, b = x[0, 0], x[1, 0]
            if i < n_keys:
                a, b = _bias(a), _bias(b)
            else:
                a = a if a.dtype == _I else pltpu.bitcast(a, _I)
                b = b if b.dtype == _I else pltpu.bitcast(b, _I)
            lo.append(a)
            hi.append(b)
        lt = hi[0] < lo[0]
        if n_keys > 1:
            eq = hi[0] == lo[0]
            for w in range(1, n_keys):
                lt = lt | (eq & (hi[w] < lo[w]))
                if w + 1 < n_keys:
                    eq = eq & (hi[w] == lo[w])
        for i, ref in enumerate(outs):
            a = jnp.where(lt, hi[i], lo[i])
            b = jnp.where(lt, lo[i], hi[i])
            if i < n_keys:
                a, b = _unbias(a), _unbias(b)
            else:
                if ref.dtype != _I:
                    a, b = pltpu.bitcast(a, _U), pltpu.bitcast(b, _U)
            ref[0, 0, 0] = a
            ref[0, 1, 0] = b

    return kernel


def _mk_clean_kernel(n_lanes: int, n_keys: int, R: int, BL: int):
    """Final in-VMEM pass: each block is a bitonic sequence and blocks are
    mutually ordered, so cleaning every block (merge stages BL/2..1, all
    ascending) finishes the global merge."""

    def kernel(*refs):
        ins, outs = refs[:n_lanes], refs[n_lanes:]
        ri = jax.lax.broadcasted_iota(_I, (R, 128), 0)
        ci = jax.lax.broadcasted_iota(_I, (R, 128), 1)
        lanes = _load_biased(ins, n_keys)
        s = BL >> 1
        while s >= 1:
            # klev == BL -> direction ascending everywhere (merge semantics)
            lanes = _stage(lanes, n_keys, BL, s, BL, ri, ci)
            s >>= 1
        _store_unbiased(outs, lanes, n_keys)

    return kernel


@partial(jax.jit, static_argnames=("num_keys", "block", "interpret", "vma"))
def bitonic_merge(cols: tuple, num_keys: int, block: int = 1 << 16,
                  interpret: bool = False, vma: frozenset | None = None) -> tuple:
    """Merge [A ascending | B descending] (each N/2) into one ascending [N].

    cols: tuple of [N] lanes (uint32 keys first; values uint32/int32), N a
    power of two >= 2*block.  The concatenation must be BITONIC — in
    practice: A ascending with its sentinels at the end, B descending with
    its sentinels at the front (sort B on bit-NOT keys, then NOT back).
    Ties arbitrary, multiset preserved, same contract as lax.sort.
    """
    N = cols[0].shape[0]
    n_lanes = len(cols)
    assert (N & (N - 1)) == 0 and N >= 2 * block, (N, block)
    assert block >= 1024 and (block & (block - 1)) == 0
    R = block // 128
    nb = N // block

    def sds(dtype, shape):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, dtype)
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)

    cur = tuple(c.reshape(N // 128, 128) for c in cols)
    cross = _mk_cross_kernel(n_lanes, num_keys)
    t = nb >> 1  # cross-block stride, in blocks
    while t >= 1:
        G = nb // (2 * t)
        shaped = tuple(c.reshape(G, 2, t, R, 128) for c in cur)
        spec = pl.BlockSpec(
            (1, 2, 1, R, 128), lambda g, l: (g, 0, l, 0, 0),
            memory_space=pltpu.VMEM,
        )
        outs = pl.pallas_call(
            cross,
            grid=(G, t),
            in_specs=[spec] * n_lanes,
            out_specs=tuple(spec for _ in range(n_lanes)),
            out_shape=tuple(sds(c.dtype, (G, 2, t, R, 128)) for c in cur),
            interpret=interpret,
        )(*shaped)
        cur = tuple(o.reshape(N // 128, 128) for o in outs)
        t >>= 1

    clean = _mk_clean_kernel(n_lanes, num_keys, R, block)
    spec = pl.BlockSpec((R, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        clean,
        grid=(nb,),
        in_specs=[spec] * n_lanes,
        out_specs=tuple(spec for _ in range(n_lanes)),
        out_shape=tuple(sds(c.dtype, (N // 128, 128)) for c in cur),
        interpret=interpret,
    )(*cur)
    return tuple(o.reshape(N) for o in outs)
