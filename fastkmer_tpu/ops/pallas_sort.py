"""Pallas TPU sort: fused bitonic block sort + merge-path merge levels.

Why this exists: the verified roofline (BASELINE.md round 3) shows
``lax.sort`` runs at ~150 bandwidth-pass-equivalents (5.45 ns/elem at the
151M-row production merge vs 0.036 ns for one 24 B r/w pass at ~700 GB/s),
and the sort is ~70% of the streaming merge cost.  A fused sort that keeps
the comparator network's low-stride stages in VMEM touches HBM ~30x less.

Structure (all static shapes, no gather/scatter, no data-dependent control
flow):

* ``sort_blocks`` — each consecutive ``block`` of rows is bitonic-sorted
  entirely in VMEM.  A block is laid out (block/128, 128) row-major; the
  XOR-partner exchange of stage stride s is a pair of circular rolls plus a
  select (lane rolls for s < 128, sublane rolls above), so every stage is
  pure VPU elementwise work — the whole 136-stage network for a 64Ki block
  is ONE HBM read + ONE HBM write per lane.

(The O(n log n) ``bitonic_merge`` of pre-sorted halves that used to live
here is RETIRED to benchmarks/pallas_bitonic_merge.py — hardware-exact and
fast, but every production call site loses on host<->device transfer
arithmetic; see its docstring and BASELINE.md.)

The comparator is lexicographic over the leading ``num_keys`` uint32 lanes
(sign-bias bitcast once per block — Mosaic has no unsigned compare); value
lanes ride along.  Ties between equal keys are broken arbitrarily, same
contract as lax.sort(is_stable=False).  The all-ones sentinel sorts last,
so callers can pad N to a block multiple with sentinel rows and slice the
pad back off (sentinel rows are interchangeable in every caller:
count_sort gives them zero weight).

Replaces the lax.sort in ops.count_sort on TPU (same output semantics as
the reference's per-bin quickSort + heap merge, SparkBinKmerCounter
.scala:540-597); see count_sort.count_presentineled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I = jnp.int32
_U = jnp.uint32
_SENT = jnp.uint32(0xFFFFFFFF)


def _bias(x):
    """uint32 -> order-preserving int32 (Mosaic lacks unsigned compare)."""
    return pltpu.bitcast(x, _I) ^ jnp.int32(-0x80000000)


def _unbias(x):
    return pltpu.bitcast(x ^ jnp.int32(-0x80000000), _U)


def _xor_shuffle(x, t: int, axis: int, idx):
    """partner[i] = x[i ^ t] along ``axis`` (t a power of two): two circular
    rolls + a select on the index bit — no gathers."""
    size = x.shape[axis]
    fwd = pltpu.roll(x, (size - t) % size, axis=axis)  # value at i + t
    bwd = pltpu.roll(x, t, axis=axis)  # value at i - t
    return jnp.where((idx & t) == 0, fwd, bwd)


def _partner(x, s: int, ri, ci):
    """Exchange partner at linear-index stride s for a (R, 128) row-major
    block (linear index i = r*128 + c)."""
    if s < 128:
        return _xor_shuffle(x, s, 1, ci)
    return _xor_shuffle(x, s >> 7, 0, ri)


def _bit_mask(v: int, ri, ci):
    """(i & v) == 0 for linear index i = r*128 + c, v a power of two."""
    if v < 128:
        return (ci & v) == 0
    return (ri & (v >> 7)) == 0


def _stage(lanes, n_keys: int, klev: int, s: int, BL: int, ri, ci):
    """One compare-exchange stage: subsequence size klev, stride s.

    Direction: ascending iff (i & klev) == 0 (the standard XOR network; at
    klev == BL every element is ascending -> final block fully ascending).
    Each element computes pred = lex_less(a, b) with (a, b) = (other, mine)
    when direction==am_low else (mine, other); pred is the same value on
    both sides of a pair and is False on key ties, so ties never duplicate
    or lose value lanes.
    """
    others = [_partner(x, s, ri, ci) for x in lanes]
    am_low = _bit_mask(s, ri, ci)
    if klev == BL:
        m = am_low
    else:
        m = jnp.logical_not(jnp.logical_xor(_bit_mask(klev, ri, ci), am_low))
    a = [jnp.where(m, others[w], lanes[w]) for w in range(n_keys)]
    b = [lanes[w] ^ others[w] ^ a[w] for w in range(n_keys)]
    lt = a[0] < b[0]
    if n_keys > 1:
        eq = a[0] == b[0]
        for w in range(1, n_keys):
            lt = lt | (eq & (a[w] < b[w]))
            if w + 1 < n_keys:
                eq = eq & (a[w] == b[w])
    return [jnp.where(lt, others[i], lanes[i]) for i in range(len(lanes))]


def _load_biased(refs, n_keys: int):
    lanes = []
    for i, ref in enumerate(refs):
        x = ref[:]
        if i < n_keys:
            lanes.append(_bias(x))
        else:
            lanes.append(x if x.dtype == _I else pltpu.bitcast(x, _I))
    return lanes


def _store_unbiased(refs, lanes, n_keys: int):
    for i, ref in enumerate(refs):
        x = lanes[i]
        if i < n_keys:
            ref[:] = _unbias(x)
        else:
            ref[:] = x if ref.dtype == _I else pltpu.bitcast(x, _U)


def _mk_block_sort_kernel(n_lanes: int, n_keys: int, R: int, BL: int):
    def kernel(*refs):
        ins, outs = refs[:n_lanes], refs[n_lanes:]
        ri = jax.lax.broadcasted_iota(_I, (R, 128), 0)
        ci = jax.lax.broadcasted_iota(_I, (R, 128), 1)
        lanes = _load_biased(ins, n_keys)
        klev = 2
        while klev <= BL:
            s = klev >> 1
            while s >= 1:
                lanes = _stage(lanes, n_keys, klev, s, BL, ri, ci)
                s >>= 1
            klev <<= 1
        _store_unbiased(outs, lanes, n_keys)

    return kernel


@partial(jax.jit, static_argnames=("num_keys", "block", "interpret", "vma"))
def sort_blocks(cols: tuple, num_keys: int, block: int = 1 << 16,
                interpret: bool = False, vma: frozenset | None = None) -> tuple:
    """Bitonic-sort each consecutive ``block`` of rows independently.

    cols: tuple of [N] lanes — the first ``num_keys`` are uint32 keys
    compared lexicographically (full unsigned order), the rest are carried
    values (uint32 or int32; dtypes preserved).  N % block == 0, block a
    power of two >= 1024.  Returns the lanes with every block ascending
    (ties arbitrary, multiset per block preserved) — the batched-sort
    analogue of ``lax.sort(..., dimension=1)``, measured 2.2x cheaper per
    stage on TPU (benchmarks/pallas_sort_probe.py: 0.0098 vs 0.022
    ns/elem/stage at block 8Ki).

    ``vma``: mesh axis names the inputs vary over when called inside a
    shard_map body (required by check_vma, as in ops.pallas_extract).
    """
    N = cols[0].shape[0]
    n_lanes = len(cols)
    assert N % block == 0 and block >= 1024 and (block & (block - 1)) == 0
    R = block // 128
    nb = N // block
    kernel = _mk_block_sort_kernel(n_lanes, num_keys, R, block)
    spec = pl.BlockSpec((R, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def sds(dtype):
        if vma is None:
            return jax.ShapeDtypeStruct((N // 128, 128), dtype)
        return jax.ShapeDtypeStruct((N // 128, 128), dtype, vma=vma)

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec] * n_lanes,
        out_specs=tuple(spec for _ in range(n_lanes)),
        out_shape=tuple(sds(c.dtype) for c in cols),
        interpret=interpret,
    )(*[c.reshape(N // 128, 128) for c in cols])
    return tuple(o.reshape(N) for o in outs)
