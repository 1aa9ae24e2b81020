"""Pallas TPU kernel: fused stage-1 extraction (k <= 32).

The jnp version (ops.extract) lowers to ~25 shifted-slice passes, each
materializing an [R, L]-sized intermediate in HBM.  This kernel computes
the whole stage — 2-bit repack, rolling 16-base pack, analytic norm,
window-min signature, validity, canonical fwd/RC selection, bin hash — on a
[TR, L] row block entirely in VMEM: one HBM read of the codes, one HBM
write per output.  Shifted windows become circular lane rolls
(pltpu.roll), with an explicit tail mask killing the wrapped positions.

Semantically identical to ops.extract.extract for k <= 32 (tested
bit-exact); k > 32 falls back to the jnp path.

Reference for the semantics being fused: getSuperKmers's per-window work
(SparkBinKmerCounter.scala:34-169) — see ops/extract.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import jbits
from ..core.bits import num_words
from .extract import Extracted

_U = jnp.uint32


def supported(k: int) -> bool:
    # AUTO-SELECTION gate: the range where the fused kernel WINS.  Word
    # construction is W-generic and the kernel is verified bit-exact on
    # hardware to W = 16 (k=155/201/249, round 5), but it only PAYS up to
    # W <= 8: measured at [1024, 4096] on the attached TPU, k=97 (W=7)
    # wins 13%, k=155 (W=10) ties 0.96x, k=201 (W=13) ties 0.99x at
    # TR=16 — at big W the jnp graph is compute-dominated and XLA's
    # fusion already matches one HBM pass, so auto stays jnp past 128
    # (extract_pallas itself accepts any k <= 256 when called directly).
    return k <= 128


def available(k: int) -> bool:
    """True when the fused kernel should be used for real: TPU backend,
    supported k, not disabled via FASTKMER_NO_PALLAS=1.  (Counting
    additionally needs sentinel-safe k — pipeline.pallas_count_available.)"""
    import os

    return (
        os.environ.get("FASTKMER_NO_PALLAS") != "1"
        and jax.default_backend() not in ("cpu",)
        and supported(k)
    )


def _rows_for(k: int, block_rows: int) -> int:
    """Shrink the row block as W grows: VMEM holds ~(input + chains + W
    outputs) [TR, L] i32 buffers, so halve TR past W=4 (TR=16 measured
    as good as TR=8 even at W=13 — no further shrink needed)."""
    return max(8, block_rows // 2) if num_words(k) > 4 else block_rows


_I = jnp.int32


def _as_i(x):
    return pltpu.bitcast(x, _I)


def _as_u(x):
    return pltpu.bitcast(x, _U)


def _umin(a, b):
    """uint32 min for values < 2^31 (Mosaic has no arith.minui)."""
    return _as_u(jnp.minimum(_as_i(a), _as_i(b)))


def _ult(a, b):
    """Full-range unsigned < via the sign-bias trick."""
    bias = _U(0x80000000)
    return _as_i(a ^ bias) < _as_i(b ^ bias)


def _norm_mmers(v, m):
    """Kernel-local analytic norm (signed-min variant of jbits.norm_mmers)."""
    sentinel = _U(1 << (2 * m))
    rc = jbits.rc_mmers(v, m)
    sval = jnp.where(jbits.allowed_mask(v, m), v, sentinel)
    rval = jnp.where(jbits.allowed_mask(rc, m), rc, sentinel)
    return _umin(sval, rval)


def _hash_to_bucket(s, B):
    """Kernel-local hash (int32 remainder — Mosaic has no arith.remui)."""
    key = s
    key = (key ^ _U(61)) ^ (key >> _U(16))
    key = key + (key << _U(3))
    key = key ^ (key >> _U(4))
    key = key * _U(0x27D4EB2D)
    key = key ^ (key >> _U(15))
    return _as_i(key & _U(0x7FFFFFFF)) % jnp.int32(B)


def _mk_kernel(k: int, m: int, B: int, L: int, mode: str = "full"):
    """mode="full": emit (word cols..., bins, sigs, valid).  mode="count":
    emit only the W word columns with invalid positions rewritten to the
    all-ones sentinel (requires k % 16 != 0) — the exact input the
    sentinel-safe sort wants, saving three [R, L] output streams and the
    sort-side rewrite passes.  Supports k <= 128 (W <= 8)."""
    W = num_words(k)

    def roll_back(x, s):
        # value at [i] becomes x[i+s] (left shift with wraparound)
        return pltpu.roll(x, (L - s) % L, axis=1) if s % L else x

    def kernel(codes_ref, *out_refs):
        ci = codes_ref[:].astype(_I)  # [TR, L] (signed ops only)
        badv = jnp.where(ci >= 4, _I(1), _I(0))
        b2 = _as_u(ci) & _U(3)

        # --- doubling chains: packed windows of 1,2,4,8,16 bases ---
        def chain(x):
            pows = {1: x}
            s = 1
            while s < 16:
                v = pows[s]
                pows[2 * s] = (v << _U(2 * s)) | roll_back(v, s)
                s *= 2
            return pows

        pf = chain(b2)
        pc = chain(b2 ^ _U(3))
        p16 = pf[16]
        r16 = jbits.reverse16(pc[16])  # RC of substring [i, i+16)

        # --- m-mer values composed from the binary decomposition of m ---
        mval = None
        pos = 0
        for bit in (16, 8, 4, 2, 1):
            if m & bit:
                piece = roll_back(pf[bit], pos)
                mval = piece if mval is None else ((mval << _U(2 * bit)) | piece)
                pos += bit
        norms = _norm_mmers(mval, m)

        # --- window-min signature over w = k - m + 1 norms ---
        w = k - m + 1
        p = 1 << (w.bit_length() - 1)
        if p == w and w > 1:
            p >>= 1
        g = norms
        s = 1
        while s < p:
            g = _umin(g, roll_back(g, s))
            s *= 2
        sig = _umin(g, roll_back(g, w - p)) if w > 1 else g

        # --- validity: no invalid base in [i, i+k), i <= L - k ---
        gb = badv
        pb = 1 << (k.bit_length() - 1)
        if pb == k and k > 1:
            pb >>= 1
        s = 1
        while s < pb:
            gb = jnp.maximum(gb, roll_back(gb, s))
            s *= 2
        anybad = jnp.maximum(gb, roll_back(gb, k - pb)) if k > 1 else gb
        lane = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 1)
        valid = (anybad == 0) & (lane <= L - k)

        # --- canonical packed words (general W <= 4) ---
        rem = k - 16 * (W - 1)
        himask = _U(0xFFFFFFFF ^ ((1 << (2 * (16 - rem))) - 1)) if rem < 16 else _U(0xFFFFFFFF)
        lomask = _U((1 << (2 * rem)) - 1)
        fwd = []
        rc = []
        for wdx in range(W):
            if wdx < W - 1 or rem == 16:
                fwd.append(roll_back(p16, 16 * wdx))
            else:
                fwd.append(roll_back(p16, 16 * wdx) & himask)
            if wdx < W - 1 or rem == 16:
                rc.append(roll_back(r16, k - 16 * (wdx + 1)))
            else:
                rc.append((r16 & lomask) << _U(2 * (16 - rem)))
        use_rc = jnp.zeros_like(valid)
        decided = jnp.zeros_like(valid)
        for wdx in range(W):
            lt = _ult(rc[wdx], fwd[wdx])
            gt = _ult(fwd[wdx], rc[wdx])
            use_rc = use_rc | (~decided & lt)
            decided = decided | lt | gt
        words = [jnp.where(use_rc, rc[wdx], fwd[wdx]) for wdx in range(W)]

        if mode == "count":
            ones = _U(0xFFFFFFFF)
            for wdx in range(W):
                out_refs[wdx][:] = jnp.where(valid, words[wdx], ones)
        else:
            for wdx in range(W):
                out_refs[wdx][:] = words[wdx]
            bins_ref, sigs_ref, valid_ref = out_refs[W:]
            bins_ref[:] = _hash_to_bucket(sig, B)
            sigs_ref[:] = sig
            valid_ref[:] = jnp.where(valid, _U(1), _U(0))

    return kernel


@partial(jax.jit, static_argnames=("k", "m", "B", "block_rows", "interpret", "vma"))
def extract_pallas(
    codes: jnp.ndarray, k: int, m: int, B: int, block_rows: int = 32,
    interpret: bool = False, vma: frozenset | None = None,
) -> Extracted:
    """Drop-in replacement for ops.extract.extract (k <= 32).

    ``vma``: when called inside a shard_map body, the set of mesh axis
    names the inputs vary over (shard_map's check_vma requires pallas
    out_shapes to declare it)."""
    assert k <= 256  # bit-exact to W=16 on hardware; auto gate is supported()
    R, L = codes.shape
    assert L >= k
    TR = min(_rows_for(k, block_rows), R)
    grid = (pl.cdiv(R, TR),)
    kernel = _mk_kernel(k, m, B, L)

    def bspec(dtype=None):
        return pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def sds(dtype):
        if vma is None:
            return jax.ShapeDtypeStruct((R, L), dtype)
        return jax.ShapeDtypeStruct((R, L), dtype, vma=vma)

    W = num_words(k)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec()],
        out_specs=tuple(bspec() for _ in range(W + 3)),
        out_shape=tuple(sds(jnp.int32 if i == W else jnp.uint32) for i in range(W + 3)),
        interpret=interpret,
    )(codes)
    word_arrs = outs[:W]
    bins, sigs, valid = outs[W], outs[W + 1], outs[W + 2]

    P = L - k + 1
    n = R * P
    return Extracted(
        words=jnp.stack([wa[:, :P].reshape(n) for wa in word_arrs], axis=1),
        bins=bins[:, :P].reshape(n),
        sigs=sigs[:, :P].reshape(n),
        valid=valid[:, :P].reshape(n) == _U(1),
    )


@partial(jax.jit, static_argnames=("k", "m", "B", "block_rows", "interpret"))
def extract_pallas_sentinel(
    codes: jnp.ndarray, k: int, m: int, B: int, block_rows: int = 32, interpret: bool = False
):
    """Count-mode kernel: returns pre-sentineled word columns, each [R*P],
    ready to be sort keys (invalid windows = all-ones).  k % 16 != 0."""
    assert k <= 256 and k % 16 != 0
    R, L = codes.shape
    TR = min(_rows_for(k, block_rows), R)
    kernel = _mk_kernel(k, m, B, L, mode="count")
    W = num_words(k)
    bspec = pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(R, TR),),
        in_specs=[bspec],
        out_specs=tuple(bspec for _ in range(W)),
        out_shape=tuple(jax.ShapeDtypeStruct((R, L), jnp.uint32) for _ in range(W)),
        interpret=interpret,
    )(codes)
    P = L - k + 1
    n = R * P
    return [wa[:, :P].reshape(n) for wa in outs]
