"""Stage 1 — canonical k-mer / signature / bin extraction (the map side).

Array-first re-design of the reference's super-k-mer scan
(``getSuperKmers``, SparkBinKmerCounter.scala:34-169).  The reference walks
each read serially, maintaining a rolling minimizer with expiry rescans, and
emits variable-length super-k-mers.  The emitted *semantics*, proven
equivalent (see SURVEY.md §0 and the dead-code analysis of the tail branch
at SparkBinKmerCounter.scala:152-156), are per k-window:

    for every position i with no invalid base in [i, i+k):
        sig(i)  = min over j in [i, i+k-m] of norm(m-mer at j)
        bin(i)  = hash_to_bucket(sig(i), B)
        kmer(i) = min(forward window, reverse complement)   # canonical

which is exactly what this op computes for ALL positions of a [R, L] batch
at once with O(log) full-width passes — no serial state, no rescans, static
shapes, fully fusable by XLA.  Run-length grouping into super-k-mers is a
separate transport-compression op (ops.superkmer), not a correctness one.

Orientation note: the reference's getOrientation (package.scala:702-728)
returns "reverse" on palindromic ties, but forward == RC then, so taking the
lexicographic min of the two packed-word tuples yields the identical k-mer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import jbits
from ..core.bits import BASES_PER_WORD, num_words
from . import windows


class Extracted(NamedTuple):
    """Per-position stage-1 output, flattened over (read, position).

    words: [N, W] uint32 canonical k-mer, big-endian words
    bins:  [N] int32 target bin in [0, B)
    sigs:  [N] uint32 minimizer signature value (debug / histograms)
    valid: [N] bool window validity
    """

    words: jnp.ndarray
    bins: jnp.ndarray
    sigs: jnp.ndarray
    valid: jnp.ndarray


def canonical_words(codes2: jnp.ndarray, k: int) -> tuple:
    """Packed forward & RC words for every window start; returns (fwd, rc)
    lists of [R, P] uint32 arrays, P = positions count.

    codes2 must already be padded so indices up to P-1 + 16*W - 1 exist.
    """
    W = num_words(k)
    rem = k - BASES_PER_WORD * (W - 1)  # bases in last word, in [1, 16]
    L = codes2.shape[-1]
    P = L - (16 * W) + 1  # number of positions with full lookahead
    p16 = windows.rolling_pack(codes2, 16)  # [R, L-15]
    p16c = windows.rolling_pack(codes2 ^ jnp.uint32(3), 16)
    r16 = jbits.reverse16(p16c)  # r16[a] = RC of substring [a, a+16)

    fwd = []
    for w in range(W):
        sl = p16[..., 16 * w : 16 * w + P]
        if w == W - 1 and rem < 16:
            sl = sl & jnp.uint32(0xFFFFFFFF ^ ((1 << (2 * (16 - rem))) - 1))
        fwd.append(sl)
    rc = []
    for w in range(W):
        if w < W - 1 or rem == 16:
            start = k - 16 * (w + 1)
            rc.append(r16[..., start : start + P])
        else:
            sl = r16[..., 0:P] & jnp.uint32((1 << (2 * rem)) - 1)
            rc.append(sl << jnp.uint32(2 * (16 - rem)))
    return fwd, rc


def extract(codes: jnp.ndarray, k: int, m: int, B: int) -> Extracted:
    """[R, L] uint8 codes (0..3 bases, >=4 invalid/padding) -> Extracted."""
    assert codes.ndim == 2
    R, L = codes.shape
    assert L >= k, "read_len must be >= k"
    assert 4 <= m <= 15 and m < k
    P = L - k + 1  # window start positions

    W = num_words(k)
    pad = 16 * W - k + 16  # lookahead slack for 16-base packing windows
    ext = jnp.pad(codes, ((0, 0), (0, pad)), constant_values=4)
    bad = ext >= jnp.uint8(4)
    codes2 = (ext & jnp.uint8(3)).astype(jnp.uint32)

    # --- window validity: no invalid base in [i, i+k) ---
    valid = ~windows.window_any(bad[:, : P + k - 1], k)  # [R, P]

    # --- signatures: min over k-m+1 norm(m-mer) values ---
    n_mpos = P + (k - m)  # m-window positions needed
    mvals = windows.rolling_pack(codes2[:, : n_mpos + m - 1], m)
    norms = jbits.norm_mmers(mvals, m)  # [R, n_mpos]
    sigs = windows.window_min(norms, k - m + 1)  # [R, P]
    bins = jbits.hash_to_bucket(sigs, B)  # [R, P] int32

    # --- canonical packed k-mers ---
    fwd, rc = canonical_words(codes2, k)
    fwd = [f[:, :P] for f in fwd]
    rc = [r[:, :P] for r in rc]
    use_rc = jnp.zeros((R, P), dtype=bool)
    decided = jnp.zeros((R, P), dtype=bool)
    for w in range(W):
        lt = rc[w] < fwd[w]
        gt = rc[w] > fwd[w]
        use_rc = use_rc | (~decided & lt)
        decided = decided | lt | gt
    words = [jnp.where(use_rc, r, f) for f, r in zip(fwd, rc)]

    n = R * P
    return Extracted(
        words=jnp.stack([w.reshape(n) for w in words], axis=1),
        bins=bins.reshape(n),
        sigs=sigs.reshape(n),
        valid=valid.reshape(n),
    )
