"""Recompute a k-mer's bin from its packed canonical words.

The signature (minimizer) is a pure function of the k-mer string (SURVEY.md
§0), so the bin never needs to ride through sorts or collectives as a
carried column — recomputing it with ~k·log(k) elementwise VPU ops over the
final rows is far cheaper than permuting a 4-byte lane through every pass
of a bitonic sort or shipping it across ICI.  This is a TPU-specific
inversion of the reference design, where the bin key IS the shuffle route
and must travel with the payload.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import jbits
from ..core.bits import BASES_PER_WORD, num_words
from . import windows


def unpack_words(words: jnp.ndarray, k: int) -> jnp.ndarray:
    """[N, W] packed uint32 -> [N, k] 2-bit codes (uint32)."""
    N, W = words.shape
    assert W == num_words(k)
    cols = []
    for pos in range(k):
        w, j = divmod(pos, BASES_PER_WORD)
        shift = jnp.uint32(2 * (BASES_PER_WORD - 1 - j))
        cols.append((words[:, w] >> shift) & jnp.uint32(3))
    return jnp.stack(cols, axis=1)


def signatures_from_words(words: jnp.ndarray, k: int, m: int) -> jnp.ndarray:
    """Minimizer signature of each packed k-mer row ([N] uint32)."""
    codes2 = unpack_words(words, k)  # [N, k]
    mvals = windows.rolling_pack(codes2, m)  # [N, k-m+1]
    norms = jbits.norm_mmers(mvals, m)
    return windows.window_min(norms, k - m + 1)[:, 0]


def bins_from_words(words: jnp.ndarray, k: int, m: int, B: int) -> jnp.ndarray:
    """Bin id of each packed k-mer row ([N] int32)."""
    return jbits.hash_to_bucket(signatures_from_words(words, k, m), B)
