"""Randomized cross-config fuzz: for a sweep of (k, m) covering every word
-boundary regime, both engines and the pallas-interpret kernel must agree
with the dict oracle on random N-ridden reads."""

import numpy as np
import pytest

from fastkmer_tpu.core import bits

from . import oracles
from .test_extract import random_reads, to_batch

CONFIGS = [
    (15, 4), (16, 15), (17, 5), (24, 12), (31, 10), (32, 10),
    (33, 14), (47, 8), (48, 6), (49, 13), (64, 10),
    # beyond the Pallas range (W > 4): jnp extract path, any k
    (75, 10), (97, 12),
]


@pytest.mark.parametrize("k,m", CONFIGS)
def test_fuzz_all_paths_agree(k, m):
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.ops import count_hash, count_sort
    from fastkmer_tpu.ops import extract as jex
    from fastkmer_tpu.ops import pallas_extract as pex

    B = 64
    rng = np.random.default_rng(1000 + k * 16 + m)
    L = max(2 * k, 80)
    reads = random_reads(rng, 8, L)
    codes = to_batch(reads, L)
    jc = jnp.asarray(codes)
    expect = dict(oracles.count_reads(reads, k))

    def table_from(sc):
        idx = np.flatnonzero(np.asarray(sc.is_uniq))
        kmers = bits.decode_words_batch(np.asarray(sc.words)[idx], k)
        return {
            km.decode(): int(c)
            for km, c in zip(kmers, np.asarray(sc.counts)[idx].tolist())
        }

    ex = jax.jit(lambda c: jex.extract(c, k, m, B))(jc)

    # sort engine (flag or sentinel key depending on k)
    sc = count_sort.count_sorted(
        ex.words, None, ex.valid, sentinel_safe=count_sort.sentinel_safe_for(k)
    )
    assert table_from(sc) == expect, f"sort engine mismatch k={k} m={m}"

    # HT engine
    sc_ht, collision = count_hash.count_hashed(ex.words, ex.bins, ex.valid)
    assert not bool(collision)
    ht_idx = np.flatnonzero(np.asarray(sc_ht.is_uniq))
    ht_kmers = bits.decode_words_batch(np.asarray(sc_ht.words)[ht_idx], k)
    ht = {
        km.decode(): int(c)
        for km, c in zip(ht_kmers, np.asarray(sc_ht.counts)[ht_idx].tolist())
    }
    assert ht == expect, f"HT engine mismatch k={k} m={m}"

    # pallas kernel (interpret mode)
    if pex.supported(k):
        pe = pex.extract_pallas(jc, k, m, B, block_rows=4, interpret=True)
        va = np.asarray(ex.valid)
        assert np.array_equal(va, np.asarray(pe.valid))
        assert np.array_equal(np.asarray(ex.words)[va], np.asarray(pe.words)[va])
