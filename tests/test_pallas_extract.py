"""Pallas fused extract kernel vs the jnp reference implementation —
bit-exact in interpret mode on CPU (the same kernel runs compiled on TPU,
where parity was verified on hardware)."""

import numpy as np
import pytest

from .test_extract import random_reads, to_batch


@pytest.mark.parametrize("k,m", [(28, 10), (13, 4), (31, 8), (17, 6), (33, 7), (55, 9), (64, 11), (75, 12), (97, 13), (128, 14)])
def test_pallas_extract_parity(k, m):
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.ops import extract as jex
    from fastkmer_tpu.ops import pallas_extract as pex

    B = 128
    rng = np.random.default_rng(k)
    L = 96 if k <= 64 else 160  # rows must hold at least one window
    codes = to_batch(random_reads(rng, 12, L), L)
    jc = jnp.asarray(codes)
    a = jax.jit(lambda c: jex.extract(c, k, m, B))(jc)
    b = pex.extract_pallas(jc, k, m, B, block_rows=4, interpret=True)
    va = np.asarray(a.valid)
    np.testing.assert_array_equal(va, np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.words)[va], np.asarray(b.words)[va])
    np.testing.assert_array_equal(np.asarray(a.sigs)[va], np.asarray(b.sigs)[va])
    np.testing.assert_array_equal(np.asarray(a.bins)[va], np.asarray(b.bins)[va])


@pytest.mark.parametrize("k,m", [(28, 10), (13, 4), (45, 8), (75, 12), (97, 13)])
def test_pallas_sentinel_count_parity(k, m):
    """Count-mode kernel + count_presentineled == full jnp count path."""
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.ops import count_sort
    from fastkmer_tpu.ops import extract as jex
    from fastkmer_tpu.ops import pallas_extract as pex

    B = 64
    rng = np.random.default_rng(k + 1)
    L = 80 if k <= 64 else 160
    codes = to_batch(random_reads(rng, 10, L), L)
    jc = jnp.asarray(codes)

    cols = pex.extract_pallas_sentinel(jc, k, m, B, block_rows=4, interpret=True)
    sc_p = count_sort.count_presentineled(list(cols))

    ex = jax.jit(lambda c: jex.extract(c, k, m, B))(jc)
    sc_j = count_sort.count_sorted(ex.words, None, ex.valid, sentinel_safe=True)

    sp = np.flatnonzero(np.asarray(sc_p.is_uniq))
    sj = np.flatnonzero(np.asarray(sc_j.is_uniq))
    np.testing.assert_array_equal(np.asarray(sc_p.words)[sp], np.asarray(sc_j.words)[sj])
    np.testing.assert_array_equal(np.asarray(sc_p.counts)[sp], np.asarray(sc_j.counts)[sj])
    assert int(sc_p.n_valid) == int(sc_j.n_valid)
