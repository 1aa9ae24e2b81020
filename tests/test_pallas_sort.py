"""Fused bitonic block sort (ops.pallas_sort) vs oracles, interpret mode.

Hardware exactness at real block sizes is checked separately by
benchmarks/pallas_sort_probe.py (keys bit-equal to lax.sort per block,
values multiset-preserved); here the interpreter covers the comparator
logic — unsigned order, lexicographic multi-key, tie handling (equal keys
must neither duplicate nor lose value lanes), sentinel placement — and the
compact_marked pallas path end to end.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _mk_cols(rng, n_keys, n_vals, N):
    cols = []
    for _ in range(n_keys):
        c = rng.integers(0, 1 << 32, size=N, dtype=np.uint32)
        m = rng.random(N) < 0.2
        c[m] = 0xFFFFFFFF  # sentinels (must sort last: full unsigned order)
        m2 = rng.random(N) < 0.2
        c[m2] = rng.integers(0, 8, size=int(m2.sum()), dtype=np.uint32)  # ties
        cols.append(c)
    for _ in range(n_vals):
        cols.append(rng.integers(0, 1 << 32, size=N, dtype=np.uint32))
    return cols


@pytest.mark.parametrize(
    "n_keys,n_vals,block,N",
    [(1, 0, 1024, 2048), (2, 1, 1024, 4096), (2, 1, 2048, 2048), (3, 2, 1024, 1024)],
)
def test_sort_blocks_matches_lexsort(n_keys, n_vals, block, N):
    from fastkmer_tpu.ops import pallas_sort

    rng = np.random.default_rng(7)
    cols = _mk_cols(rng, n_keys, n_vals, N)
    out = pallas_sort.sort_blocks(
        tuple(jnp.asarray(c) for c in cols), num_keys=n_keys, block=block,
        interpret=True,
    )
    out = [np.asarray(o) for o in out]
    for b in range(N // block):
        sl = slice(b * block, (b + 1) * block)
        order = np.lexsort([c[sl] for c in reversed(cols[:n_keys])])
        for i in range(n_keys):
            assert np.array_equal(out[i][sl], cols[i][sl][order])
        got = np.stack([o[sl] for o in out], 1)
        exp = np.stack([c[sl] for c in cols], 1)
        assert np.array_equal(
            got[np.lexsort(got.T[::-1])], exp[np.lexsort(exp.T[::-1])]
        ), "row multiset changed (tie handling bug)"


def test_sort_blocks_preserves_int32_value_dtype():
    from fastkmer_tpu.ops import pallas_sort

    rng = np.random.default_rng(8)
    keys = jnp.asarray(rng.integers(0, 1 << 32, size=1024, dtype=np.uint32))
    vals = jnp.asarray(rng.integers(-5, 5, size=1024, dtype=np.int32))
    k_out, v_out = pallas_sort.sort_blocks(
        (keys, vals), num_keys=1, block=1024, interpret=True
    )
    assert v_out.dtype == jnp.int32
    order = np.argsort(np.asarray(keys), kind="stable")
    # keys sorted; each value still paired with its key (no ties by chance
    # at this density is not guaranteed -> compare as multiset of pairs)
    got = np.stack([np.asarray(k_out), np.asarray(v_out).view(np.uint32)], 1)
    exp = np.stack(
        [np.asarray(keys)[order], np.asarray(vals)[order].view(np.uint32)], 1
    )
    assert np.array_equal(
        got[np.lexsort(got.T[::-1])], exp[np.lexsort(exp.T[::-1])]
    )


@pytest.mark.parametrize(
    "n_keys,n_vals,block,N",
    [(1, 0, 1024, 4096), (2, 1, 1024, 8192), (2, 1, 2048, 4096)],
)
def test_bitonic_merge_matches_full_sort(n_keys, n_vals, block, N):
    # the kernel is RETIRED to benchmarks/ (no production call site wins;
    # see benchmarks/pallas_bitonic_merge.py docstring) but stays
    # exactness-tested so it is ready the day a device-resident consumer
    # of merged runs appears
    """Merging [A ascending | B descending] (B sorted on bit-NOT keys, so
    its sentinels sit at the junction) must equal a full lexicographic sort
    of the union — the O(n log n) merge the pow2 split design relies on."""
    from benchmarks import pallas_bitonic_merge as pallas_sort

    rng = np.random.default_rng(11)
    cols = _mk_cols(rng, n_keys, n_vals, N)
    rows = np.stack(cols, 1)
    half = N // 2
    A, Bp = rows[:half], rows[half:]
    A = A[np.lexsort([A[:, i] for i in reversed(range(n_keys))])]
    Bp = Bp[np.lexsort([Bp[:, i] for i in reversed(range(n_keys))])][::-1]
    inp = np.concatenate([A, Bp], 0)
    out = pallas_sort.bitonic_merge(
        tuple(jnp.asarray(np.ascontiguousarray(inp[:, i])) for i in range(len(cols))),
        num_keys=n_keys, block=block, interpret=True,
    )
    out = [np.asarray(o) for o in out]
    order = np.lexsort([rows[:, i] for i in reversed(range(n_keys))])
    for i in range(n_keys):
        assert np.array_equal(out[i], rows[order, i])
    got = np.stack(out, 1)
    assert np.array_equal(
        got[np.lexsort(got.T[::-1])], rows[np.lexsort(rows.T[::-1])]
    )


def test_compact_marked_pallas_path_matches_lax():
    """compact_marked(pallas=True) must produce exactly what the lax path
    produces on a sorted marked run view (same block size, same stitch)."""
    from fastkmer_tpu.ops import count_sort

    rng = np.random.default_rng(9)
    N, block, out_cap = 4096, 1024, 512
    # build a sorted 2-lane run view with duplicates
    k0 = np.sort(rng.integers(0, 1 << 20, size=N, dtype=np.uint32))
    k1 = rng.integers(0, 4, size=N, dtype=np.uint32)
    order = np.lexsort((k1, k0))
    k0, k1 = k0[order], k1[order]
    cols = (jnp.asarray(k0), jnp.asarray(k1))
    valid = jnp.ones(N, bool)
    sc = count_sort.count_sorted(
        jnp.stack(cols, 1), None, valid, sentinel_safe=True
    )
    args = (
        tuple(sc.words[:, w] for w in range(2)), sc.counts, sc.is_uniq, out_cap,
    )
    ref = count_sort.compact_marked(*args, block=block)
    got = count_sort.compact_marked(
        *args, block=block, pallas=True, pallas_interpret=True
    )
    for r, g in zip(ref[0], got[0]):
        assert np.array_equal(np.asarray(r), np.asarray(g))
    assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    assert int(ref[2]) == int(got[2]) and int(ref[3]) == int(got[3])
