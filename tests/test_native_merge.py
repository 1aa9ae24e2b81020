"""Native k-way merge (output.native fkmerge) vs the numpy reference."""

import numpy as np
import pytest

from fastkmer_tpu.output import native as out_native


def _numpy_merge(parts, W):
    words = np.concatenate([p[0] for p in parts], axis=0)
    counts = np.concatenate([p[1] for p in parts], axis=0)
    bins = np.concatenate([p[2] for p in parts], axis=0)
    order = np.lexsort(tuple(words[:, w] for w in reversed(range(W))))
    ws, cs, bs = words[order], counts[order], bins[order]
    new = np.empty(ws.shape[0], dtype=bool)
    new[0] = True
    np.any(ws[1:] != ws[:-1], axis=1, out=new[1:])
    starts = np.flatnonzero(new)
    return ws[starts], np.add.reduceat(cs, starts), bs[starts]


@pytest.mark.parametrize("W,P", [(1, 2), (2, 3), (2, 8), (3, 5), (4, 7),
                                 (5, 4), (2, 22), (3, 1), (6, 5), (7, 9),
                                 (8, 3), (9, 4)])
def test_native_merge_matches_numpy(W, P):
    if not out_native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(W * 100 + P)
    # overlapping key universes so cross-part summation triggers
    universe = rng.integers(0, 50, size=(200, W)).astype(np.uint32)
    parts = []
    for _ in range(P):
        n = int(rng.integers(1, 120))
        rows = universe[rng.choice(200, size=n, replace=False)]
        # ascending unique within each part
        order = np.lexsort(tuple(rows[:, w] for w in reversed(range(W))))
        rows = rows[order]
        keep = np.ones(n, bool)
        keep[1:] = np.any(rows[1:] != rows[:-1], axis=1)
        rows = rows[keep]
        counts = rng.integers(1, 1000, size=rows.shape[0]).astype(np.int64)
        bins = (rows[:, 0] % 7).astype(np.int32)
        parts.append((rows, counts, bins))
    got = out_native.merge_sorted_parts(parts, W)
    exp = _numpy_merge(parts, W)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)


def test_native_merge_empty_parts():
    if not out_native.available():
        pytest.skip("no native toolchain")
    W = 2
    empty = (np.zeros((0, W), np.uint32), np.zeros(0, np.int64), np.zeros(0, np.int32))
    one = (
        np.array([[3, 4]], np.uint32),
        np.array([7], np.int64),
        np.array([1], np.int32),
    )
    w, c, b = out_native.merge_sorted_parts([empty, one, empty], W)
    np.testing.assert_array_equal(w, one[0])
    np.testing.assert_array_equal(c, one[1])
    np.testing.assert_array_equal(b, one[2])


@pytest.mark.parametrize("W", [1, 2, 3, 4, 5, 6, 7, 8])
def test_native_merge_all_ones_key(W):
    """A real all-ones key packs to the exhausted-leaf sentinel value in the
    W<=8 loser-tree fast path (u64/u128/two-limb INF); the part-index
    tie-break must keep it winning over exhausted leaves and merging across
    parts."""
    if not out_native.available():
        pytest.skip("no native toolchain")
    ones = np.full((1, W), 0xFFFFFFFF, np.uint32)
    low = np.zeros((1, W), np.uint32)
    parts = [
        (np.concatenate([low, ones]), np.array([2, 3], np.int64),
         np.array([0, 1], np.int32)),
        (ones.copy(), np.array([5], np.int64), np.array([1], np.int32)),
        (np.zeros((0, W), np.uint32), np.zeros(0, np.int64),
         np.zeros(0, np.int32)),  # exhausted from the start
    ]
    w, c, b = out_native.merge_sorted_parts(parts, W)
    np.testing.assert_array_equal(w, np.concatenate([low, ones]))
    np.testing.assert_array_equal(c, np.array([2, 8], np.int64))
    np.testing.assert_array_equal(b, np.array([0, 1], np.int32))


@pytest.mark.parametrize("W", [2, 4, 5, 7, 8])
def test_native_merge_unsigned_high_bit(W):
    """Keys with the sign bit set must compare as UNSIGNED in every path
    (packed u64/u128 and the generic word loop)."""
    if not out_native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(W)
    universe = (rng.integers(0, 1 << 32, size=(300, W), dtype=np.int64)
                .astype(np.uint32))
    universe[:150, 0] |= np.uint32(0x80000000)  # force high-bit keys
    parts = []
    for p in range(6):
        n = int(rng.integers(1, 200))
        rows = universe[rng.choice(300, size=n, replace=False)]
        order = np.lexsort(tuple(rows[:, w] for w in reversed(range(W))))
        rows = rows[order]
        keep = np.ones(rows.shape[0], bool)
        keep[1:] = np.any(rows[1:] != rows[:-1], axis=1)
        rows = rows[keep]
        parts.append((rows,
                      rng.integers(1, 9, size=rows.shape[0]).astype(np.int64),
                      (rows[:, -1] % 11).astype(np.int32)))
    got = out_native.merge_sorted_parts(parts, W)
    exp = _numpy_merge(parts, W)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)
