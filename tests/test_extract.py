"""Stage-1 extraction vs brute-force oracles: packed canonical k-mers,
signatures, bins, and window validity over random reads with N runs."""

import numpy as np
import pytest

from fastkmer_tpu.core import bits
from fastkmer_tpu.ops import windows

from . import oracles


def random_reads(rng, n, L, n_prob=0.03):
    reads = []
    for _ in range(n):
        length = int(rng.integers(L // 3, L + 1))
        chars = rng.choice(list("ACGT"), size=length)
        mask = rng.random(length) < n_prob
        chars[mask] = "N"
        reads.append("".join(chars))
    return reads


def to_batch(reads, L):
    codes = np.full((len(reads), L), bits.INVALID_CODE, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = bits.encode_ascii(r)
    return codes


class TestWindows:
    def test_rolling_pack(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 4, size=(3, 50), dtype=np.uint32)
        for length in (1, 2, 3, 7, 10, 16):
            got = np.asarray(windows.rolling_pack(jnp.asarray(arr), length))
            for r in range(3):
                for i in range(50 - length + 1):
                    expect = 0
                    for j in range(length):
                        expect = (expect << 2) | int(arr[r, i + j])
                    assert got[r, i] == expect, (length, r, i)

    def test_window_min(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        a = rng.integers(0, 1000, size=(2, 64), dtype=np.uint32)
        for w in (1, 2, 3, 5, 8, 19, 64):
            got = np.asarray(windows.window_min(jnp.asarray(a), w))
            for r in range(2):
                for i in range(64 - w + 1):
                    assert got[r, i] == a[r, i : i + w].min(), (w, r, i)


@pytest.mark.parametrize("k,m", [(28, 10), (13, 4), (33, 7), (16, 9)])
def test_extract_matches_oracle(k, m):
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.ops import extract as ex

    B = 128
    rng = np.random.default_rng(42)
    L = 80
    reads = random_reads(rng, 12, L)
    codes = to_batch(reads, L)
    out = jax.jit(lambda c: ex.extract(c, k, m, B))(jnp.asarray(codes))
    words = np.asarray(out.words)
    bins = np.asarray(out.bins)
    sigs = np.asarray(out.sigs)
    valid = np.asarray(out.valid)

    P = L - k + 1
    norm = bits.fill_norm(m)
    n_checked = 0
    for r, read in enumerate(reads):
        for i in range(P):
            idx = r * P + i
            window = read[i : i + k] if i + k <= len(read) else None
            is_clean = window is not None and all(c in "ACGT" for c in window)
            assert bool(valid[idx]) == is_clean, (r, i)
            if not is_clean:
                continue
            n_checked += 1
            can = oracles.canonical(window)
            expect_words = bits.pack_kmer_words(bits.encode_ascii(can), k)
            assert tuple(words[idx].tolist()) == expect_words, (r, i, window)
            expect_sig = oracles.signature(window, m, norm)
            assert int(sigs[idx]) == expect_sig, (r, i, window)
            assert int(bins[idx]) == bits.hash_to_bucket(expect_sig, B)
    assert n_checked > 50  # sanity: the test exercised real windows


def test_extreme_signatures():
    """All-A read: the forward m-mer AAAAAA is disallowed (AA substring) but
    its RC TTTTTT is allowed (the reference's TTT/TGT suffix rules are
    commented out, package.scala:49-54), so sig = 4^m - 1.  An AATT-repeat
    read at m=4 makes AATT disallowed on BOTH strands (palindrome with AA),
    exercising the sentinel in the window min."""
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.ops import extract as ex

    k, m, B = 12, 6, 64
    codes = to_batch(["A" * 24], 24)
    out = jax.jit(lambda c: ex.extract(c, k, m, B))(jnp.asarray(codes))
    assert np.asarray(out.valid).all()
    assert (np.asarray(out.sigs) == 4**m - 1).all()
    assert (np.asarray(out.bins) == bits.hash_to_bucket(4**m - 1, B)).all()

    norm = bits.fill_norm(4)
    aatt = bits.encode_ascii("AATT")
    v = int(aatt[0]) << 6 | int(aatt[1]) << 4 | int(aatt[2]) << 2 | int(aatt[3])
    assert int(norm[v]) == 4**4  # sentinel: disallowed on both strands
