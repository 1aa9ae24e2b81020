"""Unit tests for the bit-level core: numpy host versions vs brute-force
Python, and jnp device versions vs numpy (bit-exact)."""

import numpy as np
import pytest

from fastkmer_tpu.core import bits

from . import oracles


def brute_is_allowed(s: str) -> bool:
    # reference semantics (package.scala:46-75): no "AA" substring, no "ACA" prefix
    return "AA" not in s and not s.startswith("ACA")


def int_to_str(v: int, m: int) -> str:
    return "".join("ACGT"[(v >> (2 * (m - 1 - i))) & 3] for i in range(m))


@pytest.mark.parametrize("m", [4, 5, 7])
def test_is_allowed_matches_string_rule(m):
    for v in range(4**m):
        s = int_to_str(v, m)
        assert bits.is_allowed(v, m) == brute_is_allowed(s), s


@pytest.mark.parametrize("m", [4, 6])
def test_allowed_mask_vectorized(m):
    v = np.arange(4**m, dtype=np.uint32)
    mask = bits.allowed_mask(v, m)
    for x in range(0, 4**m, 7):
        assert bool(mask[x]) == bits.is_allowed(x, m)


@pytest.mark.parametrize("m", [4, 8, 10])
def test_rc_mmers(m):
    rng = np.random.default_rng(0)
    v = rng.integers(0, 4**m, size=200, dtype=np.uint32)
    rc = bits.rc_mmers(v, m)
    for x, r in zip(v.tolist(), rc.tolist()):
        assert r == bits.reverse_complement_int(x, m)
        assert int_to_str(r, m) == oracles.revcomp(int_to_str(x, m))


@pytest.mark.parametrize("m", [4, 6])
def test_fill_norm_semantics(m):
    norm = bits.fill_norm(m)
    S = 4**m
    for v in range(0, 4**m, 5):
        rc = bits.reverse_complement_int(v, m)
        expect = min(
            v if bits.is_allowed(v, m) else S,
            rc if bits.is_allowed(rc, m) else S,
        )
        assert int(norm[v]) == expect


def test_hash_to_bucket_known_values():
    # hand-computed with int32 wraparound semantics of package.scala:686-695
    def ref_hash(s, B):
        mask = 0xFFFFFFFF
        key = ((s ^ 61) ^ (s >> 16)) & mask
        key = (key + (key << 3)) & mask
        key = key ^ (key >> 4)
        key = (key * 0x27D4EB2D) & mask
        key = key ^ (key >> 15)
        return (key & 0x7FFFFFFF) % B

    for s in [0, 1, 61, 12345, 4**10, 2**31 - 1]:
        for B in [7, 512, 2048]:
            assert bits.hash_to_bucket(s, B) == ref_hash(s, B)
    arr = np.array([0, 1, 61, 12345], dtype=np.uint32)
    np.testing.assert_array_equal(
        bits.hash_to_bucket(arr, 512), [ref_hash(s, 512) for s in arr.tolist()]
    )


@pytest.mark.parametrize("k", [5, 16, 28, 33, 64])
def test_pack_roundtrip(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, size=k).astype(np.uint8)
    words = bits.pack_kmer_words(codes, k)
    assert len(words) == bits.num_words(k)
    np.testing.assert_array_equal(bits.unpack_kmer_words(words, k), codes)
    s = bits.decode_codes(codes)
    assert bits.words_to_str(words, k) == s


def test_pack_order_is_lexicographic():
    rng = np.random.default_rng(1)
    k = 28
    pairs = []
    for _ in range(100):
        codes = rng.integers(0, 4, size=k).astype(np.uint8)
        pairs.append((bits.decode_codes(codes), bits.pack_kmer_words(codes, k)))
    pairs_by_str = sorted(pairs, key=lambda p: p[0])
    pairs_by_words = sorted(pairs, key=lambda p: p[1])
    assert pairs_by_str == pairs_by_words


def test_decode_words_batch():
    rng = np.random.default_rng(2)
    k = 28
    rows = []
    expect = []
    for _ in range(10):
        codes = rng.integers(0, 4, size=k).astype(np.uint8)
        rows.append(bits.pack_kmer_words(codes, k))
        expect.append(bits.decode_codes(codes).encode())
    got = bits.decode_words_batch(np.array(rows, dtype=np.uint32), k)
    assert got == expect


def test_encode_ascii_invalid_chars():
    codes = bits.encode_ascii(b"ACGTNacgtX\n")
    np.testing.assert_array_equal(codes[:4], [0, 1, 2, 3])
    assert np.all(codes[4:] == bits.INVALID_CODE)


class TestDeviceParity:
    """jnp versions bit-exact vs numpy versions."""

    def test_rc_allowed_norm_hash(self):
        import jax
        import jax.numpy as jnp

        from fastkmer_tpu.core import jbits

        rng = np.random.default_rng(3)
        for m in (4, 10):
            v = rng.integers(0, 4**m, size=1000, dtype=np.uint32)
            jv = jnp.asarray(v)
            f = jax.jit(
                lambda x, m=m: (
                    jbits.rc_mmers(x, m),
                    jbits.allowed_mask(x, m),
                    jbits.norm_mmers(x, m),
                    jbits.hash_to_bucket(x, 2048),
                )
            )
            rc, allowed, norm, hsh = (np.asarray(a) for a in f(jv))
            np.testing.assert_array_equal(rc, bits.rc_mmers(v, m))
            np.testing.assert_array_equal(allowed, bits.allowed_mask(v, m))
            np.testing.assert_array_equal(norm, bits.fill_norm(m)[v])
            np.testing.assert_array_equal(hsh, bits.hash_to_bucket(v, 2048))
