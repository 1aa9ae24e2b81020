"""Ingest tests: python parser semantics, native C++ parity, chunking."""

import gzip

import numpy as np
import pytest

from fastkmer_tpu.core import bits
from fastkmer_tpu.ingest import batch as batching
from fastkmer_tpu.ingest import fasta


def test_fasta_multiline_and_invalid(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">r1 desc\nACGT\nACNG\n>r2\nTT\n\n>empty\n>r3\nacgt\n")
    recs = list(fasta.iter_fasta(str(fa)))
    assert [r[0] for r in recs] == ["r1 desc", "r2", "empty", "r3"]
    assert recs[0][1] == b"ACGTACNG"
    assert recs[2][1] == b""
    # lowercase is invalid (reference treats non-uppercase-ACGT as N-like)
    assert np.all(bits.encode_ascii(recs[3][1]) == 4)


def test_fastq(tmp_path):
    fq = tmp_path / "a.fq"
    fq.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+r2\nJJJJ\n")
    recs = list(fasta.iter_fastq(str(fq)))
    assert recs == [("r1", b"ACGT"), ("r2", b"GGCC")]
    assert fasta.sniff_format(str(fq)) == "fastq"


def test_native_gzip_batches_match_python(tmp_path):
    """batch_file on a .gz via the native gunzip+parse path must produce
    byte-identical batches to the pure-python gzip path."""
    import pytest

    from fastkmer_tpu.ingest import native
    from fastkmer_tpu.ingest.batch import batch_file

    if not (native.available() and native.has_gunzip()):
        pytest.skip("native gunzip unavailable")
    rng = np.random.default_rng(17)
    reads = [
        "".join(rng.choice(list("ACGTN"), p=[0.24] * 4 + [0.04],
                           size=int(rng.integers(30, 200))))
        for _ in range(40)
    ]
    plain = tmp_path / "g.fa"
    with open(plain, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    gz = tmp_path / "g.fa.gz"
    with gzip.open(gz, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")

    a = list(batch_file(str(plain), 0, 21, 8, 256, use_native=True))
    b = list(batch_file(str(gz), 0, 21, 8, 256, use_native=True))
    c = list(batch_file(str(gz), 0, 21, 8, 256, use_native=False))
    assert len(a) == len(b) == len(c)
    for (x, nx, bx), (y, ny, by), (z, nz, bz) in zip(a, b, c):
        np.testing.assert_array_equal(x, y)
        np.testing.assert_array_equal(x, z)
        assert nx == ny == nz and bx == by == bz


def test_native_gunzip_truncated_raises(tmp_path):
    """A truncated .gz must raise, never silently return partial sequence
    (silent truncation = wrong counts; python's gzip raises EOFError)."""
    from fastkmer_tpu.ingest import native

    if not (native.available() and native.has_gunzip()):
        pytest.skip("native gunzip unavailable")
    payload = (b">r1\n" + b"ACGT" * 4000 + b"\n") * 4
    full = gzip.compress(payload)
    # whole file round-trips
    out = native.gunzip(np.frombuffer(full, dtype=np.uint8))
    assert out.tobytes() == payload
    # cut mid-member at several points: error code -5, not partial data
    for cut in (len(full) - 1, len(full) // 2, 20):
        trunc = np.frombuffer(full[:cut], dtype=np.uint8)
        with pytest.raises(RuntimeError, match="-5"):
            native.gunzip(trunc)


def test_gzip_transparent(tmp_path):
    fa = tmp_path / "a.fa.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">r1\nACGTACGT\n")
    assert list(fasta.iter_records(str(fa))) == [("r1", b"ACGTACGT")]


def test_chunk_sequence_lossless():
    seq = bytes(np.random.default_rng(0).choice(list(b"ACGT"), size=1000))
    k = 28
    chunks = list(fasta.chunk_sequence(seq, k, 256))
    # windows covered exactly once across chunk owned regions
    stride = 256 - (k - 1)
    owned = []
    for i, c in enumerate(chunks):
        start = i * stride
        n_windows = len(c) - k + 1
        owned.extend(range(start, start + n_windows))
    assert owned == list(range(len(seq) - k + 1))
    # chunk overlap boundary check: consecutive chunks share k-1 bases
    for i in range(len(chunks) - 1):
        assert chunks[i][-(k - 1):] == chunks[i + 1][: k - 1]


class TestNative:
    def test_native_builds(self):
        from fastkmer_tpu.ingest import native

        assert native.available(), "g++ build of fkingest.so failed"

    def test_native_encode_matches(self):
        from fastkmer_tpu.ingest import native

        data = b"ACGTNacgtXZ\rT"
        np.testing.assert_array_equal(native.encode(data), bits.encode_ascii(data))

    def test_native_fasta_parity(self, tmp_path):
        from fastkmer_tpu.ingest import native

        rng = np.random.default_rng(2)
        reads = []
        for i in range(25):
            ln = int(rng.integers(5, 900))
            chars = rng.choice(list("ACGTN"), size=ln, p=[0.24, 0.24, 0.24, 0.24, 0.04])
            reads.append("".join(chars))
        fa = tmp_path / "big.fa"
        with open(fa, "w") as f:
            for i, r in enumerate(reads):
                f.write(f">read{i} some description\n")
                for j in range(0, len(r), 61):
                    f.write(r[j : j + 61] + "\n")

        codes, starts = native.parse_file(str(fa), "fasta")
        assert starts.shape[0] == len(reads) + 1
        for i, r in enumerate(reads):
            got = codes[starts[i] : starts[i + 1]]
            np.testing.assert_array_equal(got, bits.encode_ascii(r), err_msg=f"read {i}")

        # full batch parity: native vs python paths
        k, R, L = 28, 7, 256
        nb = list(batching.batch_file(str(fa), 0, k, R, L, use_native=True))
        pb = list(batching.batch_file(str(fa), 0, k, R, L, use_native=False))
        assert len(nb) == len(pb)
        for (a, na, ba), (b, nb_, bb) in zip(nb, pb):
            np.testing.assert_array_equal(a, b)
            assert (na, ba) == (nb_, bb)

    def test_native_fastq_parity(self, tmp_path):
        from fastkmer_tpu.ingest import native

        fq = tmp_path / "x.fq"
        fq.write_text("@r1 d\nACGTNN\n+\nIIIIII\n@r2\nGG\nCC\n+x\nJJJJ\n")
        codes, starts = native.parse_file(str(fq), "fastq")
        assert starts.tolist() == [0, 6, 10]
        np.testing.assert_array_equal(codes[:6], bits.encode_ascii(b"ACGTNN"))
        np.testing.assert_array_equal(codes[6:10], bits.encode_ascii(b"GGCC"))


def test_prefetched_iterator():
    from fastkmer_tpu.ingest.prefetch import prefetched

    assert list(prefetched(iter(range(10)), depth=2)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("parse error")

    import pytest as _pytest

    it = prefetched(boom())
    assert next(it) == 1
    with _pytest.raises(ValueError):
        next(it)


def test_memsize():
    import numpy as np

    from fastkmer_tpu.utils import memsize

    assert memsize.nbytes({"a": np.zeros(10, np.uint32), "b": [np.zeros(2, np.uint8)]}) == 42
    assert memsize.human(2048) == "2.0KB"


def test_native_dump_lines_matches_python():
    """fk_dump_lines must produce byte-identical <KMER>\\t<count> lines."""
    from fastkmer_tpu.core import bits
    from fastkmer_tpu.ingest import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for k in (5, 16, 28, 33, 64):
        W = bits.num_words(k)
        words = rng.integers(0, 2**32, size=(64, W), dtype=np.uint32)
        pad_bits = (16 - k % 16) % 16 * 2
        if pad_bits:
            words[:, W - 1] &= np.uint32(0xFFFFFFFF) << pad_bits
        counts = np.concatenate(
            [np.array([0, 1, 9, 10], np.int64),
             rng.integers(1, 10**14, size=60).astype(np.int64)]
        )
        expect = b"".join(
            km + b"\t" + str(int(c)).encode() + b"\n"
            for km, c in zip(bits.decode_words_batch(words, k), counts.tolist())
        )
        assert native.dump_lines(words, counts, k) == expect


def test_dense_packing_exact_and_denser():
    """Dense row packing must produce the identical count table as
    row-per-read (separators split windows exactly like record
    boundaries), using far fewer batches."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fastkmer_tpu import pipeline
    from fastkmer_tpu.core import bits
    from fastkmer_tpu.ingest import batch as batching

    from . import oracles

    rng = np.random.default_rng(11)
    k, m, B = 28, 10, 64
    # mixed lengths incl. reads that exactly fill a row and tiny ones
    lens = [150] * 40 + [512, 511, 29, 28, 63] + [150] * 15
    reads = []
    for L in lens:
        s = "".join(rng.choice(list("ACGTACGTN"), L))
        reads.append(s.encode())

    def run(packer):
        batches = list(packer((r for r in reads), 8, 512))
        res = pipeline.count_batches(iter(batches), k, m, B)
        return batches, res

    b_dense, r_dense = run(batching.batch_codes_dense)
    b_rows, r_rows = run(batching.batch_codes)

    np.testing.assert_array_equal(r_dense.words, r_rows.words)
    np.testing.assert_array_equal(r_dense.counts, r_rows.counts)
    assert r_dense.n_reads == r_rows.n_reads == len(reads)
    assert r_dense.n_bases == r_rows.n_bases == sum(lens)
    assert len(b_dense) < len(b_rows), "dense packing should use fewer batches"

    expect = oracles.count_reads([r.decode() for r in reads], k)
    got = {
        km.decode(): int(c)
        for km, c in zip(bits.decode_words_batch(r_dense.words, k), r_dense.counts)
    }
    assert got == dict(expect)
