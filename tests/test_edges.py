"""Edge cases: degenerate inputs must produce exact (often empty) results,
never crashes — the robustness the reference left to Spark task retries."""

import numpy as np
import pytest

from fastkmer_tpu.config import JobConfig
from fastkmer_tpu.core import bits

from . import oracles
from .test_pipeline_e2e import result_as_dict, write_fasta


def run_job(tmp_path, reads, **kw):
    from fastkmer_tpu import pipeline

    fa = str(tmp_path / "e.fa")
    write_fasta(fa, reads)
    defaults = dict(
        dataset=fa, output_directory=str(tmp_path) + "/", max_b=32,
        reads_per_batch=4, read_len=128, write=False,
    )
    defaults.update(kw)
    cfg = JobConfig(**defaults)
    return pipeline.execute_job(cfg, verbose=False), cfg


def test_empty_file(tmp_path):
    res, _ = run_job(tmp_path, [], k=20, m=8)
    assert res.words.shape[0] == 0 and res.n_instances == 0


def test_reads_shorter_than_k(tmp_path):
    res, _ = run_job(tmp_path, ["ACGT", "GG", "T"], k=20, m=8)
    assert res.words.shape[0] == 0


def test_read_exactly_k(tmp_path):
    reads = ["ACGTACGTACGTACGTACGT"]  # len 20 == k
    res, _ = run_job(tmp_path, reads, k=20, m=8)
    d = result_as_dict(res, 20)
    assert d == dict(oracles.count_reads(reads, 20))
    assert sum(d.values()) == 1


def test_all_n_reads(tmp_path):
    res, _ = run_job(tmp_path, ["N" * 50, "NNNNACGTNNNN"], k=20, m=8)
    assert res.words.shape[0] == 0


def test_m_equals_k_minus_1(tmp_path):
    rng = np.random.default_rng(0)
    reads = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(5)]
    res, _ = run_job(tmp_path, reads, k=12, m=11)
    assert result_as_dict(res, 12) == dict(oracles.count_reads(reads, 12))


def test_single_bin(tmp_path):
    rng = np.random.default_rng(1)
    reads = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(5)]
    res, cfg = run_job(tmp_path, reads, k=16, m=7, max_b=1)
    assert cfg.b == 1
    assert (res.bins == 0).all()
    assert result_as_dict(res, 16) == dict(oracles.count_reads(reads, 16))


def test_n_at_chunk_boundary(tmp_path):
    """Long-mode chunking with an N exactly at the k-1 overlap boundary."""
    rng = np.random.default_rng(2)
    k = 20
    genome = "".join(rng.choice(list("ACGT"), size=1000))
    # place Ns straddling the first chunk boundary (read_len=128 -> stride 109)
    genome = genome[:127] + "N" + genome[128:]
    res, _ = run_job(
        tmp_path, [genome], k=k, m=8, sequence_type=1, read_len=128
    )
    assert result_as_dict(res, k) == dict(oracles.count_reads([genome], k))


def test_lowercase_and_iupac_treated_invalid(tmp_path):
    reads = ["ACGTacgtACGTRYKMACGTACGTACGT"]
    res, _ = run_job(tmp_path, reads, k=8, m=4)
    assert result_as_dict(res, 8) == dict(oracles.count_reads(reads, 8))


def test_counts_exceeding_run_caps(tmp_path):
    """A single k-mer repeated massively (homopolymer) — counts must be
    exact, including across batch merging."""
    reads = ["C" * 500] * 3
    res, _ = run_job(tmp_path, reads, k=20, m=8, read_len=600, reads_per_batch=2)
    d = result_as_dict(res, 20)
    # canonical of C^20 is G^20's RC -> C^20 vs G^20: min is C^20
    assert d == {"C" * 20: 3 * (500 - 20 + 1)}


def test_duplicate_heavy_merging(tmp_path):
    """Same reads in every batch: weighted merges must sum exactly."""
    rng = np.random.default_rng(3)
    base_read = "".join(rng.choice(list("ACGT"), size=100))
    reads = [base_read] * 17
    res, _ = run_job(tmp_path, reads, k=24, m=9, reads_per_batch=3)
    expect = {km: 17 * c for km, c in oracles.count_reads([base_read], 24).items()}
    assert result_as_dict(res, 24) == expect


def test_pow2_pad_sort_path_exact():
    """_sort_sliced's pow2 pad engages only above the size floor; at an
    engaged size the padded sort must be indistinguishable from the
    unpadded semantics (valid rows + run totals + HT fingerprints)."""
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.ops import count_hash, count_sort

    N = (1 << 18) + 1000  # pad target 2^19, within 10%? 1.998x -> NO pad
    assert count_sort.pow2_pad_rows(N) == 0
    N = (1 << 19) - 9000  # within 10% of 2^19 -> pad engages
    pad = count_sort.pow2_pad_rows(N)
    assert pad == 9000
    assert count_sort.pow2_pad_rows(1 << 19) == 0  # exact pow2: no-op
    assert count_sort.pow2_pad_rows(100) == 0  # below floor

    rng = np.random.default_rng(3)
    # small key universe -> many duplicate runs; ~10% invalid rows
    words = rng.integers(0, 500, size=(N, 2)).astype(np.uint32)
    valid = rng.random(N) > 0.1

    @jax.jit
    def run(w, v):
        return count_sort.count_sorted(w, None, v, sentinel_safe=True)

    sc = run(jnp.asarray(words), jnp.asarray(valid))
    uniq = np.asarray(sc.is_uniq)
    got = {
        tuple(w): int(c)
        for w, c in zip(np.asarray(sc.words)[uniq], np.asarray(sc.counts)[uniq])
    }
    expect: dict = {}
    for row, v in zip(words, valid):
        if v:
            t = (int(row[0]), int(row[1]))
            expect[t] = expect.get(t, 0) + 1
    assert got == expect
    assert int(np.asarray(sc.n_valid)) == sum(expect.values())

    @jax.jit
    def run_ht(w, v):
        return count_hash.count_hashed(w, None, v)

    sch, coll = run_ht(jnp.asarray(words), jnp.asarray(valid))
    assert not bool(np.asarray(coll))
    uh = np.asarray(sch.is_uniq)
    got_h = {
        tuple(w): int(c)
        for w, c in zip(np.asarray(sch.words)[uh], np.asarray(sch.counts)[uh])
    }
    assert got_h == expect
