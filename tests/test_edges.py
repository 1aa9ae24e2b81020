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
