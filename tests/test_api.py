"""High-level API: count_kmers, spectrum, stats, dump, binary round-trip."""

import numpy as np

from fastkmer_tpu import api

from . import oracles
from .test_pipeline_e2e import write_fasta


def test_api_surface(tmp_path):
    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(12)]
    reads += [reads[0]]  # force duplicates
    fa = str(tmp_path / "a.fa")
    write_fasta(fa, reads)

    res = api.count_kmers(fa, k=24, m=8, bins=32, reads_per_batch=4, read_len=256)
    expect = oracles.count_reads(reads, 24)
    assert api.to_dict(res, 24) == dict(expect)

    st = api.stats(res)
    assert st["total_kmers"] == sum(expect.values())
    assert st["distinct_kmers"] == len(expect)
    assert st["unique_kmers"] == sum(1 for c in expect.values() if c == 1)
    assert st["max_count"] == max(expect.values())

    spec = api.spectrum(res)
    assert int(spec[1]) == st["unique_kmers"]
    assert spec.sum() == st["distinct_kmers"]

    out = str(tmp_path / "dump.txt")
    api.dump(res, 24, out)
    lines = open(out).read().splitlines()
    assert len(lines) == len(expect)
    keys = [l.split("\t")[0] for l in lines]
    assert keys == sorted(keys)


def test_binary_roundtrip(tmp_path):
    from fastkmer_tpu.config import JobConfig
    from fastkmer_tpu.pipeline import execute_job

    rng = np.random.default_rng(6)
    reads = ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(6)]
    fa = str(tmp_path / "b.fa")
    write_fasta(fa, reads)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=20, m=8, max_b=32,
        reads_per_batch=4, read_len=128, use_kryo_serializer=True,
    )
    res = execute_job(cfg, verbose=False)
    import os

    loaded = api.load_binary(os.path.join(cfg.output_dir, "counts.npz"))
    np.testing.assert_array_equal(loaded.words, res.words)
    np.testing.assert_array_equal(loaded.counts, res.counts)
    np.testing.assert_array_equal(loaded.bins, res.bins)


def test_api_distributed(tmp_path):
    """count_kmers_distributed: mesh counting from the library surface,
    same table as single-chip, LPT knob honored."""
    rng = np.random.default_rng(9)
    reads = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(16)]
    reads += reads[:4]  # duplicates
    fa = str(tmp_path / "d.fa")
    write_fasta(fa, reads)

    res = api.count_kmers_distributed(
        fa, n_devices=8, k=24, m=8, bins=32, reads_per_batch=8,
        read_len=256, use_custom_partitioner=True,
    )
    expect = oracles.count_reads(reads, 24)
    assert api.to_dict(res, 24) == dict(expect)
    assert res.owner_map.shape == (32,)
    assert res.balance.get("imbalance") is not None
    assert res.exchange_bytes > 0
