"""Distributed file driver + debug jobs."""

import os

import numpy as np
import pytest

from fastkmer_tpu.config import JobConfig
from fastkmer_tpu.core import bits

from . import oracles
from .test_pipeline_e2e import write_fasta


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.default_rng(21)
    reads = []
    for _ in range(50):
        ln = int(rng.integers(40, 300))
        chars = rng.choice(list("ACGT"), size=ln)
        chars[rng.random(ln) < 0.01] = "N"
        reads.append("".join(chars))
    fa = str(tmp_path / "reads.fa")
    write_fasta(fa, reads)
    return fa, reads


@pytest.mark.parametrize(
    "smer,custom_part,use_ht",
    [(False, False, False), (False, True, False), (True, False, False),
     (False, False, True), (False, True, True)],
)
def test_execute_job_distributed(tmp_path, dataset, smer, custom_part, use_ht):
    """The full 2x2 {sort,HT} x {hash,LPT} matrix on the mesh (reference
    orchestrator: SparkBinKmerCounter.scala:1031-1044) plus the smer
    transport: all must produce the identical exact table."""
    import jax

    from fastkmer_tpu.parallel import driver, exchange

    fa, reads = dataset
    mesh = jax.make_mesh((8,), (exchange.AXIS,), devices=jax.devices("cpu")[:8])
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/out_", k=28, m=10, max_b=64,
        reads_per_batch=16, read_len=512, use_ht=use_ht,
        use_custom_partitioner=custom_part, num_partition_tasks=8,
    )
    res = driver.execute_job_distributed(cfg, mesh, smer_transport=smer, verbose=False)
    expect = oracles.count_reads(reads, 28)
    kmers = bits.decode_words_batch(res.words, 28)
    got = {km.decode(): int(c) for km, c in zip(kmers, res.counts.tolist())}
    assert got == dict(expect)
    assert res.n_reads == 50
    assert res.exchange_bytes > 0

    # on-disk per-bin output parity
    from fastkmer_tpu.output import writer

    on_disk = writer.read_output_dir(cfg.output_dir)
    expect_binned = oracles.count_reads_binned(reads, 28, 10, cfg.b)
    assert {b: dict(c) for b, c in expect_binned.items()} == on_disk


def test_driver_histogram_sized_cap(tmp_path, dataset):
    """Auto cap must come from the sampled histogram (far below the
    worst case) and exchange bytes must reflect the actual caps used."""
    import jax

    from fastkmer_tpu.parallel import driver, exchange, partitioner

    fa, reads = dataset
    mesh = jax.make_mesh((8,), (exchange.AXIS,), devices=jax.devices("cpu")[:8])
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/out_", k=28, m=10, max_b=64,
        reads_per_batch=16, read_len=512, write=False,
    )
    res = driver.execute_job_distributed(cfg, mesh, verbose=False)
    expect = oracles.count_reads(reads, 28)
    kmers = bits.decode_words_batch(res.words, 28)
    got = {km.decode(): int(c) for km, c in zip(kmers, res.counts.tolist())}
    assert got == dict(expect)

    # sanity on the sizing rule itself: with ~uniform owner shares the cap
    # is ~positions/n * slack, i.e. well under the worst case for n=8
    positions = (16 // 8) * (512 - 28 + 1)
    hist = np.ones(64, dtype=np.int64)
    cap = partitioner.size_exchange_cap(
        hist, partitioner.hash_owner_map(64, 8), 8, 1 << 20, floor=1,
    )
    assert cap < (1 << 20) // 2


def test_driver_retries_undersized_cap(tmp_path, dataset):
    """cap=8 forces exchange overflow on both driver paths; the driver must
    resize-and-retry and still produce the exact table."""
    import jax

    from fastkmer_tpu.parallel import driver, exchange

    fa, reads = dataset
    mesh = jax.make_mesh((8,), (exchange.AXIS,), devices=jax.devices("cpu")[:8])
    expect = oracles.count_reads(reads, 28)
    for use_ht in (False, True):  # streaming path vs per-batch path
        cfg = JobConfig(
            dataset=fa, output_directory=str(tmp_path) + "/out_", k=28, m=10,
            max_b=64, reads_per_batch=16, read_len=512, write=False,
            use_ht=use_ht,
        )
        res = driver.execute_job_distributed(cfg, mesh, cap=8, verbose=False)
        kmers = bits.decode_words_batch(res.words, 28)
        got = {km.decode(): int(c) for km, c in zip(kmers, res.counts.tolist())}
        assert got == dict(expect)


def test_find_bin_signatures(tmp_path, dataset):
    from fastkmer_tpu import debug

    fa, reads = dataset
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/sig_", k=28, m=10, max_b=64,
        reads_per_batch=16, read_len=512, write=False,
    )
    hists = debug.find_bin_signatures(cfg)
    # every signature string must live in the bin its hash maps to, and the
    # total super-k-mer count must cover every valid window exactly once
    norm = bits.fill_norm(10)
    total_kmers = 0
    for b, hist in hists.items():
        for sig_str in hist:
            if sig_str == "<none>":
                assert b == bits.hash_to_bucket(4**10, cfg.b)
            else:
                v = 0
                for ch in sig_str:
                    v = (v << 2) | "ACGT".index(ch)
                assert int(norm[v]) == v, f"signature {sig_str} not norm-canonical"
                assert b == bits.hash_to_bucket(v, cfg.b)
    n_smers = sum(sum(h.values()) for h in hists.values())
    n_windows = sum(len(list(oracles.clean_kmers(r, 28))) for r in reads)
    assert 0 < n_smers <= n_windows  # every record covers >= 1 window

    out_dir = debug.save_bin_signatures(cfg)
    files = [f for f in os.listdir(out_dir) if f.startswith("bin_signatures")]
    assert len(files) == len(hists)
    some = open(os.path.join(out_dir, files[0])).read().splitlines()
    assert some[-1].startswith("Total\t")


def test_evaluate_partition_balance(tmp_path, dataset):
    from fastkmer_tpu import debug
    from fastkmer_tpu.parallel import partitioner

    fa, _ = dataset
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=28, m=10, max_b=64,
        reads_per_batch=16, read_len=512, write=False,
    )
    owner = partitioner.hash_owner_map(cfg.b, 4)
    out = str(tmp_path / "balance.txt")
    stats = debug.evaluate_partition_balance(cfg, owner, out)
    assert os.path.exists(out)
    assert stats["total"] > 0 and len(stats["loads"]) == 4


def test_execute_job_distributed_k32_streaming(tmp_path, dataset):
    """k % 16 == 0 on the STREAMING mesh path (constant-zero seq lane
    restores sentinel safety): exact table incl. the all-T edge case."""
    import jax

    from fastkmer_tpu.parallel import driver, exchange

    fa, reads = dataset
    # append an all-T read to hit the sentinel-ambiguity edge
    with open(fa, "a") as f:
        f.write(">allT\n" + "T" * 64 + "\n")
    reads = reads + ["T" * 64]
    mesh = jax.make_mesh((8,), (exchange.AXIS,), devices=jax.devices("cpu")[:8])
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/o32_", k=32, m=9, max_b=64,
        reads_per_batch=16, read_len=512, write=False,
    )
    res = driver.execute_job_distributed(cfg, mesh, verbose=False, streaming=True)
    expect = oracles.count_reads(reads, 32)
    kmers = bits.decode_words_batch(res.words, 32)
    got = {km.decode(): int(c) for km, c in zip(kmers, res.counts.tolist())}
    assert got == dict(expect)
    assert "A" * 32 in got  # canonical of the all-T k-mer


def test_execute_job_distributed_with_spills(tmp_path, dataset):
    """A tiny acc_cap forces host spills mid-run; the table must still be
    exact (the spill-merge path of the streaming driver)."""
    import jax

    from fastkmer_tpu.parallel import driver, exchange

    fa, reads = dataset
    mesh = jax.make_mesh((8,), (exchange.AXIS,), devices=jax.devices("cpu")[:8])
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/out_", k=28, m=10, max_b=64,
        reads_per_batch=8, read_len=512, write=False,
    )
    res = driver.execute_job_distributed(
        cfg, mesh, verbose=False, acc_cap=2048, fanin=1
    )
    expect = oracles.count_reads(reads, 28)
    kmers = bits.decode_words_batch(res.words, 28)
    got = {km.decode(): int(c) for km, c in zip(kmers, res.counts.tolist())}
    assert got == dict(expect)
