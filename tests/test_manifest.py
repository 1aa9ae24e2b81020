"""Manifest verification + batch-level checkpoint/resume."""

import json
import os

import numpy as np

from fastkmer_tpu.config import JobConfig
from fastkmer_tpu.output import manifest as mf

from . import oracles
from .test_pipeline_e2e import result_as_dict, write_fasta


def _mk_dataset(tmp_path, n=30, seed=3):
    rng = np.random.default_rng(seed)
    reads = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(40, 200)))) for _ in range(n)]
    fa = str(tmp_path / "r.fa")
    write_fasta(fa, reads)
    return fa, reads


def test_manifest_verify(tmp_path):
    from fastkmer_tpu import pipeline

    fa, reads = _mk_dataset(tmp_path)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=20, m=8, max_b=32,
        reads_per_batch=8, read_len=256,
    )
    pipeline.execute_job(cfg, verbose=False)
    assert mf.verify_output(cfg.output_dir)["ok"]

    # corrupt a bin file -> verification must fail
    man = json.load(open(os.path.join(cfg.output_dir, "manifest.json")))
    some_bin = next(iter(man["bins"]))
    victim = os.path.join(cfg.output_dir, f"bin{some_bin}")
    os.remove(victim)
    v = mf.verify_output(cfg.output_dir)
    assert not v["ok"] and int(some_bin) in v["missing"]


def test_checkpoint_resume(tmp_path):
    """Interrupt after 2 batches; a resumed run must skip them and still
    produce the exact table."""
    from fastkmer_tpu import pipeline
    from fastkmer_tpu.ingest import batch as batching

    fa, reads = _mk_dataset(tmp_path, n=32, seed=9)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=24, m=8, max_b=32,
        reads_per_batch=8, read_len=256, write=False,
    )
    ck = str(tmp_path / "ckpt")

    # simulate an interrupted run: process only the first half of batches
    timer_batches = list(
        batching.batch_file(fa, 0, cfg.k, cfg.reads_per_batch, cfg.read_len)
    )
    assert len(timer_batches) >= 2  # multiple batches even with dense packing
    done = len(timer_batches) // 2
    ckpt = mf.BatchCheckpointer(ck)
    pipeline.count_batches(timer_batches[:done], cfg.k, cfg.m, cfg.b, checkpointer=ckpt)
    assert ckpt.completed_batches() == done

    # resumed full run
    res = pipeline.execute_job(cfg, verbose=False, checkpoint_dir=ck)
    expect = oracles.count_reads(reads, cfg.k)
    assert result_as_dict(res, cfg.k) == dict(expect)
    assert ckpt.completed_batches() == 0  # cleared after completion


def test_repair_output(tmp_path):
    """Delete a bin file; repair_output must restore it exactly."""
    import os

    from fastkmer_tpu import pipeline
    from fastkmer_tpu.output import writer

    fa, reads = _mk_dataset(tmp_path, n=20, seed=5)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=20, m=8, max_b=32,
        reads_per_batch=8, read_len=256,
    )
    pipeline.execute_job(cfg, verbose=False)
    before = writer.read_output_dir(cfg.output_dir)
    victim = sorted(before)[1]
    os.remove(os.path.join(cfg.output_dir, f"bin{victim}"))
    status = pipeline.repair_output(cfg, verbose=False)
    assert status["ok"], status
    assert writer.read_output_dir(cfg.output_dir) == before
