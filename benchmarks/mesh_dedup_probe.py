"""Mesh transport A/B: raw per-position lanes vs pre-exchange weighted
dedup (parallel.stream prededup) on a duplication-heavy coverage workload
— the measurement VERDICT r3 item #1 asks for.

Three arms over identical staged batches on an n-device mesh:
  raw    prededup=False (round-3 production transport)
  auto   prededup=None  (adaptive probe, the new default)
  dedup  prededup=True  (forced)

Reports per arm: wall time (one fence at finalize), Gbp/s,
exchange_bytes, dedup batch count; asserts all tables identical.

Usage:
  CPU 8-device mesh:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python benchmarks/mesh_dedup_probe.py --n 8
  TPU single-chip mesh: python benchmarks/mesh_dedup_probe.py --n 1 --tpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--reads", type=int, default=None, help="reads per batch")
    ap.add_argument("--len", dest="read_len", type=int, default=None)
    ap.add_argument("--genome", type=int, default=None, help="genome bases")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--fanin", type=int, default=8)
    ap.add_argument("--arms", default="raw,auto,dedup",
                    help="comma-separated subset of arms to run")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from fastkmer_tpu.parallel import exchange, partitioner, stream
    from fastkmer_tpu.utils import jaxcache  # noqa: F401

    n = args.n
    devs = jax.devices()
    if len(devs) < n:
        devs = jax.devices("cpu")
    mesh = jax.make_mesh((n,), (exchange.AXIS,), devices=devs[:n])

    K, M, B = 28, 10, 512
    if args.tpu:
        R = args.reads or 4096
        L = args.read_len or 4096
        G = args.genome or (1 << 21)  # bench.py "dup" workload shape
    else:
        R = args.reads or 512
        L = args.read_len or 1024
        G = args.genome or (1 << 13)
    NB = args.batches

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=G + L, dtype=np.int64).astype(np.uint8)
    batches = []
    for _ in range(NB):
        starts = rng.integers(0, G, size=R)
        batches.append(genome[starts[:, None] + np.arange(L)[None, :]])
    positions = R * (L - K + 1)
    log(f"n={n} R={R} L={L} G={G} NB={NB}; per-chip distinct share ~ "
        f"{min(1.0, G * 2 / (positions / n)):.3f}")

    owner = partitioner.hash_owner_map(B, n)
    cap = partitioner.size_exchange_cap(
        np.ones(B), owner, n, (R // n) * (L - K + 1)
    )
    results = {}
    tables = {}
    arms = [a for a in (("raw", False), ("auto", None), ("dedup", True))
            if a[0] in args.arms.split(",")]
    for arm, prededup in arms:
        def run():
            ctr = stream.DistributedCounter(
                mesh, K, M, B, cap, acc_cap=1 << 14, fanin=args.fanin,
                owner_map=owner, prededup=prededup, unique_ub=G + L,
            )
            for b in batches:
                ctr.feed(b, n_bases=R * L)
            out = ctr.finalize()  # the one fence
            return ctr, out

        ctr, out = run()  # warmup/compile
        t0 = time.perf_counter()
        ctr, out = run()
        dt = time.perf_counter() - t0
        bases = NB * R * L
        results[arm] = {
            "arm": arm,
            "time_s": round(dt, 3),
            "gbps": round(bases / dt / 1e9, 4),
            "exchange_bytes": ctr.exchange_bytes,
            "n_dedup_batches": ctr.n_dedup_batches,
            "uniques": int(out[0].shape[0]),
            "merge_shapes": ctr.merge_shapes[:4],
        }
        tables[arm] = (out[0].tobytes(), out[1].tobytes())
        log(json.dumps(results[arm]))

    assert len(set(tables.values())) == 1, "tables differ!"
    summary = {
        "probe": "mesh_dedup",
        "n_devices": n,
        "fanin": args.fanin,
        "platform": jax.devices()[0].platform,
        "arms": results,
    }
    if "raw" in results and "dedup" in results:
        summary["bytes_ratio_dedup_vs_raw"] = round(
            results["dedup"]["exchange_bytes"] / results["raw"]["exchange_bytes"], 3
        )
    if "raw" in results and "auto" in results:
        summary["speedup_auto_vs_raw"] = round(
            results["raw"]["time_s"] / results["auto"]["time_s"], 3
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
