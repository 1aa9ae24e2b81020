"""Skew benchmark: LPT (useCustomPartitioner=1) vs hash bin ownership on a
repeat-rich corpus — the workload the reference's custom partitioner exists
for (MultiprocessorSchedulingPartitioner.scala:33-69).

A repeat-dominated read set concentrates k-mer instances into the few bins
holding the repeat's minimizers; hash ownership can land several heavy bins
on one chip, while LPT assigns bins to chips by sampled load (longest
processing time first).  Reported per owner map:

  imbalance  = max over chips of (chip instance load / mean load)
  step wall  = distributed streaming step time on the 8-virtual-device CPU
               mesh (indicative only — the load number is the headline)

Usage: python benchmarks/skew.py [repeat_frac] [n_reads]
"""

from __future__ import annotations

import json
import os
import sys
import time

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS") != "tpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_skewed_reads(rng, n_reads: int, L: int, repeat_frac: float) -> np.ndarray:
    """repeat_frac of reads are (mutated) tandem copies of ONE ~199 bp
    repeat unit — a homogeneous minimizer profile concentrating load into
    few bins; the rest are uniform random."""
    unit = rng.integers(0, 4, size=199, dtype=np.uint8)
    reads = rng.integers(0, 4, size=(n_reads, L), dtype=np.int64).astype(np.uint8)
    n_rep = int(n_reads * repeat_frac)
    tandem = np.tile(unit, L // unit.shape[0] + 2)
    for i in range(n_rep):
        phase = int(rng.integers(0, unit.shape[0]))
        r = tandem[phase : phase + L].copy()
        mut = rng.random(L) < 0.01
        r[mut] = rng.integers(0, 4, size=int(mut.sum()))
        reads[i] = r
    return reads


def main() -> None:
    import jax

    repeat_frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.7
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k, m, B, L, n = 28, 10, 512, 512, 8

    devs = jax.devices()
    if len(devs) < n:
        devs = jax.devices("cpu")
    mesh = jax.make_mesh((n,), ("data",), devices=devs[:n])

    from fastkmer_tpu.parallel import exchange, partitioner, stream

    rng = np.random.default_rng(0)
    codes = make_skewed_reads(rng, n_reads, L, repeat_frac)

    est = exchange.estimate_bin_sizes(mesh, k, m, B)
    hist = np.asarray(est(exchange.shard_batch(mesh, codes)), dtype=np.int64)

    positions = (n_reads // n) * (L - k + 1)
    out = {"repeat_frac": repeat_frac, "reads": n_reads, "bins_hot_top8": (
        np.sort(hist)[-8:][::-1] / max(hist.sum(), 1)).round(3).tolist()}
    for name, owner in (
        ("hash", partitioner.hash_owner_map(B, n)),
        ("lpt", (partitioner.lpt_owner_map(hist, n, B) % n).astype(np.int32)),
    ):
        stats = partitioner.balance_stats(hist, owner, n)
        cap = partitioner.size_exchange_cap(hist, owner, n, positions)
        ctr = stream.DistributedCounter(
            mesh, k, m, B, cap, 1 << 20, owner, fanin=1
        )
        ctr.feed(codes)
        ctr.check()  # compile + warm
        t0 = time.perf_counter()
        ctr.feed(codes)  # same shapes: warm path, state already resident
        ctr.check()
        dt = time.perf_counter() - t0
        out[name] = {
            "imbalance": round(float(stats.get("imbalance", 0.0)), 3),
            "cap": int(cap),
            "step_ms": round(dt * 1e3, 1),
        }
    out["imbalance_ratio_hash_over_lpt"] = round(
        out["hash"]["imbalance"] / max(out["lpt"]["imbalance"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
