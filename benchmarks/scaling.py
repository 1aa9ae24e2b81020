"""Mesh-scaling validation benchmark.

Only ONE physical TPU chip is reachable in this environment, so true
ICI-scaling numbers (the >=80% reads/s efficiency target in BASELINE.md)
cannot be measured here; this script instead validates the *mechanism* —
the full distributed step (extract -> route -> all_to_all -> count) at mesh
sizes 1..8 on virtual CPU devices — and reports per-step wall times plus
exchange-byte accounting.  On a real pod slice the same code path runs
unchanged with JAX_PLATFORMS=tpu + jax.distributed.initialize().

Usage: python benchmarks/scaling.py [reads_per_chip] [read_len]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    devs_all = jax.devices()
    if len(devs_all) < 8:
        devs_all = jax.devices("cpu")  # XLA_FLAGS (set at import) gives 8 virtual devices

    from fastkmer_tpu.parallel import exchange, partitioner

    reads_per_chip = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    k, m, B = 28, 10, 512
    rng = np.random.default_rng(0)

    results = []
    for n in (1, 2, 4, 8):
        devs = devs_all[:n]
        if len(devs) < n:
            break
        mesh = jax.make_mesh((n,), (exchange.AXIS,), devices=devs)
        R = reads_per_chip * n
        codes = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
        owner = partitioner.hash_owner_map(B, n)
        # histogram-sized capacity (what the drivers do) vs the worst case
        # (every k-mer of a chip routed to one owner): the exchange-bytes
        # ratio is the point of getSuperKmersWithBinSizes' upper bound
        worst_cap = (L - k + 1) * reads_per_chip
        est = exchange.estimate_bin_sizes(mesh, k, m, B)
        hist = np.asarray(est(exchange.shard_batch(mesh, codes)), dtype=np.int64)
        cap = partitioner.size_exchange_cap(hist, owner, n, worst_cap)
        step = exchange.build_distributed_count(mesh, k, m, B, cap, owner)
        sharded = exchange.shard_batch(mesh, codes)
        np.asarray(step(sharded).n_valid)  # compile+warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            sc = step(sharded)
        np.asarray(sc.n_valid)
        dt = (time.perf_counter() - t0) / iters
        bases = R * L
        results.append(
            {
                "mesh": n,
                "reads": R,
                "step_ms": round(dt * 1e3, 2),
                "gbps": round(bases / dt / 1e9, 4),
                "exchange_bytes": exchange.exchange_bytes_per_step(n, cap, k),
                "exchange_bytes_worstcase": exchange.exchange_bytes_per_step(
                    n, worst_cap, k
                ),
                "dropped": int(sc.dropped),
            }
        )
        print(json.dumps(results[-1]))

    if len(results) >= 2:
        base = results[0]["gbps"]
        for r in results[1:]:
            r["scaling_efficiency"] = round(r["gbps"] / (base * r["mesh"]), 3)
        print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
