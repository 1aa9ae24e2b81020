"""End-to-end single-chip streaming throughput: feed synthetic batches
through the deferred DeviceAccumulator pipeline (extract-only per batch,
one weighted merge per fan-in, final table pull) and report amortized
Gbp/s — the honest number that includes all cross-batch merging, unlike
bench.py's per-batch device step.

Usage: python benchmarks/e2e.py [n_batches] [fanin]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

K, M, B = 28, 10, 512
R, L = 4096, 4096  # 16.8 Mbp per batch


def main():
    import jax.numpy as jnp

    from fastkmer_tpu import pipeline

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fanin = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    acc_lg = int(sys.argv[3]) if len(sys.argv) > 3 else 27
    use_pallas = pipeline.pallas_count_available(K)

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
        for _ in range(2)  # two distinct batches cycled: realistic dup mix
    ]

    def run():
        """The exact measured sequence — warmup must replay it verbatim so
        every merge variant (incl. capacity-triggered nparts < fanin) is
        compiled before timing; a single fresh compile through the remote
        hop costs ~1000x a step."""
        acc = pipeline.DeviceAccumulator(K, fanin=fanin, m=M, B=B, acc_cap=1 << acc_lg)
        for i in range(n_batches):
            cols = pipeline._batch_extract_keys(batches[i % 2], K, M, B, use_pallas)
            acc.add_raw(cols)
        acc._merge_pending()
        np.asarray(acc.state[2])  # fence (block_until_ready is broken via axon)
        return acc

    run()  # warmup
    t0 = time.perf_counter()
    acc = run()
    dt = time.perf_counter() - t0

    bases = R * L * n_batches
    gbps = bases / dt / 1e9
    print(json.dumps({
        "metric": "e2e_stream_throughput_k28_m10",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "n_batches": n_batches,
        "fanin": fanin,
        "acc_cap": acc.acc_cap,
        "n_unique": int(np.asarray(acc.state[2])),
    }))


if __name__ == "__main__":
    main()
