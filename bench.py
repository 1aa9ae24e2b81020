"""Headline benchmark: end-to-end exact k-mer counting throughput on one
chip, canonical workload shape k=28 m=10 (the reference's benchmark config,
README.md:86-90 / BASELINE.md), synthetic reads.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (BASELINE.md), so the
baseline is self-measured and pinned: BASELINE_GBPS is the first
real-TPU measurement of this same workload (round 1), making vs_baseline
the cumulative speedup of the engine over its round-1 self.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 single-chip measurement on TPU v5e (this workload, this file).
BASELINE_GBPS = 0.0698

K, M, B = 28, 10, 512
R, L = 4096, 4096  # 16.8 Mbp per step
WARMUP, ITERS = 2, 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu import pipeline  # noqa: F401  (also enables the XLA cache)

    use_pallas = pipeline.pallas_count_available(K)

    @jax.jit
    def step(codes):
        # The per-batch production step: unique k-mers + counts (bins are
        # computed once at finalize in the streaming pipeline, not per
        # batch).  Returns the FULL tables — anything less lets XLA
        # dead-code real work and inflates the number.
        if use_pallas:
            return pipeline._batch_count_pallas(codes, K, M, B, with_bins=False)
        return pipeline._batch_count(codes, K, M, B)

    rng = np.random.default_rng(0)
    host = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    codes = jnp.asarray(host)

    def sync(sc):
        # NB: jax.block_until_ready returns immediately through the axon
        # remote-TPU tunnel; an actual device_get is the reliable fence.
        # Fetching the scalar + a tiny slice fences the whole step without
        # paying D2H for the full tables.
        return np.asarray(sc.n_valid), np.asarray(sc.counts[:8]), np.asarray(sc.words[:8])


    for _ in range(WARMUP):
        sync(step(codes))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(codes)
    sync(out)
    dt = time.perf_counter() - t0

    bases = R * L * ITERS
    gbps = bases / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "count_throughput_k28_m10",
                "value": round(gbps, 4),
                "unit": "Gbp/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
