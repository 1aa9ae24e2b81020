"""Multiseq single-chip throughput vs plain counting at S=8 on the real
TPU (VERDICT round-1 weak #4 done-criterion: within ~2x)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu import pipeline
    from fastkmer_tpu.multiseq.pipeline import _batch_extract_keys_seq

    K, M, B = 28, 10, 512
    R, L, NB, S = 4096, 4096, 8, 8
    G = 1 << 21  # per-sequence genome

    rng = np.random.default_rng(0)
    genomes = [rng.integers(0, 4, size=G + L, dtype=np.uint8) for _ in range(S)]
    staged = []
    for _ in range(NB):
        sids = rng.integers(0, S, size=R).astype(np.int32)
        codes = np.empty((R, L), np.uint8)
        for s in range(S):
            rows = np.flatnonzero(sids == s)
            starts = rng.integers(0, G, size=rows.size)
            codes[rows] = genomes[s][starts[:, None] + np.arange(L)[None, :]]
        staged.append((jax.device_put(codes), jax.device_put(sids)))

    use_pallas = pipeline.pallas_count_available(K)
    log(f"pallas={use_pallas}")

    def run(with_seq: bool):
        acc = pipeline.DeviceAccumulator(
            K, fanin=NB, m=M, B=B, unique_ub=S * G + NB * R,
            extra_lanes=1 if with_seq else 0,
        )
        for codes, sids in staged:
            if with_seq:
                acc.add_raw(_batch_extract_keys_seq(codes, sids, K, M, B, use_pallas))
            else:
                acc.add_raw(pipeline._batch_extract_keys(codes, K, M, B, use_pallas))
        acc._merge_pending()
        return acc._stats()

    for name, ws in (("plain", False), ("multiseq", True)):
        stats = run(ws)  # warmup/compile
        t = time.perf_counter()
        stats = run(ws)
        dt = time.perf_counter() - t
        gbps = NB * R * L / dt / 1e9
        log(f"{name}: {dt:.2f}s = {gbps:.4f} Gbp/s uniques={stats['n_unique']}")


if __name__ == "__main__":
    main()
