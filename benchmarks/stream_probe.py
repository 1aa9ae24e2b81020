"""Decompose the streaming loop's wall time on the real TPU: per-dispatch
host cost, fenced extract time, fenced merge time.  Diagnostic only."""

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

    from fastkmer_tpu import pipeline

    K, M, B = 28, 10, 512
    R, L = 4096, 4096
    G = 1 << 24
    NB = 8

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=G + L, dtype=np.uint8)
    host = [
        genome[rng.integers(0, G, size=R)[:, None] + np.arange(L)[None, :]]
        for _ in range(NB)
    ]
    t = time.perf_counter()
    staged = [jax.device_put(b) for b in host]
    t_put = time.perf_counter() - t
    t = time.perf_counter()
    for b in staged:
        np.asarray(b[0, :1])
    log(f"device_put dispatch {t_put:.2f}s, landing fence {time.perf_counter()-t:.2f}s")

    use_pallas = pipeline.pallas_count_available(K)
    log(f"pallas={use_pallas}")

    def fence(x):
        return np.asarray(x[0][:1] if isinstance(x, tuple) else x[:1])

    # --- fenced extract cost (after warmup) ---
    cols = pipeline._batch_extract_keys(staged[0], K, M, B, use_pallas)
    fence(cols)
    t = time.perf_counter()
    cols = pipeline._batch_extract_keys(staged[1], K, M, B, use_pallas)
    fence(cols)
    log(f"extract fenced: {time.perf_counter()-t:.3f}s")

    for rep in range(2):
        acc = pipeline.DeviceAccumulator(K, fanin=NB, m=M, B=B, unique_ub=G)
        t0 = time.perf_counter()
        disp = []
        for codes in staged:
            t = time.perf_counter()
            acc.add_raw(pipeline._batch_extract_keys(codes, K, M, B, use_pallas))
            disp.append(time.perf_counter() - t)
        # add_raw of batch NB triggered the merge inside _append
        t_feed = time.perf_counter() - t0
        t = time.perf_counter()
        stats = acc._stats()
        t_fence = time.perf_counter() - t
        log(
            f"rep{rep}: feed(host)={t_feed:.2f}s dispatches="
            + ",".join(f"{d:.2f}" for d in disp)
            + f" fence={t_fence:.2f}s total={t_feed+t_fence:.2f}s stats={stats}"
        )


if __name__ == "__main__":
    main()
