"""Resume/spill merge A/B: host loser tree (output/native fkmerge) vs
device bitonic_merge round trip — the measurement behind bitonic_merge's
retirement (BASELINE.md round 4, VERDICT r3 item #6).

The candidate call site merges HOST-resident sorted parts whose result is
consumed on the HOST (finalize/writer), so the device arm pays
H2D + kernel + D2H while the host merge works in place.  Measured on the
attached TPU: host 58 M rows/s vs device 1.4 M rows/s (41x) — and even on
a local PCIe link the mandatory round trip caps the device arm below the
host rate.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 22  # rows per part


def sorted_part(seed):
    r = np.random.default_rng(seed)
    w = r.integers(0, 1 << 32, size=(N, 2), dtype=np.int64).astype(np.uint32)
    w = w[np.lexsort((w[:, 1], w[:, 0]))]
    keep = np.ones(N, bool)
    keep[1:] = np.any(w[1:] != w[:-1], axis=1)
    w = w[keep]
    return (w, np.ones(w.shape[0], np.int64), np.zeros(w.shape[0], np.int32))


def pad_cols(p, desc):
    """Pad a sorted part to N rows with sentinels placed so that
    [A ascending | B descending] is bitonic (B's sentinels lead)."""
    w, c, _b = p
    n = w.shape[0]
    cols = [np.full(N, 0xFFFFFFFF, np.uint32) for _ in range(2)] + [
        np.zeros(N, np.int32)
    ]
    if desc:
        cols[0][N - n:] = w[::-1, 0]
        cols[1][N - n:] = w[::-1, 1]
        cols[2][N - n:] = c[::-1].astype(np.int32)
    else:
        cols[0][:n] = w[:, 0]
        cols[1][:n] = w[:, 1]
        cols[2][:n] = c.astype(np.int32)
    return cols


def main():
    import jax

    from benchmarks import pallas_bitonic_merge as pbm
    from fastkmer_tpu.output import native as out_native
    from fastkmer_tpu.utils import jaxcache  # noqa: F401

    pa, pb = sorted_part(1), sorted_part(2)
    rows = pa[0].shape[0] + pb[0].shape[0]

    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        out_native.merge_sorted_parts([pa, pb], 2)
        best = min(best, time.perf_counter() - t)

    host_cols = [
        np.concatenate([a, b])
        for a, b in zip(pad_cols(pa, False), pad_cols(pb, True))
    ]

    def run_device():
        dev = [jax.device_put(c) for c in host_cols]  # H2D
        out = pbm.bitonic_merge(tuple(dev), num_keys=2, block=1 << 16)
        return [np.asarray(o) for o in out]  # D2H fence

    run_device()  # compile warmup
    best_d = 1e9
    for _ in range(3):
        t = time.perf_counter()
        run_device()
        best_d = min(best_d, time.perf_counter() - t)

    print(json.dumps({
        "probe": "resume_merge",
        "platform": jax.devices()[0].platform,
        "rows": rows,
        "host_s": round(best, 3),
        "host_mrows_s": round(rows / best / 1e6, 1),
        "device_roundtrip_s": round(best_d, 3),
        "device_mrows_s": round(2 * N / best_d / 1e6, 1),
        "host_advantage": round(best_d / best, 1),
        "note": "device arm excludes the run-total epilogue the host "
                "merge already performs — the gap is understated",
    }))


if __name__ == "__main__":
    main()
