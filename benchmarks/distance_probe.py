"""Device vs host pairwise-distance accumulation crossover (VERDICT r3
item #8): the host f64 blocked-BLAS Gram path vs the device masked
block-matmul kernel (multiseq.pipeline._pair_sums_device_fn) at
S in {8, 64, 256} over synthetic sorted (k-mer, seq, count) tables.

Reports seconds per arm and the resulting auto-selection threshold
sanity (U*S work units).  Run on TPU (default) or CPU (--cpu).
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


def make_table(rng, n_kmers, S, present_p):
    """Sorted unique-(group, seq) rows with ~present_p presence."""
    # vectorized: for each (g, s) cell draw presence
    keep = rng.random((n_kmers, S)) < present_p
    g, s = np.nonzero(keep)
    counts = rng.integers(1, 1000, size=g.shape[0]).astype(np.int64)
    return g.astype(np.int64), s.astype(np.int32), counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--measure", default="multisequence.SquaredEuclidean")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from fastkmer_tpu.multiseq import distances as dm
    from fastkmer_tpu.multiseq import pipeline as mp
    from fastkmer_tpu.utils import jaxcache  # noqa: F401

    measure = dm.get_measure(args.measure)
    rng = np.random.default_rng(0)
    rows = []
    for S, n_kmers, present_p in [(8, 1 << 20, 0.6), (64, 1 << 18, 0.3),
                                  (256, 1 << 16, 0.2)]:
        gid, seqs, counts = make_table(rng, n_kmers, S, present_p)
        U = gid.shape[0]
        words = np.stack(
            [(gid & 0xFFFFFFFF).astype(np.uint32),
             ((gid * 7 + 1) & 0xFFFFFFFF).astype(np.uint32)], 1
        )

        t0 = time.perf_counter()
        host = mp.accumulate_distances(words, seqs, counts, S, measure,
                                       device=False)
        t_host = time.perf_counter() - t0

        # device arm: warmup compiles, then one timed run (fenced by the
        # host pull inside _pair_sums_from_device)
        mp.accumulate_distances(words, seqs, counts, S, measure, device=True)
        t0 = time.perf_counter()
        dev = mp.accumulate_distances(words, seqs, counts, S, measure,
                                      device=True)
        t_dev = time.perf_counter() - t0

        scale = max(np.abs(host).max(), 1.0)
        err = float(np.abs(dev - host).max() / scale)
        row = {
            "S": S, "U": U, "work_US": U * S,
            "host_s": round(t_host, 4), "device_s": round(t_dev, 4),
            "speedup": round(t_host / t_dev, 2), "max_rel_err": err,
        }
        rows.append(row)
        log(json.dumps(row))
        assert err < 1e-4, err

    print(json.dumps({
        "probe": "distance_device_crossover",
        "platform": jax.devices()[0].platform,
        "measure": measure.name,
        "rows": rows,
        "auto_threshold_work_US": mp._DEVICE_PAIR_MIN_WORK,
    }))


if __name__ == "__main__":
    main()
