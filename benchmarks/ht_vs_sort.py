"""HT engine vs sort engine at k > 32 on the real TPU (VERDICT r2 #6).

count_hash.py's docstring claimed the HT engine's advantage "appears for
k > 32, where it sorts 2 key words instead of W" — but the W word columns
still ride as sort *values* (count_hashed permutes flag+hi+lo+W words+weight
= W+4 lanes per pass vs the sort engine's W (+1 flag when k%16==0)), so the
repo's own lane-cost economics predict the HT engine is slower for every k.
This probe settles it with marginal (slope) timings on hardware.

Both steps take PRE-EXTRACTED words (extraction cost is engine-independent)
and return 1-D outputs only (stacked [N, W] jit outputs pad the minor dim
to 128 on TPU — T(8,128) layout — and would dominate the measurement).

Usage: python benchmarks/ht_vs_sort.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fence(x):
    return np.asarray(x.ravel()[:4])


def slope(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 * iters):
        out = fn(*args)
    fence(out)
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.utils import jaxcache  # noqa: F401
    from fastkmer_tpu.core.bits import num_words
    from fastkmer_tpu.ops import count_hash, count_sort

    rng = np.random.default_rng(0)
    N = 1 << 22  # ~4.2M rows, the per-batch count shape
    for k in (28, 55, 75, 97):
        W = num_words(k)
        # random words with the pad bits zeroed (valid packed k-mers)
        words = rng.integers(0, 2**32, size=(N, W), dtype=np.uint32)
        tail_bases = k - 16 * (W - 1)
        words[:, W - 1] &= np.uint32(0xFFFFFFFF) << np.uint32(32 - 2 * tail_bases)
        valid = rng.random(N) < 0.97
        dwords = jax.device_put(words)
        dvalid = jax.device_put(valid)

        @jax.jit
        def sort_step(w, v, k=k):
            sc = count_sort.count_sorted(
                w, None, v, sentinel_safe=count_sort.sentinel_safe_for(k)
            )
            return sc.counts, sc.is_uniq

        @jax.jit
        def ht_step(w, v):
            sc, coll = count_hash.count_hashed(w, None, v)
            return sc.counts, sc.is_uniq, coll

        def first(fn):
            def g(*a):
                return fn(*a)[0]
            return g

        t_sort = slope(first(sort_step), (dwords, dvalid))
        t_ht = slope(first(ht_step), (dwords, dvalid))
        emit(k=k, W=W, sort_ms=round(t_sort * 1e3, 2), ht_ms=round(t_ht * 1e3, 2),
             ht_over_sort=round(t_ht / t_sort, 3), rows=N)


if __name__ == "__main__":
    main()
