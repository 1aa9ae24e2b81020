"""Measure the production merge with the Pallas block-sort compaction
(round 3): count_presentineled + compact_marked at the 151M-row k=28
streaming shape, lax vs pallas compaction, plus hardware exactness at 2^22.

Usage: python benchmarks/compact_probe.py [quick]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(name, **kw):
    print(json.dumps({"measure": name, **kw}), flush=True)


def fence(x):
    while isinstance(x, (tuple, list)):
        x = x[-1]
    return np.asarray(x.ravel()[:4] if x.ndim else x)


def slope(fn, args, iters=3, warmup=2):
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
    return ((time.perf_counter() - t0) - t_lo) / iters


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.utils import jaxcache  # noqa: F401
    from fastkmer_tpu.ops import count_sort

    rng = np.random.default_rng(0)

    def merge_fn(pallas, block=8192):
        def f(x, y, z):
            sc = count_sort.count_presentineled([x, y], weights=z)
            return count_sort.compact_marked(
                (sc.words[:, 0], sc.words[:, 1]), sc.counts, sc.is_uniq,
                1 << 24, block=block, pallas=pallas,
            )
        return jax.jit(f)

    # hardware exactness at 2^22
    Nv = 1 << 22
    a = jnp.asarray(rng.integers(0, 1 << 22, size=Nv, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 8, size=Nv, dtype=np.uint32) << 8)
    w = jnp.asarray(rng.integers(1, 3, size=Nv, dtype=np.int32))
    ref = merge_fn(False)(a, b, w)
    got = merge_fn(True)(a, b, w)
    ok = (
        all(np.array_equal(np.asarray(r), np.asarray(g)) for r, g in zip(ref[0], got[0]))
        and np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
        and int(ref[2]) == int(got[2]) and int(ref[3]) == int(got[3])
    )
    emit("hw_merge_exactness_2^22", ok=bool(ok), n_u=int(ref[2]))
    if not ok or quick:
        return
    del a, b, w, ref, got

    # production shape
    K_POS = 4096 * (4096 - 28 + 1)
    n_rows = -(-(8 * K_POS + (1 << 24)) // (1 << 16)) * (1 << 16)
    a = jnp.asarray(rng.integers(0, 2**32, size=n_rows, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=n_rows, dtype=np.uint32))
    w = jnp.asarray(rng.integers(1, 3, size=n_rows, dtype=np.int32))
    variants = [("lax", False, 8192), ("pallas", True, 8192)]
    if len(sys.argv) > 1 and sys.argv[1] == "blocks":
        variants = [
            ("pallas", True, 1 << 15), ("pallas", True, 1 << 16),
            ("lax", False, 1 << 15),
        ]
    for name, pallas, block in variants:
        per = slope(merge_fn(pallas, block), (a, b, w), iters=3)
        emit(f"merge_full_151M_{name}_b{block}", marginal_s=round(per, 3))


if __name__ == "__main__":
    main()
