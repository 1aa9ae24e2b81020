"""Measure the device primitives that bound the counting pipeline on the
real TPU: lax.sort with 1/2/3 uint32 operands, large gathers, searchsorted,
cumsum — the data for choosing between sort restructuring, merge-path
merging, and a hand-written Pallas sort.

Usage: python benchmarks/primitives.py [N_log2]
Prints one JSON line per primitive.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root, when run as a script


def fence(x):
    return np.asarray(x if x.ndim == 0 else x.ravel()[:4])


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        fence(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.utils import jaxcache  # noqa: F401

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    N = 1 << lg
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    srt = jnp.asarray(np.sort(rng.integers(0, 2**32, size=N, dtype=np.uint32)))
    idx = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))

    res = {}

    s1 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False))
    res[f"sort_1op_2^{lg}"] = timeit(s1, a)

    s2 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2, is_stable=False))
    res[f"sort_2op_2^{lg}"] = timeit(s2, a, b)

    s3 = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2, is_stable=False))
    res[f"sort_2key_1val_2^{lg}"] = timeit(s3, a, b, c)

    g = jax.jit(lambda x, i: x[i])
    res[f"gather_2^{lg}"] = timeit(g, a, idx)

    ss = jax.jit(lambda s, q: jnp.searchsorted(s, q, side="left"))
    res[f"searchsorted_2^{lg}"] = timeit(ss, srt, a)

    cs = jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32)))
    res[f"cumsum_2^{lg}"] = timeit(cs, a)

    # merge-path style: rank of each element of A in sorted B + gather
    def merge_rank(s, q, v):
        r = jnp.searchsorted(s, q, side="left")
        return v[jnp.minimum(r, N - 1)]

    mr = jax.jit(merge_rank)
    res[f"searchsorted_gather_2^{lg}"] = timeit(mr, srt, a, b)

    for k, v in res.items():
        print(json.dumps({"primitive": k, "ms": round(v * 1e3, 3),
                          "ns_per_elem": round(v * 1e9 / N, 3)}))


if __name__ == "__main__":
    main()
