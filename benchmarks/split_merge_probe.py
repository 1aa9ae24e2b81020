"""Split-sort + Pallas bitonic merge vs one giant lax.sort (round 3).

lax.sort's cost/elem is super-linear at merge scale (3.79 ns at 2^26 vs
5.45 at 2^27.2): sorting two 2^26 halves (the descending half via bit-NOT
keys) and merging with the O(n log n) Pallas bitonic merge should beat one
2^27 sort.  This probe measures both at the fanin-7 production geometry
(7 batches x 16.71M + 2^24 acc rows ~= 0.996 * 2^27) and checks hardware
exactness.

Usage: python benchmarks/split_merge_probe.py [lgN]
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
        x = x[0]
    return np.asarray(x.ravel()[:4])


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
    lgN = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.utils import jaxcache  # noqa: F401
    from fastkmer_tpu.ops import pallas_sort
    from benchmarks import pallas_bitonic_merge as pbm

    N = 1 << lgN
    half = N // 2
    rng = np.random.default_rng(0)

    def single(a, b, w):
        return jax.lax.sort((a, b, w), num_keys=2, is_stable=False)

    def split(a, b, w):
        sa = jax.lax.sort((a[:half], b[:half], w[:half]), num_keys=2, is_stable=False)
        sb = jax.lax.sort(
            (~a[half:], ~b[half:], w[half:]), num_keys=2, is_stable=False
        )
        cols = (
            jnp.concatenate([sa[0], ~sb[0]]),
            jnp.concatenate([sa[1], ~sb[1]]),
            jnp.concatenate([sa[2], sb[2]]),
        )
        return pbm.bitonic_merge(cols, num_keys=2, block=1 << 16)

    def merge_only(a, b, w):
        return pbm.bitonic_merge((a, b, w), num_keys=2, block=1 << 16)

    f_single, f_split = jax.jit(single), jax.jit(split)

    # exactness at 2^22 first
    Nv = 1 << 22
    va = jnp.asarray(rng.integers(0, 1 << 24, size=Nv, dtype=np.uint32))
    vb = jnp.asarray(rng.integers(0, 1 << 32, size=Nv, dtype=np.uint32))
    vw = jnp.asarray(rng.integers(1, 3, size=Nv, dtype=np.uint32))
    hv = Nv // 2

    def split_v(a, b, w):
        sa = jax.lax.sort((a[:hv], b[:hv], w[:hv]), num_keys=2, is_stable=False)
        sb = jax.lax.sort((~a[hv:], ~b[hv:], w[hv:]), num_keys=2, is_stable=False)
        cols = (
            jnp.concatenate([sa[0], ~sb[0]]),
            jnp.concatenate([sa[1], ~sb[1]]),
            jnp.concatenate([sa[2], sb[2]]),
        )
        return pbm.bitonic_merge(cols, num_keys=2, block=1 << 16)

    ref = [np.asarray(o) for o in jax.jit(single)(va, vb, vw)]
    got = [np.asarray(o) for o in jax.jit(split_v)(va, vb, vw)]
    keys_ok = np.array_equal(ref[0], got[0]) and np.array_equal(ref[1], got[1])
    gr = np.stack(got, 1)
    rr = np.stack(ref, 1)
    rows_ok = np.array_equal(gr[np.lexsort(gr.T[::-1])], rr[np.lexsort(rr.T[::-1])])
    emit("hw_split_merge_exactness_2^22", keys_ok=bool(keys_ok),
         rows_multiset_ok=bool(rows_ok))
    if not keys_ok:
        return
    del va, vb, vw, ref, got, gr, rr

    a = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    w = jnp.asarray(rng.integers(1, 3, size=N, dtype=np.uint32))
    per = slope(f_single, (a, b, w), iters=3)
    emit(f"lax_sort_2^{lgN}", marginal_s=round(per, 3),
         ns_per_elem=round(per * 1e9 / N, 3))
    per = slope(f_split, (a, b, w), iters=3)
    emit(f"split_sort_merge_2^{lgN}", marginal_s=round(per, 3),
         ns_per_elem=round(per * 1e9 / N, 3))
    # pre-structured input so the merge is measured alone
    sa = jax.jit(single)(a[:half], b[:half], w[:half])
    sbm = jax.jit(
        lambda x, y, z: jax.lax.sort((~x, ~y, z), num_keys=2, is_stable=False)
    )(a[half:], b[half:], w[half:])
    ma = jnp.concatenate([sa[0], ~sbm[0]])
    mb = jnp.concatenate([sa[1], ~sbm[1]])
    mw = jnp.concatenate([sa[2], sbm[2]])
    per = slope(jax.jit(merge_only), (ma, mb, mw), iters=4)
    emit(f"bitonic_merge_only_2^{lgN}", marginal_s=round(per, 3),
         ns_per_elem=round(per * 1e9 / N, 3))


if __name__ == "__main__":
    main()
