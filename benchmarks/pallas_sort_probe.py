"""Calibrate the Pallas bitonic block sort on hardware (round 3).

The verified roofline re-opened the Pallas-sort question: lax.sort runs at
~150 bandwidth-pass-equivalents, so a fused comparator network has 4-15x
headroom IF the VPU can chew the stages fast enough.  This probe answers
the go/no-go with one number: marginal ns/elem for the 136-stage 64Ki
block sort (3 lanes: 2 keys + 1 value), from which ns/stage extrapolates
the full merge-path sort (block sort + ~10 merge levels of ~17 stages).

Also verifies the kernel bit-exact against per-block lax.sort ON HARDWARE
(the interpret-mode oracle already passed on CPU).

Usage: python benchmarks/pallas_sort_probe.py [lgN] [blocks...]
Prints one JSON line per measurement; diagnostics to stderr.
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


def run_iters(fn, args, iters):
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return time.perf_counter() - t0


def slope(fn, args, iters=6, warmup=2):
    for _ in range(warmup):
        fence(fn(*args))
    t_lo = run_iters(fn, args, iters)
    t_hi = run_iters(fn, args, 2 * iters)
    return (t_hi - t_lo) / iters, t_lo / iters


def n_stages(block):
    lb = block.bit_length() - 1
    return lb * (lb + 1) // 2


def main():
    lgN = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    blocks = [int(b) for b in sys.argv[2:]] or [1 << 15, 1 << 16, 1 << 17]
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.utils import jaxcache  # noqa: F401
    from fastkmer_tpu.ops import pallas_sort

    N = 1 << lgN
    rng = np.random.default_rng(0)
    cols = tuple(
        jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        for _ in range(3)
    )

    # hardware exactness first (small N to keep the D2H pull sane)
    Nv = 1 << 18
    vb = 1 << 15
    vcols = tuple(c[:Nv] for c in cols)
    got = [np.asarray(o) for o in pallas_sort.sort_blocks(vcols, num_keys=2, block=vb)]
    ref = [
        np.asarray(o)
        for o in jax.jit(
            lambda a, b, c: jax.lax.sort(
                (a.reshape(-1, vb), b.reshape(-1, vb), c.reshape(-1, vb)),
                dimension=1, num_keys=2, is_stable=False,
            )
        )(*vcols)
    ]
    keys_ok = np.array_equal(got[0].reshape(-1, vb), ref[0]) and np.array_equal(
        got[1].reshape(-1, vb), ref[1]
    )
    # values: per-block row-multiset equality (host-side lexsort)
    vals_ok = True
    for b in range(Nv // vb):
        gr = np.stack([g.reshape(-1, vb)[b] if g.ndim == 1 else g[b] for g in got], 1)
        rr = np.stack([r[b] for r in ref], 1)
        vals_ok &= np.array_equal(
            gr[np.lexsort(gr.T[::-1])], rr[np.lexsort(rr.T[::-1])]
        )
    emit("hw_exactness", keys_ok=bool(keys_ok), vals_multiset_ok=bool(vals_ok))
    if not keys_ok:
        log("KEYS MISMATCH — aborting timings")
        return

    for block in blocks:
        f = jax.jit(
            lambda a, b, c, _blk=block: pallas_sort.sort_blocks(
                (a, b, c), num_keys=2, block=_blk
            )
        )
        t0 = time.perf_counter()
        fence(f(*cols))
        log(f"block={block}: first call (compile) {time.perf_counter()-t0:.1f}s")
        per, naive = slope(f, cols, iters=4)
        st = n_stages(block)
        emit(
            f"block_sort_{block}",
            marginal_ms=round(per * 1e3, 2),
            ns_per_elem=round(per * 1e9 / N, 3),
            ns_per_elem_stage=round(per * 1e9 / N / st, 4),
            stages=st,
            naive_ms=round(naive * 1e3, 2),
        )

    # reference point: lax.sort 3-op at the same N
    s3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=False))
    per, naive = slope(s3, cols, iters=4)
    emit(
        "lax_sort_2key_1val",
        marginal_ms=round(per * 1e3, 2),
        ns_per_elem=round(per * 1e9 / N, 3),
        naive_ms=round(naive * 1e3, 2),
    )


if __name__ == "__main__":
    main()
