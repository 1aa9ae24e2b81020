"""Roofline verification (VERDICT r2 #1): re-measure the memory-bandwidth
floor and the sort primitives at merge scale with tunnel-proof methodology.

Round-2's "~45 GB/s effective" number came from 5 pipelined iterations at
2^24 with ONE fence at the end — through a link whose D2H fence costs up to
~0.6 s, a constant that inflates small measurements.  This probe removes
every constant overhead with a SLOPE measurement: run I and 2I iterations
(each fenced), per-iter cost = (T_2I - T_I) / I.  Fence RTT, dispatch
overhead, and compile residue cancel exactly; only marginal device work
remains.

Measured here:
  * per-call overhead floor (tiny elementwise op) — sanity for the slope
  * elementwise 2-col uint32 pass at 2^24 / 2^26 / 2^28 -> GB/s roofline
  * lax.sort 1/2/3-operand at 2^24 / 2^26 (ns/elem at merge scale)
  * count_presentineled + compact_marked at the REAL merge shape
    (fanin*16.7M + acc_cap rows x (2 keys + 1 weight), k=28)

Then computes the sort-traffic floor of bench.py's streaming workload from
these numbers and prints achieved-vs-floor efficiency hooks (the achieved
number comes from bench.py).

Usage: python benchmarks/roofline.py [quick|merge]
  quick  = small sizes only;  merge = ONLY the merge-shape section
Prints one JSON line per measurement to stdout; diagnostics to stderr.

NOTE a 2-D [N, 2] uint32 jit OUTPUT at 151M rows is laid out T(8,128) —
the minor dim pads 2 -> 128 (64x memory, 77 GB > HBM).  The production
merge never materializes stacked words (lanes stay 1-D columns end to
end), so the merge here is measured in the production form: one fused
count_presentineled + compact_marked returning 1-D columns.
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
    return np.asarray(x if x.ndim == 0 else x.ravel()[:4])


def run_iters(fn, args, iters):
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return time.perf_counter() - t0


def slope(fn, args, iters=10, warmup=2):
    """Marginal per-iteration cost: (T(2I) - T(I)) / I.  Constant overheads
    (fence RTT, per-batch dispatch setup) cancel; compiles land in warmup."""
    for _ in range(warmup):
        fence(fn(*args))
    t_lo = run_iters(fn, args, iters)
    t_hi = run_iters(fn, args, 2 * iters)
    per = (t_hi - t_lo) / iters
    return per, t_lo / iters  # (marginal, naive-with-overhead)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    quick = stage == "quick"
    merge_only = stage == "merge"
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.utils import jaxcache  # noqa: F401
    from fastkmer_tpu.ops import count_sort

    rng = np.random.default_rng(0)
    if merge_only:
        _measure_merge(jax, jnp, count_sort, rng)
        return

    # --- per-call overhead floor ---
    tiny = jnp.asarray(rng.integers(0, 2**32, size=1 << 10, dtype=np.uint32))
    f_tiny = jax.jit(lambda x: x + jnp.uint32(1))
    per, naive = slope(f_tiny, (tiny,), iters=20)
    emit("per_call_overhead", marginal_ms=round(per * 1e3, 3),
         naive_ms=round(naive * 1e3, 3))

    # --- elementwise bandwidth at scale ---
    # 2 uint32 cols read + 1 written = 12 B/elem of HBM traffic
    ew = jax.jit(lambda x, y: x + y + jnp.uint32(1))
    for lg in ((24, 26) if quick else (24, 26, 28)):
        N = 1 << lg
        a = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        iters = max(4, min(40, (1 << 28) // N * 4))
        per, naive = slope(ew, (a, b), iters=iters)
        gbs = 12 * N / per / 1e9
        emit(f"elementwise_2col_2^{lg}", marginal_ms=round(per * 1e3, 3),
             naive_ms=round(naive * 1e3, 3), GBps=round(gbs, 1), iters=iters)
        del a, b

    # --- sorts at scale (marginal) ---
    for lg in ((24,) if quick else (24, 26)):
        N = 1 << lg
        a = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
        iters = max(3, min(12, (1 << 26) // N * 6))
        s1 = jax.jit(lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False))
        s2 = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2, is_stable=False))
        s3 = jax.jit(
            lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2, is_stable=False)
        )
        for name, fn, args in (
            ("sort_1op", s1, (a,)),
            ("sort_2op", s2, (a, b)),
            ("sort_2key_1val", s3, (a, b, c)),
        ):
            per, naive = slope(fn, args, iters=iters)
            emit(f"{name}_2^{lg}", marginal_ms=round(per * 1e3, 1),
                 naive_ms=round(naive * 1e3, 1),
                 ns_per_elem=round(per * 1e9 / N, 3), iters=iters)
        del a, b, c

    if not quick:
        _measure_merge(jax, jnp, count_sort, rng)


def _measure_merge(jax, jnp, count_sort, rng):
    """The real merge shape: k=28 streaming fan-in merge.

    bench.py: fanin=8 batches x 16.71M positions + acc_cap 2^24 rows,
    rounded to 64Ki granules = 150,994,944 rows x (2 keys + 1 weight).
    Measured as ONE fused program exactly as pipeline._acc_merge runs it
    (count_presentineled + compact_marked, 1-D lane columns in and out) —
    returning stacked [N, 2] words from jit pads the minor dim to 128 on
    TPU (T(8,128) layout = 64x memory)."""
    K_POS = 4096 * (4096 - 28 + 1)
    n_rows = 8 * K_POS + (1 << 24)
    n_rows = -(-n_rows // (1 << 16)) * (1 << 16)
    a = jnp.asarray(rng.integers(0, 2**32, size=n_rows, dtype=np.uint32))
    bcol = jnp.asarray(rng.integers(0, 2**32, size=n_rows, dtype=np.uint32))
    w = jnp.asarray(rng.integers(1, 3, size=n_rows, dtype=np.int32))

    def merge_fn(x, y, z):
        sc = count_sort.count_presentineled([x, y], weights=z)
        ccols, wts, n_u, over = count_sort.compact_marked(
            (sc.words[:, 0], sc.words[:, 1]), sc.counts, sc.is_uniq, 1 << 24
        )
        return ccols[0], ccols[1], wts, n_u

    mf = jax.jit(merge_fn)
    per, naive = slope(mf, (a, bcol, w), iters=3)
    emit("merge_full_151M", marginal_s=round(per, 3),
         naive_s=round(naive, 3), rows=n_rows)

    # sort-only at the same shape (1-D outputs), isolating the epilogue
    sf = jax.jit(
        lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2, is_stable=False)
    )
    per_s, naive_s = slope(sf, (a, bcol, w), iters=3)
    emit("merge_sort_only_151M", marginal_s=round(per_s, 3),
         naive_s=round(naive_s, 3), rows=n_rows)

    # floor model for bench.py stream mode: 2 merges + 16 extracts
    emit("floor_note",
         model="16 extracts (~10ms) + 2 x merge_full",
         floor_s=round(16 * 0.010 + 2 * per, 3),
         bases=16 * 4096 * 4096)


if __name__ == "__main__":
    main()
