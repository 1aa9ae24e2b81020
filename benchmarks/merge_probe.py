"""Calibrate the accumulator merge's components at bench scale on the real
TPU: bare lax.sort at 2/3 lanes, count_presentineled, full _acc_merge."""

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
    from fastkmer_tpu.ops import count_sort

    N = 150_994_944  # the bench merge's cap_in (8 x 16.67M + 17.9M acc)

    rng = np.random.default_rng(0)
    host_cols = [rng.integers(0, 1 << 32, size=N, dtype=np.uint32) for _ in range(3)]
    cols = [jax.device_put(c) for c in host_cols]
    wts = jax.device_put(np.ones(N, np.int32))

    @jax.jit
    def fence_u32(x):
        return x[:1].astype(jnp.int32)

    def fence(x):
        return int(np.asarray(fence_u32(x))[0])

    fence(cols[0]); fence(cols[1]); fence(cols[2]); fence(wts.astype(jnp.uint32))
    log("staged")

    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
    sort3 = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=False)
    )

    for name, fn, args in (
        ("sort 2-lane(2key)", sort2, (cols[0], cols[1])),
        ("sort 3-lane(2key+val)", sort3, (cols[0], cols[1], cols[2])),
    ):
        out = fn(*args)
        fence(out[0])  # compile+run
        t = time.perf_counter()
        out = fn(*args)
        fence(out[0])
        dt = time.perf_counter() - t
        log(f"{name}: {dt:.2f}s = {dt/N*1e9:.2f} ns/elem")

    cp = jax.jit(lambda a, b, w: count_sort.count_presentineled([a, b], weights=w))
    sc = cp(cols[0], cols[1], wts)
    fence(sc.counts.astype(jnp.uint32))
    t = time.perf_counter()
    sc = cp(cols[0], cols[1], wts)
    fence(sc.counts.astype(jnp.uint32))
    log(f"count_presentineled(2key+wt): {time.perf_counter()-t:.2f}s")

    # full merge at bench shapes (8 parts of 16,666,624 rows + acc 17,891,328)
    PART, CAP = 16_666_624, 17_891_328
    parts = tuple(
        (
            (
                jax.device_put(host_cols[0][i * PART : (i + 1) * PART // 1 * 1][:PART]),
                jax.device_put(host_cols[1][i * PART : (i + 1) * PART][:PART]),
            ),
            None,
        )
        for i in range(8)
    )
    acc = (
        (
            jax.device_put(np.full(CAP, 0xFFFFFFFF, np.uint32)),
            jax.device_put(np.full(CAP, 0xFFFFFFFF, np.uint32)),
        ),
        jax.device_put(np.zeros(CAP, np.int32)),
        jax.device_put(np.int32(0)),
        jax.device_put(np.int32(0)),
    )
    fence(acc[0][0])
    st = pipeline._MERGE_JIT(parts, acc)
    fence(st[0][0])
    log("merge compiled")
    # rebuild inputs (acc was donated)
    acc = st
    t = time.perf_counter()
    st = pipeline._MERGE_JIT(parts, acc)
    fence(st[0][0])
    log(f"_acc_merge(8 parts + acc): {time.perf_counter()-t:.2f}s")


if __name__ == "__main__":
    main()
