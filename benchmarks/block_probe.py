"""Probe: per-block sort + scan-DUS placement as a compaction replacement.

The merge's compaction input is globally sorted with ~88% sentinel rows;
block-local sorts push each block's live rows to its front (global order
preserved because blocks are in sorted order), then a lax.scan of
dynamic_update_slice stitches prefixes.  Cost should be ~log2(T)^2 /
log2(N)^2 of the global sort.
"""

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

    N = 1 << 27
    C = 17_891_328
    rng = np.random.default_rng(0)
    # ~12% live rows, like a post-count merge array
    live = rng.random(N) < 0.125
    c0 = np.where(live, rng.integers(0, 1 << 31, size=N, dtype=np.uint32), 0xFFFFFFFF)
    cols = [jax.device_put(np.sort(c0)), ]  # globally sorted with interspersed? no:
    # emulate interspersed sentinels: sort then scatter sentinels — simpler:
    # order does not affect sort cost; use unsorted with sentinel fraction.
    cols = [jax.device_put(c0)]
    cols.append(jax.device_put(np.where(live, rng.integers(0, 1 << 31, size=N, dtype=np.uint32), 0xFFFFFFFF)))
    cnts = jax.device_put(np.where(live, 1, 0).astype(np.int32))

    @jax.jit
    def fence_i32(x):
        return x[:1].astype(jnp.int32)

    def f(x):
        return np.asarray(fence_i32(x))

    f(cols[0]); f(cols[1]); f(cnts.astype(jnp.uint32))

    for T in (2048, 8192, 32768):
        nb = N // T

        @jax.jit
        def block_sort(a, b, w, T=T, nb=nb):
            outs = jax.lax.sort(
                (a.reshape(nb, T), b.reshape(nb, T), w.reshape(nb, T)),
                dimension=1, num_keys=2, is_stable=False,
            )
            return outs[0].reshape(-1)

        out = block_sort(cols[0], cols[1], cnts)
        f(out)
        t = time.perf_counter()
        out = block_sort(cols[0], cols[1], cnts)
        f(out)
        log(f"block sort T={T}: {time.perf_counter()-t:.3f}s")

    T = 8192
    nb = N // T

    @jax.jit
    def place(a, b, w):
        a2, b2, w2 = a.reshape(nb, T), b.reshape(nb, T), w.reshape(nb, T)
        h = jnp.sum((a2 != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32), axis=1)
        off = jnp.minimum(jnp.cumsum(h) - h, C)
        init = (
            jnp.full(C + T, 0xFFFFFFFF, jnp.uint32),
            jnp.full(C + T, 0xFFFFFFFF, jnp.uint32),
            jnp.zeros(C + T, jnp.int32),
        )

        def body(carry, x):
            ba, bb, bw, o = x
            return (
                jax.lax.dynamic_update_slice(carry[0], ba, (o,)),
                jax.lax.dynamic_update_slice(carry[1], bb, (o,)),
                jax.lax.dynamic_update_slice(carry[2], bw, (o,)),
            ), None

        out, _ = jax.lax.scan(body, init, (a2, b2, w2, off))
        return out[0][:C], out[1][:C], out[2][:C]

    o = place(cols[0], cols[1], cnts)
    f(o[0])
    t = time.perf_counter()
    o = place(cols[0], cols[1], cnts)
    f(o[0])
    log(f"scan-DUS place T={T}: {time.perf_counter()-t:.3f}s")


if __name__ == "__main__":
    main()
