"""k > 64 extraction cost on the real TPU: jnp extract vs the W<=8 Pallas
kernel (VERDICT #10).  Also the Mosaic compile check for W in {5, 7}."""

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

    from fastkmer_tpu.ops import count_sort, extract as jex, pallas_extract as pex

    R, L = 1024, 4096
    rng = np.random.default_rng(0)
    codes = jax.device_put(rng.integers(0, 4, size=(R, L), dtype=np.uint8))

    @jax.jit
    def fence_i32(x):
        return x[:1].astype(jnp.int32)

    def f(x):
        return np.asarray(fence_i32(x))

    f(codes[0].astype(jnp.uint32))
    for k, m in ((28, 10), (75, 12), (97, 13), (155, 10), (201, 14)):
        B = 512

        @jax.jit
        def jnp_step(c, k=k, m=m):
            ex = jex.extract(c, k, m, B)
            ones = jnp.uint32(0xFFFFFFFF)
            W = ex.words.shape[1]
            cols = [jnp.where(ex.valid, ex.words[:, w], ones) for w in range(W)]
            return count_sort.count_presentineled(cols).counts

        @jax.jit
        def pallas_step(c, k=k, m=m):
            cols = pex.extract_pallas_sentinel(c, k, m, B)
            return count_sort.count_presentineled(list(cols)).counts

        for name, fn in (("jnp", jnp_step), ("pallas", pallas_step)):
            try:
                out = fn(codes)
                f(out)
                t = time.perf_counter()
                f(fn(codes))
                dt = time.perf_counter() - t
                gbps = R * L / dt / 1e9
                log(f"k={k} {name}: {dt*1e3:.1f} ms = {gbps:.3f} Gbp/s")
            except Exception as e:
                log(f"k={k} {name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
