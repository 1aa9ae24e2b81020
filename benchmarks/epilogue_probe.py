"""Pin down which count-sort epilogue op is pathological at 2^27 on TPU."""

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
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, 1 << 32, size=N, dtype=np.uint32))
    w = jax.device_put(np.ones(N, np.int32))

    @jax.jit
    def fence_i32(x):
        return x[:1].astype(jnp.int32)

    def run(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(fence_i32(out))
        t = time.perf_counter()
        out = f(*args)
        np.asarray(fence_i32(out))
        log(f"{name}: {time.perf_counter()-t:.3f}s")

    run("elementwise xor", lambda x: x ^ jnp.uint32(123), a)
    run("flip", lambda x: jnp.flip(x), a)
    run("cumsum i32", lambda x: jnp.cumsum(x), w)
    run("cummax i32", lambda x: jax.lax.cummax(x), w)
    run("cummin rev", lambda x: jax.lax.cummin(x, reverse=True), w)
    run("shifted cmp", lambda x: jnp.concatenate([jnp.ones(1, bool), x[1:] != x[:-1]]).astype(jnp.uint32), a)
    run("at0set", lambda x: jnp.zeros(N, bool).at[0].set(True).astype(jnp.uint32), a)
    run(
        "flip(cummin(flip))",
        lambda x: jnp.flip(jax.lax.cummin(jnp.flip(x))),
        w,
    )
    run(
        "full old epilogue",
        lambda x, ww: _old_epilogue(x, ww),
        a, w,
    )


def _old_epilogue(col, sw):
    import jax
    import jax.numpy as jnp

    N = col.shape[0]
    diff = jnp.zeros(N, dtype=bool).at[0].set(True)
    diff = diff | jnp.concatenate([jnp.ones(1, dtype=bool), col[1:] != col[:-1]])
    is_start = diff & (col != jnp.uint32(0xFFFFFFFF))
    idx = jnp.arange(N, dtype=jnp.int32)
    bpos = jnp.where(diff, idx, jnp.int32(N))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(jnp.concatenate([bpos[1:], jnp.full(1, N, jnp.int32)]))))
    cw = jnp.flip(jnp.cumsum(jnp.flip(sw)))
    cw_ext = jnp.concatenate([cw, jnp.zeros(1, jnp.int32)])
    counts = jnp.where(is_start, cw - cw_ext[nxt], 0)
    return counts


if __name__ == "__main__":
    main()
