"""Probe raw Pallas HBM-pass cost on the attached TPU: a grid copy kernel
over 2^24 x 2 uint32 columns (one read + one write of 134 MB), and a
transpose-per-tile variant — the unit costs a multi-pass Pallas sort pays.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from fastkmer_tpu.utils import jaxcache  # noqa: F401

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    N = 1 << lg
    ROWS, LANES = N // 128, 128
    CH = 1 << 14  # elements per grid step
    CROWS = CH // 128

    def copy_kernel(a_ref, b_ref, oa_ref, ob_ref):
        oa_ref[...] = a_ref[...] + jnp.uint32(1)
        ob_ref[...] = b_ref[...] + jnp.uint32(1)

    def tr_kernel(a_ref, b_ref, oa_ref, ob_ref):
        # [128,128] tile: transpose, touch, transpose back (the lane<->row
        # swap a bitonic low-pass performs)
        a = a_ref[...].T
        b = b_ref[...].T
        oa_ref[...] = (a + jnp.uint32(1)).T
        ob_ref[...] = (b + jnp.uint32(1)).T

    spec = pl.BlockSpec((CROWS, LANES), lambda i: (i, 0))
    tspec = pl.BlockSpec((128, 128), lambda i: (i, 0))

    copy = pl.pallas_call(
        copy_kernel,
        grid=(ROWS // CROWS,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32)] * 2,
    )
    trans = pl.pallas_call(
        tr_kernel,
        grid=(ROWS // 128,),
        in_specs=[tspec, tspec],
        out_specs=[tspec, tspec],
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32)] * 2,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, size=(ROWS, LANES), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(ROWS, LANES), dtype=np.uint32))

    for name, fn in [("copy_pass", jax.jit(copy)), ("transpose_pass", jax.jit(trans))]:
        out = fn(a, b)
        np.asarray(out[0][:1])
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(a, b)
        np.asarray(out[0][:1]), np.asarray(out[1][:1])
        dt = (time.perf_counter() - t0) / 10
        gbs = 2 * 2 * N * 4 / dt / 1e9
        print(json.dumps({"probe": name, "ms": round(dt * 1e3, 3),
                          "effective_GBps": round(gbs, 1)}))


if __name__ == "__main__":
    main()
