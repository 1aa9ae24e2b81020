"""Smer-transport extractor A/B on TPU: jnp vs fused Pallas stage 1.

Round-4 VERDICT weak #3: `build_distributed_count_smer` was the one mesh
path still extracting with the ~25-shifted-slice jnp pass.  It now feeds
`superkmer.group` from the same resolved extractor as every other path
(exchange._extract_fn).  This probe measures the per-batch smer step on a
1-chip TPU mesh with the Pallas kernel ON vs OFF (same shapes, same cap),
fencing through a small jitted reduction (block_until_ready is broken
through the tunnel; CLAUDE.md).

Run:  python benchmarks/smer_pallas_probe.py [k] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 28
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
M, B = 10, 512
R, L = 512, 4096
SMAX = 64


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fastkmer_tpu.parallel import exchange, partitioner

    mesh = jax.make_mesh((1,), (exchange.AXIS,), devices=jax.devices()[:1])
    owner = partitioner.hash_owner_map(B, 1)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=(1 << 22) + L, dtype=np.int64).astype(np.uint8)
    starts = rng.integers(0, 1 << 22, size=R)
    codes = genome[starts[:, None] + np.arange(L)[None, :]]
    positions = R * (L - K + 1)
    # records <= positions / mean-run; /3 is ample for a random genome
    # (mean super-k-mer run ~4-5 at k=28 m=10) and identical for both arms.
    # Expansion cost: cap * (smax - k + 1) owner-side sort rows.
    cap = positions // 3

    fence = jax.jit(lambda x: jnp.sum(x.astype(jnp.int64)))

    results = {}
    for use_pallas in (False, True):
        step = exchange.build_distributed_count_smer(
            mesh, K, M, B, cap, SMAX, owner, use_pallas=use_pallas
        )
        sharded = exchange.shard_batch(mesh, codes)
        sc = step(sharded)
        assert int(np.asarray(sc.dropped)) == 0, "cap undersized for the probe"
        np.asarray(fence(sc.counts))  # warm compile + land
        t0 = time.perf_counter()
        for _ in range(ITERS):
            sc = step(sharded)
        np.asarray(fence(sc.counts))
        dt = (time.perf_counter() - t0) / ITERS
        gbps = R * L / dt / 1e9
        results[use_pallas] = (dt, gbps)
        log(f"pallas={use_pallas}: {dt*1e3:.1f} ms/batch, {gbps:.4f} Gbp/s")
    if False in results and True in results:
        log(f"pallas speedup: {results[False][0]/results[True][0]:.3f}x")


if __name__ == "__main__":
    main()
