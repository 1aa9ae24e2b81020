"""Adversarial fuzz of the mesh dedup transport state machine: inputs
whose duplication ratio oscillates every few batches, under capacities
tiny enough to force exchange-overflow retries (window replays that mix
raw and dedup parts) and accumulator spills — the mesh analogue of the
single-chip adaptive fuzz (tests/test_adaptive_fuzz.py) that found the
round-3 retry/spill ordering bug.

Every run must end bit-exact vs the dict oracle regardless of the mode
flips, replays, cap/cap_d growth, and spill interleavings the schedule
produces."""

import numpy as np
import pytest

from fastkmer_tpu.core import bits

from . import oracles
from .test_extract import random_reads, to_batch


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from fastkmer_tpu.parallel import exchange

    return jax.make_mesh((8,), (exchange.AXIS,), devices=jax.devices("cpu")[:8])


def _dup_reads(rng, n, L, genome_len):
    genome = "".join(rng.choice(list("ACGT"), size=genome_len))
    return [
        genome[s:s + L]
        for s in rng.integers(0, genome_len - L + 1, size=n).tolist()
    ]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mesh_dedup_oscillation_fuzz(mesh8, seed):
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(100 + seed)
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=64, acc_cap=2048, fanin=3,
        owner_map=partitioner.hash_owner_map(B, 8), prededup=None,
    )
    ctr.PROBE_EVERY = 2  # flip-happy controller
    all_reads = []
    phase_dup = False
    for i in range(30):
        if i % 5 == 0:
            phase_dup = not phase_dup
        if phase_dup:
            reads = _dup_reads(rng, 32, 80, genome_len=120)
        else:
            # dense full-length distinct reads: stays raw under the
            # adaptive threshold AND builds unique pressure for spills
            reads = ["".join(rng.choice(list("ACGT"), size=80))
                     for _ in range(32)]
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 80), n_reads=len(reads))
        # land the newest probe scalar so mode flips actually exercise
        # mixed-mode windows (production polls; the fuzz forces churn)
        if ctr._probe_pending and rng.random() < 0.7:
            np.asarray(ctr._probe_pending[0][2])
    words, counts, _ = ctr.finalize()
    assert ctr.n_retries > 0, "caps too big to exercise replay"
    assert ctr.host_spills, "acc_cap too big to exercise spills"
    assert ctr.n_dedup_batches > 0, "controller never chose dedup"
    assert ctr.n_dedup_batches < 30, "controller never chose raw"

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)


def test_mesh_dedup_forced_with_tiny_caps_and_spills(mesh8):
    """Forced dedup + tiny exchange capacity + tiny accumulator: retries
    must replay dedup windows (cap_d doubling) across spill boundaries
    losslessly."""
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(7)
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=2048, fanin=2,
        owner_map=partitioner.hash_owner_map(B, 8), prededup=True,
    )
    ctr.cap_d = 16
    ctr._exchange_dedup = None
    all_reads = []
    for _ in range(8):
        reads = random_reads(rng, 32, 80)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 80), n_reads=len(reads))
    words, counts, _ = ctr.finalize()
    assert ctr.n_retries > 0 and ctr.cap_d > 16
    assert ctr.host_spills

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)
