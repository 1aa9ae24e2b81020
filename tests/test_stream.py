"""Streaming distributed counter: multi-batch feed over the 8-device mesh
must equal the oracle; overflow must be detected."""

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


def test_streaming_counter_matches_oracle(mesh8):
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(17)
    all_reads = []
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=1 << 14,
        owner_map=partitioner.hash_owner_map(B, 8),
    )
    for batch in range(3):
        reads = random_reads(rng, 32, 100)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 100), n_reads=len(reads))
    words, counts, bins = ctr.finalize()

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)
    assert ctr.n_reads == 96

    # bins match the binned oracle
    norm = bits.fill_norm(m)
    for km, b in zip(kmers, bins.tolist()):
        sig = oracles.signature(km.decode(), m, norm)
        assert b == bits.hash_to_bucket(sig, B)


def test_streaming_counter_spills_to_host(mesh8):
    """acc_cap smaller than the run's distinct count: the counter must
    spill per-chip tables to the host at merge boundaries and still produce
    the exact global table."""
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(19)
    all_reads = []
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=2048, fanin=1,
        owner_map=partitioner.hash_owner_map(B, 8),
    )
    for _ in range(6):
        reads = random_reads(rng, 32, 100)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 100), n_reads=len(reads))
    words, counts, _bins = ctr.finalize()
    assert ctr.host_spills, "expected at least one host spill"

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)


def test_streaming_counter_overflow_detected(mesh8):
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(18)
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=32,  # absurdly small accumulator
        owner_map=partitioner.hash_owner_map(B, 8),
    )
    ctr.feed(to_batch(random_reads(rng, 32, 100), 100))
    with pytest.raises(RuntimeError, match="accumulator overflow"):
        ctr.finalize()


def test_streaming_counter_retries_exchange_overflow(mesh8):
    """An undersized exchange cap must trigger resize-and-retry (replaying
    the retained window at doubled capacity), not data loss or an error."""
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(23)
    all_reads = []
    # prededup=False pins the RAW transport: this test is about the raw
    # retry path, and short random reads would otherwise engage dedup
    # under the adaptive threshold (dead padded slots count as
    # compressible rows)
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=8, acc_cap=1 << 14, fanin=2,
        owner_map=partitioner.hash_owner_map(B, 8), prededup=False,
    )
    for _ in range(4):
        reads = random_reads(rng, 32, 100)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 100), n_reads=len(reads))
    words, counts, _ = ctr.finalize()
    assert ctr.n_retries > 0 and ctr.cap > 8

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)


def test_streaming_counter_sync_free_feed(mesh8):
    """``unique_ub`` asserts the distinct bound: the feed loop must run
    with ZERO blocking host pulls — no occupancy stats, no dropped-counter
    reads — and still produce the exact table (counters verified once at
    finalize).  Any host sync inside feed() fails the test."""
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(29)
    all_reads = []
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=1 << 14, fanin=2,
        owner_map=partitioner.hash_owner_map(B, 8), unique_ub=16000,
    )
    assert ctr.assume_fits and ctr.acc_cap >= 16000

    def _boom(*a, **kw):  # any blocking pull during the feed is a failure
        raise AssertionError("host sync during sync-free feed")

    ctr._stats = _boom
    ctr._retry_window_if_dropped = _boom
    for _ in range(5):
        reads = random_reads(rng, 32, 100)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 100), n_reads=len(reads))
    assert not ctr._window, "sync-free mode must not retain replay windows"
    del ctr._stats  # finalize is allowed to sync
    del ctr._retry_window_if_dropped

    words, counts, _ = ctr.finalize()
    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)


def test_streaming_counter_sync_free_drop_raises_at_finalize(mesh8):
    """With the bound asserted, an undersized exchange cap is NOT retried
    (that would need a blocking pull per merge); the psum'd drop counter
    must surface as an error at finalize — asserted, never trusted."""
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(31)
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=8, acc_cap=1 << 14,
        owner_map=partitioner.hash_owner_map(B, 8), unique_ub=16000,
    )
    ctr.feed(to_batch(random_reads(rng, 32, 100), 100))
    with pytest.raises(RuntimeError, match="exchange overflow"):
        ctr.finalize()


def test_streaming_counter_retry_disabled_raises(mesh8):
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(24)
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=8, acc_cap=1 << 14,
        owner_map=partitioner.hash_owner_map(B, 8), retry_on_overflow=False,
    )
    ctr.feed(to_batch(random_reads(rng, 32, 100), 100))
    with pytest.raises(RuntimeError, match="exchange overflow"):
        ctr.finalize()


def test_streaming_spill_inflight_bound(mesh8, monkeypatch):
    """Async spills must not pin unbounded device buffers: with the
    opportunistic (non-blocking) landing path disabled — simulating a link
    slower than the spill cadence — the number of un-materialized spill
    slices must stay within MAX_INFLIGHT_SPILLS * n after every feed, and
    finalize must still produce the exact table."""
    from fastkmer_tpu.parallel import partitioner, stream

    orig = stream.DistributedCounter.materialize_spills

    def lazy_only(self, block=True):
        if block:  # block=False (the opportunistic path) becomes a no-op
            orig(self, block=True)

    monkeypatch.setattr(stream.DistributedCounter, "materialize_spills",
                        lazy_only)

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(29)
    all_reads = []
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=2048, fanin=1,
        owner_map=partitioner.hash_owner_map(B, 8),
    )
    limit = ctr.MAX_INFLIGHT_SPILLS * ctr.n
    max_pending = 0
    for _ in range(10):
        reads = random_reads(rng, 32, 100)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 100), n_reads=len(reads))
        pending = sum(1 for s in ctr.host_spills if not isinstance(s, tuple))
        max_pending = max(max_pending, pending)
        assert pending <= limit
    assert len(ctr.host_spills) > limit, "workload too small to exercise bound"
    assert max_pending > 0, "opportunistic landing was not actually disabled"
    words, counts, _bins = ctr.finalize()

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)


def test_streaming_pow2_merge_trigger(mesh8):
    """The mesh counter must harvest pow2 merge geometry (VERDICT r3 weak
    #4): with the window + accumulator sitting exactly at a power of two,
    the near-pow2 trigger fires BEFORE the next part crosses it, and the
    recorded merge shape is the pow2 itself."""
    from fastkmer_tpu.parallel import partitioner, stream

    k, m, B = 28, 10, 64
    rng = np.random.default_rng(83)
    all_reads = []
    ctr = stream.DistributedCounter(
        mesh8, k, m, B, cap=2048, acc_cap=1 << 16, fanin=6,
        owner_map=partitioner.hash_owner_map(B, 8), prededup=False,
    )
    # per-chip rows per part = n*cap = 16384; acc 65536 + 4 parts = 2^17
    for _ in range(5):
        reads = random_reads(rng, 32, 100)
        all_reads.extend(reads)
        ctr.feed(to_batch(reads, 100), n_reads=len(reads))
    assert ctr.merge_shapes, "pow2 trigger never fired"
    n_rows, cap_in = ctr.merge_shapes[0]
    assert n_rows == (1 << 17) and cap_in == (1 << 17)
    words, counts, _ = ctr.finalize()
    assert all(c <= 1.10 * r or c == -(-r // (1 << 16)) * (1 << 16)
               for r, c in ctr.merge_shapes)

    expect = oracles.count_reads(all_reads, k)
    kmers = bits.decode_words_batch(words, k)
    got = {km.decode(): int(c) for km, c in zip(kmers, counts.tolist())}
    assert got == dict(expect)
