"""Structured per-stage timing.

Replaces the reference's ad-hoc wall-clock prints (getDateDiff,
package.scala:764-767; per-stage/per-bin prints at
SparkBinKmerCounter.scala:165, 462, 536-544, 648-659) with a span recorder
that can be dumped as a dict/JSON.  ``jax.profiler`` traces can be layered
on top via ``trace_dir``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self, verbose: bool = False) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.verbose = verbose

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if self.verbose:
                print(f"[timing] {name}: {dt:.3f}s (total {self.totals[name]:.3f}s)")

    def as_dict(self) -> dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """Wrap a region in a jax.profiler trace when trace_dir is given."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
