"""Composition-realistic genome fixture.

VERDICT r3 item #7 asks for a REAL genome slice because real composition
(repeat structure, homopolymer runs, N islands, soft-masked lowercase)
exercises the minimizer/skew machinery differently from uniform-random
bases.  No real sequence data exists in this environment (zero network
egress; the filesystem holds none — checked round 4), so this module is
the honest substitute: a DETERMINISTIC generator that explicitly models
the composition features the uniform corpus lacks:

* GC-content domains (isochore-like, 25-65% GC, 5-40 kbp) — skews the
  m-mer distribution, hence minimizer/bin skew;
* dispersed repeat families (transposon-like, 300-1500 bp consensus,
  many copies at 1-6% divergence, some reverse-complemented) — the main
  source of duplicated k-mers and minimizer hot spots in real genomes;
* tandem repeats: microsatellites ((AT)n, (CAG)n, ...) and minisatellites
  (10-60 bp unit) — low-complexity minimizer sinks;
* homopolymer runs (8-30 bp);
* N islands (assembly-gap style, 50-500 bp) — exercises the invalid-split
  machinery mid-sequence rather than sprinkled point Ns;
* soft-masked lowercase over repeat copies — both the reference
  (notANucleotide, package.scala:697: only uppercase ACGT is valid) and
  this build treat lowercase as invalid, so masking must SPLIT windows
  identically in both.

The composition knobs are loosely calibrated to vertebrate/bacterial
stats (≈45% of a vertebrate genome is repeat-derived; microsatellites
≈3%); no claim of biological sequence identity is made.
"""

from __future__ import annotations

import numpy as np

_BASES = np.array(list("ACGT"))


def _gc_domain(rng: np.random.Generator, length: int, gc: float) -> np.ndarray:
    p_g = gc / 2
    p_a = (1 - gc) / 2
    return rng.choice(_BASES, size=length, p=[p_a, p_g, p_g, p_a])


def _mutate(rng: np.random.Generator, seq: np.ndarray, rate: float) -> np.ndarray:
    out = seq.copy()
    hits = np.flatnonzero(rng.random(seq.shape[0]) < rate)
    out[hits] = rng.choice(_BASES, size=hits.shape[0])
    return out


_RC = {"A": "T", "C": "G", "G": "C", "T": "A"}


def realistic_genome(length: int = 200_000, seed: int = 20260820,
                     soft_mask: bool = True, n_islands: bool = True) -> str:
    """Deterministic composition-realistic genome of ~``length`` bases."""
    rng = np.random.default_rng(seed)

    # repeat family consensi (built from skewed-GC backbones themselves)
    families = [
        _gc_domain(rng, int(rng.integers(300, 1500)), float(rng.uniform(0.3, 0.6)))
        for _ in range(4)
    ]
    micro_units = ["AT", "CAG", "GATA", "A", "CGG"]

    parts: list[str] = []
    # guaranteed feature coverage, so a short fixture still contains every
    # class: a gap island, young+masked repeat copies, a homopolymer, a
    # microsatellite array (the random draws below add the bulk)
    if n_islands:
        parts.append("N" * 120)
    parts.append("".join(_mutate(rng, families[0], 0.002)))
    if soft_mask:
        parts.append("".join(_mutate(rng, families[0], 0.002)).lower())
    parts.append("".join(_gc_domain(rng, 150, 0.5)) + "A" * 20)
    parts.append("AT" * 100)
    total = sum(map(len, parts))
    while total < length:
        r = rng.random()
        if r < 0.35:  # unique backbone in a GC domain
            seg = "".join(_gc_domain(
                rng, int(rng.integers(1_000, 5_000)), float(rng.uniform(0.25, 0.65))
            ))
        elif r < 0.70:  # dispersed repeat burst (1-3 copies, RC/masked)
            fam = families[int(rng.integers(len(families)))]
            segs = []
            for _ in range(1 + int(rng.integers(0, 3))):
                # young copies are near-identical (the k-mer duplication
                # real genomes show); older ones diverge
                rate = (
                    0.002 if rng.random() < 0.5
                    else float(rng.uniform(0.01, 0.04))
                )
                s = "".join(_mutate(rng, fam, rate))
                if rng.random() < 0.5:
                    s = "".join(_RC[c] for c in reversed(s))
                if soft_mask and rng.random() < 0.2:
                    s = s.lower()
                segs.append(s)
                segs.append("".join(_gc_domain(rng, 120, 0.5)))  # spacer
            seg = "".join(segs)
        elif r < 0.82:  # microsatellite / minisatellite tandem array
            if rng.random() < 0.6:
                unit = micro_units[int(rng.integers(len(micro_units)))]
            else:
                unit = "".join(_gc_domain(rng, int(rng.integers(10, 60)), 0.5))
            reps = int(rng.integers(10, 200 // max(len(unit) // 4, 1)))
            seg = (unit * reps)[: int(rng.integers(30, 600))]
        elif r < 0.92:  # homopolymer run inside a short unique segment
            base = "ACGT"[int(rng.integers(4))]
            seg = (
                "".join(_gc_domain(rng, 200, 0.5))
                + base * int(rng.integers(8, 31))
                + "".join(_gc_domain(rng, 200, 0.5))
            )
        elif n_islands:  # assembly gap
            seg = "N" * int(rng.integers(50, 500))
        else:
            seg = "".join(_gc_domain(rng, 500, 0.5))
        parts.append(seg)
        total += len(seg)
    return "".join(parts)[:length]


def coverage_reads(genome: str, rng: np.random.Generator, n_reads: int,
                   read_len: int) -> list[str]:
    """Sequencing-shaped sampling: uniform-start substrings of the genome
    (both strands), the workload shape real counters see."""
    G = len(genome)
    reads = []
    for _ in range(n_reads):
        start = int(rng.integers(0, max(G - read_len, 1)))
        r = genome[start:start + read_len]
        if rng.random() < 0.5:
            r = "".join(_RC.get(c.upper(), "N") for c in reversed(r))
        reads.append(r)
    return reads
