"""Distance measures for multisequence comparison.

Python re-design of the reference's Java plug-in contract
(``DistanceMeasure``, src/main/java/multiseq/DistanceMeasure.java:10-91,
implementations SquaredEuclidean.java / KLDLog2.java / KLDLogN.java).  The
contract is preserved (init / partial / operator / finalize / symmetry /
name / compatibility + the static count normalization helper) but the
partial-distance computation is *vectorized*: ``partial`` takes numpy
arrays of count pairs, because the TPU pipeline accumulates distances over
whole unique-(k-mer, sequence) tables, not one scalar at a time.

Per the reference semantics, partials are computed on RAW per-k-mer counts
(Parameters(c1, c2) ints, SparkMultiSequenceKmerCounter.scala:479-481), a
k-mer absent from both sequences contributes nothing, and for KLD a zero on
either side contributes 0 (DKL guard, KLDLog2.java).
"""

from __future__ import annotations

import numpy as np


class DistanceMeasure:
    """Contract mirror of multiseq/DistanceMeasure.java:10-91."""

    name = "multisequence.DistanceMeasure"
    symmetric = True
    internal_product = False

    def init_distance(self) -> float:
        return 0.0

    def partial(self, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
        """Vectorized computePartialDistance over count-pair arrays.
        Must satisfy partial(0, 0) == 0."""
        raise NotImplementedError

    def operator(self, acc, cur):
        """distanceOperator — sum for every measure shipped here."""
        return acc + cur

    def finalize(self, dist: float, num_el: int) -> float:
        return dist

    def is_compatible(self, pattern: str) -> bool:
        return True

    @staticmethod
    def normalized_values(c1, length1, c2, length2, k):
        """getNormalizedValues (DistanceMeasure.java:71-91): count/(len-k+1)."""
        den1, den2 = length1 - k + 1, length2 - k + 1
        v1 = c1 / den1 if (np.all(c1 != 0) and length1 and den1 > 0) else 0.0
        v2 = c2 / den2 if (np.all(c2 != 0) and length2 and den2 > 0) else 0.0
        return [v1, v2]


class SquaredEuclidean(DistanceMeasure):
    """(c1-c2)^2 summed over k-mers (SquaredEuclidean.java:19-27)."""

    name = "multisequence.SquaredEuclidean"
    symmetric = True

    def partial(self, c1, c2):
        d = np.asarray(c1, np.float64) - np.asarray(c2, np.float64)
        return d * d


class KLDLog2(DistanceMeasure):
    """c1 * log2(c1/c2), zero when either count is zero (KLDLog2.java DKL)."""

    name = "multisequence.KLDLog2"
    symmetric = False

    _log = staticmethod(np.log2)

    def partial(self, c1, c2):
        c1 = np.asarray(c1, np.float64)
        c2 = np.asarray(c2, np.float64)
        both = (c1 != 0) & (c2 != 0)
        out = np.zeros_like(c1)
        np.divide(c1, c2, out=out, where=both)
        res = np.zeros_like(c1)
        res[both] = c1[both] * self._log(out[both])
        return res


class KLDLogN(KLDLog2):
    """Natural-log variant (KLDLogN.java)."""

    name = "multisequence.KLDLogN"
    _log = staticmethod(np.log)


MEASURES = {m.name: m for m in (SquaredEuclidean(), KLDLog2(), KLDLogN())}
MEASURES.update({
    "squared_euclidean": MEASURES["multisequence.SquaredEuclidean"],
    "kld_log2": MEASURES["multisequence.KLDLog2"],
    "kld_logn": MEASURES["multisequence.KLDLogN"],
})


def get_measure(name_or_obj) -> DistanceMeasure:
    if isinstance(name_or_obj, DistanceMeasure):
        return name_or_obj
    return MEASURES[name_or_obj]
