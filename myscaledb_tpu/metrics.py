"""Distance metrics and the score convention.

Reference: Search::Metric {L2, IP, Cosine, Hamming, Jaccard}
(src/VectorIndex/Common/VICommon.h:106-168; dispatch at
src/VectorIndex/Storages/MergeTreeVSManager.cpp:1560-1585).

Internal convention: every kernel produces a *score* where LARGER IS
BETTER, so top-k is always max-k:

  IP       score =  <q, x>                 reported distance =  score
  Cosine   score =  <q, x> / (|q||x|)      reported distance = 1 - score
  L2       score = -(|q - x|^2)            reported distance = -score  (squared L2,
                                            matching FAISS knn_L2sqr used by the
                                            reference brute force,
                                            src/VectorIndex/Common/BruteForceSearch.h:77-105)
  Hamming  score = -popcount(q ^ x)        reported distance = -score
  Jaccard  score = 1 - jaccard_dist        reported distance = 1 - score

The ORDER BY direction contract (ascending for L2/Hamming/Jaccard distance,
descending for IP/Cosine similarity — ExpressionAnalyzer.cpp:960-961 and
test 00027_mqvs_check_order_by_for_metric_type.sql) falls out of this table:
`direction()` below returns the required sort direction of the *reported*
distance column.
"""

from __future__ import annotations

import enum

from .errors import IndexParameterError


class Metric(enum.Enum):
    L2 = "L2"
    IP = "IP"
    COSINE = "Cosine"
    HAMMING = "Hamming"
    JACCARD = "Jaccard"

    @classmethod
    def parse(cls, name: str, *, binary: bool = False) -> "Metric":
        key = name.strip().lower()
        aliases = {
            "l2": cls.L2,
            "euclidean": cls.L2,
            "ip": cls.IP,
            "innerproduct": cls.IP,
            "inner_product": cls.IP,
            "dot": cls.IP,
            "cosine": cls.COSINE,
            "cos": cls.COSINE,
            "hamming": cls.HAMMING,
            "jaccard": cls.JACCARD,
        }
        if key not in aliases:
            raise IndexParameterError(f"unknown metric_type: {name!r}")
        m = aliases[key]
        if binary and m not in (cls.HAMMING, cls.JACCARD):
            raise IndexParameterError(
                f"metric {m.value} is not valid for binary vectors"
            )
        if not binary and m in (cls.HAMMING, cls.JACCARD):
            raise IndexParameterError(
                f"metric {m.value} is only valid for binary vectors"
            )
        return m


def is_binary(metric: Metric) -> bool:
    return metric in (Metric.HAMMING, Metric.JACCARD)


def direction(metric: Metric) -> str:
    """Required ORDER BY direction of the reported distance column.

    'asc' for true distances (smaller better), 'desc' for similarities.
    Only IP reports a similarity; Cosine reports 1 - cos (a DISTANCE,
    smaller better — see the score table above and the reference's
    cosine tests, 00014_mqvs_distance_cosine_*.sql order ASC).
    Reference: VSDescription.direction (VSDescription.h:54),
    ExpressionAnalyzer.cpp:960-961.
    """
    if metric == Metric.IP:
        return "desc"
    return "asc"


def score_ascending_better(metric: Metric) -> bool:
    """Direction of the INTERNAL max-better score under the reference's
    RSF normalization contract (computeNormalizedScore normalizes the
    user-visible distance with direction(metric)). Since score→distance is
    affine per metric, that is equivalent to normalizing internal scores
    with: ascending_better = (direction == 'asc') XOR (the affine map is
    decreasing) — which is False for EVERY metric: internal scores are
    max-better by construction (the score table above), so e.g. Cosine is
    (asc) XOR (1-score decreasing) = False, L2 is (asc) XOR (-score
    decreasing) = False, IP is (desc) XOR (identity increasing) = False."""
    return False


def score_to_distance(metric: Metric, score):
    """Convert internal max-is-better score to the user-visible distance."""
    if metric == Metric.IP:
        return score
    if metric == Metric.COSINE:
        return 1.0 - score
    # L2 (squared), Hamming (bit count), Jaccard (distance)
    if metric == Metric.JACCARD:
        return 1.0 - score
    return -score


def distance_to_score(metric: Metric, dist):
    """Inverse of score_to_distance."""
    if metric == Metric.IP:
        return dist
    if metric in (Metric.COSINE, Metric.JACCARD):
        return 1.0 - dist
    return -dist
