"""Hybrid fusion: RRF and RSF over two ranked lists.

Formulas mirror src/VectorIndex/Utils/HybridSearchUtils.cpp:

  RankFusion (:164):          score = Σ_legs 1 / (fusion_k + rank)
  RelativeScoreFusion (:212): min-max normalize each leg's scores
      (direction-aware for distance metrics, computeNormalizedScore
      :276-313), then  w·norm_text + (1-w)·norm_vec.

Inputs are per-leg global top-k lists of (key, score) where key identifies
a row (segment_id, row_id) and scores are the *user-visible* convention of
each leg: vector leg = distance (direction from metric), text leg = BM25
(bigger better).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

Key = Tuple[int, int]  # (segment_id, row_id)


def rank_fusion(
    legs: Sequence[List[Key]],
    k: int,
    *,
    fusion_k: int = 60,
) -> List[Tuple[Key, float]]:
    """RRF: Σ 1/(fusion_k + rank), rank starting at 1 per leg."""
    scores: Dict[Key, float] = {}
    for leg in legs:
        for rank, key in enumerate(leg, start=1):
            scores[key] = scores.get(key, 0.0) + 1.0 / (fusion_k + rank)
    ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:k]


def _minmax_normalize(scores: np.ndarray, ascending_better: bool) -> np.ndarray:
    """Min-max to [0, 1], 1 = best. ascending_better=True for distance
    metrics (smaller distance is better) — direction-aware as in
    computeNormalizedScore."""
    if scores.size == 0:
        return scores
    lo, hi = float(np.min(scores)), float(np.max(scores))
    if hi - lo < 1e-12:
        return np.ones_like(scores)
    norm = (scores - lo) / (hi - lo)
    return 1.0 - norm if ascending_better else norm


def relative_score_fusion(
    vec_leg: List[Tuple[Key, float]],
    text_leg: List[Tuple[Key, float]],
    k: int,
    *,
    fusion_weight: float = 0.5,
    vec_ascending_better: bool = True,
) -> List[Tuple[Key, float]]:
    """RSF: fused = w·norm_text + (1-w)·norm_vec. Items missing from a leg
    contribute 0 from that leg (same as the reference: fusion operates on
    the union of the two top-k lists)."""
    w = float(fusion_weight)
    fused: Dict[Key, float] = {}
    if vec_leg:
        keys = [kv[0] for kv in vec_leg]
        norm = _minmax_normalize(
            np.asarray([kv[1] for kv in vec_leg], np.float64), vec_ascending_better
        )
        for key, s in zip(keys, norm):
            fused[key] = fused.get(key, 0.0) + (1.0 - w) * float(s)
    if text_leg:
        keys = [kv[0] for kv in text_leg]
        norm = _minmax_normalize(
            np.asarray([kv[1] for kv in text_leg], np.float64), False
        )
        for key, s in zip(keys, norm):
            fused[key] = fused.get(key, 0.0) + w * float(s)
    ordered = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:k]
