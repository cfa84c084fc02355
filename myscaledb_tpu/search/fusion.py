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

import jax
import jax.numpy as jnp
import numpy as np

Key = Tuple[int, int]  # (segment_id, row_id)

NEG_INF = float("-inf")


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


# --------------------------------------------------------------- on-device
# Batched, jittable fusion over (segment-tag, row) hit pairs; tag/row = -1
# marks an invalid slot. These replace the host dict-based fusion on the
# hot hybrid path (the FusionSortingStep / hybridSearch fusion, on device
# instead of on the initiator's CPU). Pairs instead of packed int64 ids:
# jax defaults to 32-bit and (tag << 32 | row) would truncate.


def _dedup_sum(tags: jax.Array, rows: jax.Array, contrib: jax.Array):
    """Sum `contrib` over equal (tag, row) pairs; only the FIRST occurrence
    keeps the total, the rest get -inf. Returns f32[Q, M]."""
    m = tags.shape[-1]
    valid = jnp.logical_and(tags >= 0, rows >= 0)
    eq = jnp.logical_and(
        jnp.logical_and(
            tags[:, :, None] == tags[:, None, :],
            rows[:, :, None] == rows[:, None, :],
        ),
        valid[:, None, :],
    )
    tot = jnp.einsum("qmn,qn->qm", eq.astype(jnp.float32), contrib)
    first = jnp.argmax(eq, axis=-1) == jnp.arange(m, dtype=jnp.int32)[None, :]
    keep = jnp.logical_and(first, valid)
    return jnp.where(keep, tot, NEG_INF)


def _cut(tags, rows, tot, k):
    kk = min(k, tot.shape[-1])
    vals, pos = jax.lax.top_k(tot, kk)
    otag = jnp.take_along_axis(tags, pos, axis=-1)
    orow = jnp.take_along_axis(rows, pos, axis=-1)
    ok = jnp.isfinite(vals)
    otag = jnp.where(ok, otag, -1)
    orow = jnp.where(ok, orow, -1)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        otag = jnp.pad(otag, pad, constant_values=-1)
        orow = jnp.pad(orow, pad, constant_values=-1)
    return vals, otag, orow


def rrf_fuse_t(
    tags_a: jax.Array,
    rows_a: jax.Array,
    tags_b: jax.Array,
    rows_b: jax.Array,
    k: int,
    *,
    fusion_k: int = 60,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RRF on device over ranked (tag, row) lists [Q, k'] (position =
    rank-1). Returns (scores f32[Q, k], tags, rows)."""
    ka, kb = tags_a.shape[-1], tags_b.shape[-1]
    ra = 1.0 / (fusion_k + jnp.arange(1, ka + 1, dtype=jnp.float32))
    rb = 1.0 / (fusion_k + jnp.arange(1, kb + 1, dtype=jnp.float32))
    va = jnp.logical_and(tags_a >= 0, rows_a >= 0)
    vb = jnp.logical_and(tags_b >= 0, rows_b >= 0)
    contrib = jnp.concatenate(
        [jnp.where(va, ra[None, :], 0.0), jnp.where(vb, rb[None, :], 0.0)],
        axis=-1,
    )
    tags = jnp.concatenate([tags_a, tags_b], axis=-1)
    rows = jnp.concatenate([rows_a, rows_b], axis=-1)
    tot = _dedup_sum(tags, rows, contrib)
    return _cut(tags, rows, tot, k)


def _minmax_norm_t(scores: jax.Array, valid: jax.Array, ascending_better: bool):
    """Device min-max over valid entries per row; 1 = best, invalid -> 0."""
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid, scores, big), axis=-1, keepdims=True)
    hi = jnp.max(jnp.where(valid, scores, -big), axis=-1, keepdims=True)
    span = hi - lo
    norm = (scores - lo) / jnp.where(span > 0, span, 1.0)
    if ascending_better:
        norm = 1.0 - norm
    # all-equal leg: every valid item is "best" (matches host fallback)
    norm = jnp.where(span > 1e-12, norm, 1.0)
    return jnp.where(valid, norm, 0.0)


def rsf_fuse_t(
    tags_v: jax.Array,
    rows_v: jax.Array,
    scores_v: jax.Array,
    tags_t: jax.Array,
    rows_t: jax.Array,
    scores_t: jax.Array,
    k: int,
    *,
    fusion_weight: float = 0.5,
    vec_ascending_better: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RSF on device (HybridSearchUtils.cpp:212-313): per-leg min-max
    normalize, fused = w·text + (1-w)·vec over the union. scores_v is the
    INTERNAL max-better score; because score→distance is affine per
    metric, normalizing it with metrics.score_ascending_better(metric)
    equals the reference's direction-aware normalization of distances."""
    w = float(fusion_weight)
    valid_v = jnp.logical_and(tags_v >= 0, rows_v >= 0)
    valid_t = jnp.logical_and(tags_t >= 0, rows_t >= 0)
    nv = _minmax_norm_t(scores_v, valid_v, vec_ascending_better) * (1.0 - w)
    nt = _minmax_norm_t(scores_t, valid_t, False) * w
    tags = jnp.concatenate([tags_v, tags_t], axis=-1)
    rows = jnp.concatenate([rows_v, rows_t], axis=-1)
    contrib = jnp.concatenate([nv, nt], axis=-1)
    tot = _dedup_sum(tags, rows, contrib)
    return _cut(tags, rows, tot, k)
