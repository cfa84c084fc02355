"""Vector search execution: per-segment search + global top-k merge.

This is the TPU re-expression of the reference's search-manager stack
(SURVEY.md §3.1):

  MergeTreeVSManager::vectorScan            -> search_segment (index or scan)
  performPrefilter + DenseBitmap            -> filters.Expr -> device mask
  getTotalTopSearchResultImpl (k-way heap)  -> device merge across segments
  mergeResult (score join by label)         -> SearchResult.gather (host)

Labels stay segment-local; a global hit is (segment_id, row_id, score).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Settings
from ..errors import IndexNotReadyError, QueryShapeError
from ..metrics import Metric, score_to_distance
from ..ops import bruteforce
from ..ops.topk import NEG_INF
from ..service.event_log import GLOBAL_COUNTERS
from .filters import Expr


@dataclasses.dataclass
class SearchResult:
    """Global top-k for a batch of queries.

    scores:   f32[Q, k] internal max-is-better scores (-inf = missing)
    segments: int64[Q, k] segment ids (-1 = missing)
    rows:     int32[Q, k] segment-local row ids (-1 = missing)
    metric:   for converting scores to user-visible distances
    """

    scores: np.ndarray
    segments: np.ndarray
    rows: np.ndarray
    metric: Metric
    query_sqnorm: Optional[np.ndarray] = None  # |q|^2 per query (L2 reporting)

    @property
    def k(self) -> int:
        return self.scores.shape[1]

    @property
    def nq(self) -> int:
        return self.scores.shape[0]

    @property
    def valid(self) -> np.ndarray:
        return self.rows >= 0

    @property
    def distances(self) -> np.ndarray:
        """User-visible distance column. L2 reports |q-x|^2 (the per-query
        |q|^2 constant dropped inside the kernel is re-applied here)."""
        d = score_to_distance(self.metric, self.scores.astype(np.float64))
        if self.metric == Metric.L2 and self.query_sqnorm is not None:
            d = d + self.query_sqnorm[:, None]
            d = np.maximum(d, 0.0)
        return np.where(self.valid, d, np.inf).astype(np.float32)


def _as_query_batch(query, dim: int) -> Tuple[np.ndarray, bool]:
    q = np.asarray(query, dtype=np.float32)
    batched = q.ndim == 2
    if q.ndim == 1:
        q = q[None, :]
    if q.ndim != 2 or q.shape[1] != dim:
        raise QueryShapeError(f"query must be [*, {dim}], got {q.shape}")
    return q, batched


def _pad_queries_dev(q: np.ndarray, dpad: int) -> jax.Array:
    if q.shape[1] < dpad:
        q = np.pad(q, ((0, 0), (0, dpad - q.shape[1])))
    return jnp.asarray(q, dtype=jnp.float32)


def segment_mask(segment, filter_expr: Optional[Expr]) -> Optional[jax.Array]:
    """Pre-filter bitmap for one segment: WHERE bitmap ∩ alive bitmap,
    extended to capacity (False in padding). None when unconstrained."""
    alive = segment.alive_mask_device()
    if filter_expr is None:
        return alive  # may be None
    host = filter_expr.evaluate(segment)  # bool[n_rows]
    full = np.zeros(segment.capacity, dtype=bool)
    full[: segment.n_rows] = host
    dev = jnp.asarray(full)
    if alive is not None:
        dev = jnp.logical_and(dev, alive)
    return dev


def merge_across_segments(
    per_segment: Sequence[Tuple[int, jax.Array, jax.Array]], k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge [(segment_id, scores[Q,k'], rows[Q,k'])] into global top-k.

    Device k-way merge (the getTotalTopSearchResultImpl analogue): stack all
    candidate lists, one exact top-k over the concatenation.
    """
    assert per_segment
    seg_ids = np.array([s for s, _, _ in per_segment], dtype=np.int64)
    vals = jnp.concatenate([v for _, v, _ in per_segment], axis=-1)  # [Q, S*k']
    rows = jnp.concatenate([r for _, _, r in per_segment], axis=-1)
    ks = [v.shape[-1] for _, v, _ in per_segment]
    seg_tag = np.repeat(np.arange(len(per_segment), dtype=np.int32), ks)
    seg_tag_dev = jnp.asarray(seg_tag)[None, :]

    kk = min(k, vals.shape[-1])
    mvals, pos = jax.lax.top_k(vals, kk)
    mrows = jnp.take_along_axis(rows, pos, axis=-1)
    msegs = jnp.take_along_axis(
        jnp.broadcast_to(seg_tag_dev, vals.shape), pos, axis=-1
    )
    mvals_h = np.asarray(mvals)
    mrows_h = np.asarray(mrows)
    msegs_h = seg_ids[np.asarray(msegs)]
    invalid = ~np.isfinite(mvals_h) | (mrows_h < 0)
    mrows_h = np.where(invalid, -1, mrows_h)
    msegs_h = np.where(invalid, -1, msegs_h)
    if kk < k:
        padq = ((0, 0), (0, k - kk))
        mvals_h = np.pad(mvals_h, padq, constant_values=NEG_INF)
        mrows_h = np.pad(mrows_h, padq, constant_values=-1)
        msegs_h = np.pad(msegs_h, padq, constant_values=-1)
    return mvals_h, msegs_h, mrows_h


class VectorSearchExecutor:
    """Executes a vector search over a table's segments.

    Index-vs-brute-force policy per segment (bruteForceSearchEnabled,
    MergeTreeVSManager.cpp:1681-1688): a LOADED index for the column is
    used when present; otherwise small segments always scan exactly; large
    segments scan only if enable_brute_force_vector_search.
    """

    def __init__(self, table):
        self.table = table

    def run(
        self,
        column: str,
        query,
        k: Optional[int],
        *,
        filter: Optional[Expr] = None,
        params: Optional[Dict[str, Any]] = None,
        metric: Optional[Metric] = None,
        settings: Optional[Settings] = None,
        two_stage: Optional[bool] = None,
    ) -> SearchResult:
        t = self.table
        st = settings or t.settings
        vtype = t.schema.require_vector(column)
        k = int(k if k is not None else st.query.default_topk)
        if k <= 0:
            raise QueryShapeError("k must be positive")
        if k > st.query.max_search_result_window:
            raise QueryShapeError(
                f"top-k window {k} exceeds max_search_result_window="
                f"{st.query.max_search_result_window}"
            )
        metric = metric or t.index_metric_for(column)
        qh, _ = _as_query_batch(query, vtype.dim)
        GLOBAL_COUNTERS.bump("VectorSearchQueries", qh.shape[0])

        segments = t.live_segments()
        if not segments:
            nq = qh.shape[0]
            return SearchResult(
                scores=np.full((nq, k), NEG_INF, np.float32),
                segments=np.full((nq, k), -1, np.int64),
                rows=np.full((nq, k), -1, np.int32),
                metric=metric,
                query_sqnorm=(qh.astype(np.float64) ** 2).sum(1).astype(np.float32),
            )

        use_two_stage = (
            st.query.two_stage_search if two_stage is None else bool(two_stage)
        )
        per_seg: List[Tuple[int, jax.Array, jax.Array]] = []
        first_stage: List[Tuple[int, Any, jax.Array, jax.Array]] = []
        for seg in segments:
            dpad = seg.vector(column).data.shape[1]
            qdev = _pad_queries_dev(qh, dpad)
            mask = segment_mask(seg, filter)
            idx = t.loaded_index(seg.segment_id, column, metric)
            if (
                use_two_stage
                and idx is not None
                and idx.supports_two_stage()
            ):
                ncand = min(
                    max(k * st.query.two_stage_num_reorder_multiple, k),
                    seg.n_rows,
                )
                vals, rows = idx.search_first_stage(
                    qdev, ncand, params=params, mask=mask
                )
                first_stage.append((seg.segment_id, idx, vals, rows))
                continue
            if idx is not None:
                vals, rows = idx.search(qdev, k, params=params, mask=mask)
                GLOBAL_COUNTERS.bump("VectorIndexSearches")
            else:
                small = seg.n_rows < st.table.min_rows_to_build_vector_index
                if not small and not st.query.enable_brute_force_vector_search:
                    raise IndexNotReadyError(
                        f"segment {seg.segment_id} has no built index for "
                        f"column {column!r} and brute force is disabled"
                    )
                payload = seg.vector(column)
                vals, rows = bruteforce.scan_topk(
                    qdev,
                    payload.data,
                    payload.aux_for(metric),
                    k=k,
                    metric=metric,
                    n_valid=seg.n_rows,
                    mask=mask,
                    approx=st.query.use_approx_topk and seg.n_rows > 4 * k,
                    recall_target=st.query.approx_topk_recall_target,
                )
                GLOBAL_COUNTERS.bump("VectorBruteForceSearches")
            per_seg.append((seg.segment_id, vals, rows))

        if first_stage:
            per_seg.extend(
                self._second_stage(first_stage, qh, k, metric)
            )

        scores, seg_ids, rows = merge_across_segments(per_seg, k)
        return SearchResult(
            scores=scores,
            segments=seg_ids,
            rows=rows,
            metric=metric,
            query_sqnorm=(qh.astype(np.float64) ** 2).sum(1).astype(np.float32),
        )

    def _second_stage(
        self,
        first_stage: List[Tuple[int, Any, jax.Array, jax.Array]],
        qh: np.ndarray,
        k: int,
        metric: Metric,
    ) -> List[Tuple[int, jax.Array, jax.Array]]:
        """Two-stage: global candidate merge, then exact per-segment re-rank
        (§3.5: getTotalCandidateVSResult -> splitFirstStageVSResult ->
        computeTopDistanceSubset)."""
        # Global candidate cut: keep the best sum(k') candidates overall.
        total = sum(v.shape[-1] for _, _, v, _ in first_stage)
        ncand = min(total, max(k * 4, k))
        all_vals = jnp.concatenate([v for _, _, v, _ in first_stage], axis=-1)
        cut = jax.lax.top_k(all_vals, ncand)[0][:, -1:]  # [Q, 1] threshold
        out = []
        for seg_id, idx, vals, rows in first_stage:
            keep = vals >= cut
            rows_kept = jnp.where(keep, rows, -1)
            exact = idx.compute_scores_subset(
                jnp.asarray(qh, dtype=jnp.float32), rows_kept
            )
            kk = min(k, exact.shape[-1])
            v2, p2 = jax.lax.top_k(exact, kk)
            r2 = jnp.take_along_axis(rows_kept, p2, axis=-1)
            out.append((seg_id, v2, r2))
        return out
