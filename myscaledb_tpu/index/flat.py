"""FLAT index: exact scan, recall 1.0.

The reference's FLAT is FAISS IndexFlat inside search-index; ours is the
fused Pallas/XLA scan of ops/bruteforce.py over the segment's own payload
(no extra memory beyond the stored auxiliaries). It exists as an "index"
so the lifecycle (status, cache accounting, persistence no-op) is uniform.
The executor also instantiates it ad hoc for index-less segments (the
brute-force path, MergeTreeVSManager.cpp:960).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..metrics import Metric
from ..ops import bruteforce, distance
from ..ops._pallas import exact_precision
from .base import IndexKind, ParamsKey, VectorIndex, register_index_pytree
from .registry import register


@register(IndexKind.FLAT)
@register_index_pytree
class FlatIndex(VectorIndex):
    _array_fields = ("data", "aux")
    _static_fields = ("metric", "dim", "n_rows", "approx", "recall_target")

    def __init__(
        self,
        data: jax.Array,
        aux: Optional[jax.Array],
        *,
        metric: Metric,
        dim: int,
        n_rows: int,
        approx: bool = False,
        recall_target: float = 0.99,
    ):
        self.data = data
        self.aux = aux
        self.metric = metric
        self.dim = dim
        self.n_rows = n_rows
        self.approx = approx
        self.recall_target = recall_target

    @classmethod
    def build(
        cls,
        payload,
        n_rows: int,
        *,
        metric: Metric,
        dim: int,
        params: Optional[Dict[str, Any]] = None,
        settings=None,
        progress_cb=None,
        cancel_cb=None,
    ) -> "FlatIndex":
        del params, progress_cb
        approx = bool(settings and settings.query.use_approx_topk)
        rt = settings.query.approx_topk_recall_target if settings else 0.99
        return cls(
            payload.data,
            payload.aux_for(metric),
            metric=metric,
            dim=dim,
            n_rows=n_rows,
            approx=approx,
            recall_target=rt,
        )

    def search_t(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
    ) -> Tuple[jax.Array, jax.Array]:
        del params  # FLAT has no search parameters
        return bruteforce.scan_topk_t(
            queries,
            self.data,
            self.aux,
            k=k,
            metric=self.metric,
            n_valid=self.n_rows,
            mask=mask,
            approx=self.approx and self.n_rows > 4 * k,
            recall_target=self.recall_target,
        )

    def compute_scores_subset(self, queries: jax.Array, row_ids: jax.Array):
        """Exact scores for candidate rows (two-stage re-rank helper)."""
        rows = jnp.take(self.data, jnp.maximum(row_ids, 0), axis=0).astype(jnp.float32)
        q = distance.normalize_queries(queries.astype(jnp.float32), self.metric)
        s = jnp.einsum("qd,qkd->qk", q, rows, precision=exact_precision())
        if self.metric == Metric.L2:
            sq = jnp.sum(rows * rows, axis=-1)
            s = 2.0 * s - sq
        elif self.metric == Metric.COSINE:
            nrm = jnp.linalg.norm(rows, axis=-1)
            s = s * jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
        return jnp.where(row_ids >= 0, s, -jnp.inf)

    @property
    def memory_bytes(self) -> int:
        # FLAT references the segment payload; only auxiliaries are extra.
        return 0 if self.aux is None else self.aux.size * self.aux.dtype.itemsize

    def state_dict(self) -> Dict[str, Any]:
        # FLAT is rebuilt from the segment payload on load; persist metadata only.
        return {
            "meta": {
                "kind": self.kind.value,
                "metric": self.metric.value,
                "dim": self.dim,
                "n_rows": self.n_rows,
            }
        }

    @classmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "FlatIndex":
        raise NotImplementedError(
            "FLAT indexes are rebuilt from the segment payload; use build()"
        )
