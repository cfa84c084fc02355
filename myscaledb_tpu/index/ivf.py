"""IVF-FLAT index: k-means coarse quantizer + bucketed posting lists.

TPU re-design of the reference's IVFFLAT (search-index library, SURVEY.md
§2.3). The CPU layout (ragged posting lists, per-list scan) becomes a
static bucketed layout:

  * centroids f32[C, D]: trained by ops/kmeans (MXU Lloyd's);
  * bucket_data [C, B, D]: every cluster padded/clipped to a fixed bucket
    capacity B (≈1.2× mean cluster size, multiple of 8). Static shapes —
    XLA-friendly; memory overhead is the padding (~20%).
  * rows that overflow their bucket spill to a small FLAT "overflow" region
    scanned on every query — so clipping never loses rows, it only moves
    them to the exact path (recall can only go up).

Search: top-nprobe centroids per query on the MXU, then a lax.scan over
probe slots — each step gathers one bucket per query ([Q, B, D] HBM read),
scores it, and folds into a running top-k. The pre-filter/delete bitmap is
applied inside the scan by row-id lookup (same contract as the bitmap
passed into index->search at VIWithDataPart.cpp:930).

Cosine is handled as normalize-then-IP (the reference does the same,
VIWithDataPart.h:349-381): bucket vectors are stored pre-normalized.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import IndexParameterError
from ..metrics import Metric
from ..ops import bruteforce, distance, kmeans
from ..ops._pallas import round_up
from ..ops.topk import NEG_INF, topk_scores
from .base import IndexKind, ParamsKey, VectorIndex, register_index_pytree
from .registry import register

DEFAULT_NPROBE = 16


def default_ncentroids(n_rows: int) -> int:
    """~4*sqrt(N), power-of-two-ish, clamped (FAISS-style heuristic)."""
    c = int(4 * math.sqrt(max(n_rows, 1)))
    c = 1 << max(4, int(round(math.log2(max(c, 16)))))
    return int(min(c, max(16, n_rows // 8), 65_536))


def _scan_rep(payload, n_rows: int, metric: Metric) -> jax.Array:
    """Rows in 'scan representation': raw for L2/IP, normalized for Cosine."""
    data = payload.data[:n_rows].astype(jnp.float32)
    if metric == Metric.COSINE and payload.invnorm is not None:
        data = data * payload.invnorm[:n_rows, None]
    return data


@register(IndexKind.IVFFLAT)
@register_index_pytree
class IVFFlatIndex(VectorIndex):
    _array_fields = (
        "centroids",
        "csq",
        "bucket_data",
        "bucket_rows",
        "bucket_aux",
        "over_data",
        "over_rows",
        "over_aux",
    )
    _static_fields = (
        "metric",
        "dim",
        "n_rows",
        "n_clusters",
        "bucket_cap",
        "n_overflow",
        "approx",
        "recall_target",
    )

    def __init__(
        self,
        centroids,
        csq,
        bucket_data,
        bucket_rows,
        bucket_aux,
        over_data,
        over_rows,
        over_aux,
        *,
        metric: Metric,
        dim: int,
        n_rows: int,
        n_clusters: int,
        bucket_cap: int,
        n_overflow: int,
        approx: bool = True,
        recall_target: float = 0.99,
    ):
        self.centroids = centroids
        self.csq = csq
        self.bucket_data = bucket_data
        self.bucket_rows = bucket_rows
        self.bucket_aux = bucket_aux
        self.over_data = over_data
        self.over_rows = over_rows
        self.over_aux = over_aux
        self.metric = metric
        self.dim = dim
        self.n_rows = n_rows
        self.n_clusters = n_clusters
        self.bucket_cap = bucket_cap
        self.n_overflow = n_overflow
        self.approx = approx
        self.recall_target = recall_target

    # ------------------------------------------------------------- build
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
    ) -> "IVFFlatIndex":
        if metric not in (Metric.L2, Metric.IP, Metric.COSINE):
            raise IndexParameterError(f"IVFFLAT does not support metric {metric}")
        params = params or {}
        c = int(params.get("ncentroids", default_ncentroids(n_rows)))
        c = max(1, min(c, n_rows))
        storage_dtype = payload.data.dtype
        dpad = payload.data.shape[1]

        rep = _scan_rep(payload, n_rows, metric)  # f32[n, dpad] device
        sample = kmeans.training_sample(rep, n_rows, c, seed=0)
        cents = kmeans.kmeans_fit(sample, n_clusters=c, n_iters=10, seed=0)
        assign = np.asarray(kmeans.assign_chunked(rep, cents))  # [n] host

        # Host-side bucket packing (build path; one device pull + one push).
        sizes = np.bincount(assign, minlength=c)
        mean = max(1.0, n_rows / c)
        cap = int(round_up(max(32, int(math.ceil(1.2 * mean))), 8))
        order = np.argsort(assign, kind="stable")
        rep_h = np.asarray(rep, dtype=np.float32)
        sq_h = (rep_h.astype(np.float64) ** 2).sum(1).astype(np.float32)

        bucket_rows = np.full((c, cap), -1, np.int32)
        overflow: list = []
        starts = np.zeros(c + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        for ci in range(c):
            rows = order[starts[ci] : starts[ci + 1]]
            take = min(len(rows), cap)
            bucket_rows[ci, :take] = rows[:take]
            if len(rows) > take:
                overflow.extend(rows[take:].tolist())
        over = np.asarray(overflow, dtype=np.int64)
        n_over = len(over)
        opad = round_up(max(n_over, 8), 8)

        flat_rows = bucket_rows.reshape(-1)
        safe = np.maximum(flat_rows, 0)
        bucket_data = rep_h[safe].reshape(c, cap, dpad)
        bucket_data[bucket_rows < 0] = 0.0
        bucket_aux = sq_h[safe].reshape(c, cap)
        bucket_aux[bucket_rows < 0] = np.float32(np.inf)  # L2 score -> -inf

        over_data = np.zeros((opad, dpad), np.float32)
        over_rows = np.full(opad, -1, np.int32)
        over_aux = np.full(opad, np.inf, np.float32)
        if n_over:
            over_data[:n_over] = rep_h[over]
            over_rows[:n_over] = over
            over_aux[:n_over] = sq_h[over]

        csq = np.asarray(jnp.sum(cents * cents, axis=1))
        approx = bool(settings is None or settings.query.use_approx_topk)
        rt = settings.query.approx_topk_recall_target if settings else 0.99
        return cls(
            jnp.asarray(cents),
            jnp.asarray(csq),
            jnp.asarray(bucket_data, dtype=storage_dtype),
            jnp.asarray(bucket_rows),
            jnp.asarray(bucket_aux),
            jnp.asarray(over_data, dtype=storage_dtype),
            jnp.asarray(over_rows),
            jnp.asarray(over_aux),
            metric=metric,
            dim=dim,
            n_rows=n_rows,
            n_clusters=c,
            bucket_cap=cap,
            n_overflow=n_over,
            approx=approx,
            recall_target=rt,
        )

    # ------------------------------------------------------------- search
    def _nprobe(self, params: ParamsKey) -> int:
        p = dict(params).get("nprobe", DEFAULT_NPROBE)
        return int(max(1, min(int(p), self.n_clusters)))

    def search_t(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
    ) -> Tuple[jax.Array, jax.Array]:
        nprobe = self._nprobe(params)
        nq = queries.shape[0]
        q = queries.astype(jnp.float32)
        if self.metric == Metric.COSINE:
            nrm = jnp.linalg.norm(q, axis=1, keepdims=True)
            q = q / jnp.where(nrm > 0, nrm, 1.0)

        # Coarse probe: MXU score vs all centroids. Cell ranking must match
        # the ASSIGNMENT geometry (rows were L2-assigned by k-means): for L2
        # and Cosine (|q|=1 after normalization) rank by 2 q·c - |c|^2. For
        # IP (MIPS) rank by raw q·c — large-norm centroids aligned with q.
        cs = jnp.dot(q, self.centroids.T, preferred_element_type=jnp.float32)
        if self.metric in (Metric.L2, Metric.COSINE):
            cs = 2.0 * cs - self.csq[None, :]
        _, probe = jax.lax.top_k(cs, nprobe)  # [Q, P]

        # hi/lo query split against bf16 buckets (see split_query_bf16)
        if self.bucket_data.dtype == jnp.bfloat16:
            q_parts = distance.split_query_bf16(q)  # [2, Q, D]
        else:
            q_parts = q.astype(jnp.float32)[None]  # [1, Q, D]
        kk = min(k, self.bucket_cap)  # per-step cut; final pads below

        def step(carry, s):
            bv, br = carry
            cl = probe[:, s]  # [Q]
            xb = jnp.take(self.bucket_data, cl, axis=0)  # [Q, B, D]
            rows = jnp.take(self.bucket_rows, cl, axis=0)  # [Q, B]
            scores = jnp.zeros((q.shape[0], xb.shape[1]), jnp.float32)
            for p in range(q_parts.shape[0]):
                scores = scores + jax.lax.dot_general(
                    q_parts[p][:, None, :],
                    xb,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )[:, 0, :]  # [Q, B]
            if self.metric == Metric.L2:
                aux = jnp.take(self.bucket_aux, cl, axis=0)
                scores = 2.0 * scores - aux
            valid = rows >= 0
            if mask is not None:
                valid = jnp.logical_and(
                    valid, jnp.take(mask, jnp.maximum(rows, 0))
                )
            scores = jnp.where(valid, scores, NEG_INF)
            sv, sp = topk_scores(
                scores, kk, approx=self.approx, recall_target=self.recall_target
            )
            sr = jnp.take_along_axis(rows, jnp.maximum(sp, 0), axis=-1)
            sr = jnp.where(sp >= 0, sr, -1)
            mv = jnp.concatenate([bv, sv], axis=-1)
            mr = jnp.concatenate([br, sr], axis=-1)
            nv, npos = jax.lax.top_k(mv, kk)
            nr = jnp.take_along_axis(mr, npos, axis=-1)
            return (nv, nr), None

        init = (
            jnp.full((nq, kk), NEG_INF, jnp.float32),
            jnp.full((nq, kk), -1, jnp.int32),
        )
        (bv, br), _ = jax.lax.scan(
            step, init, jnp.arange(nprobe, dtype=jnp.int32)
        )

        if self.n_overflow > 0:
            omask = None
            if mask is not None:
                omask = jnp.where(
                    self.over_rows >= 0,
                    jnp.take(mask, jnp.maximum(self.over_rows, 0)),
                    False,
                )
            ov, op = bruteforce.scan_topk_t(
                q,  # normalized for Cosine — must match bucket scoring
                self.over_data,
                None if self.metric != Metric.L2 else self.over_aux,
                k=kk,
                metric=self.metric if self.metric != Metric.COSINE else Metric.IP,
                n_valid=self.n_overflow,
                mask=omask,
                approx=False,
            )
            orr = jnp.where(op >= 0, jnp.take(self.over_rows, jnp.maximum(op, 0)), -1)
            bv = jnp.concatenate([bv, ov], axis=-1)
            br = jnp.concatenate([br, orr], axis=-1)
            bv, pos = jax.lax.top_k(bv, kk)
            br = jnp.take_along_axis(br, pos, axis=-1)

        br = jnp.where(jnp.isfinite(bv), br, -1)
        if kk < k:
            pad = ((0, 0), (0, k - kk))
            bv = jnp.pad(bv, pad, constant_values=NEG_INF)
            br = jnp.pad(br, pad, constant_values=-1)
        return bv, br

    @property
    def memory_bytes(self) -> int:
        total = 0
        for f in self._array_fields:
            a = getattr(self, f)
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total

    def state_dict(self) -> Dict[str, Any]:
        return {
            "meta": {
                "kind": self.kind.value,
                "metric": self.metric.value,
                "dim": self.dim,
                "n_rows": self.n_rows,
                "n_clusters": self.n_clusters,
                "bucket_cap": self.bucket_cap,
                "n_overflow": self.n_overflow,
                "approx": self.approx,
                "recall_target": self.recall_target,
                "storage_dtype": str(self.bucket_data.dtype),
            },
            "arrays": {
                f: np.asarray(getattr(self, f))
                for f in self._array_fields
            },
        }

    @classmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "IVFFlatIndex":
        m = state["meta"]
        a = state["arrays"]
        dt = jnp.bfloat16 if "bfloat16" in m["storage_dtype"] else jnp.float32
        return cls(
            jnp.asarray(a["centroids"]),
            jnp.asarray(a["csq"]),
            jnp.asarray(a["bucket_data"], dtype=dt),
            jnp.asarray(a["bucket_rows"]),
            jnp.asarray(a["bucket_aux"]),
            jnp.asarray(a["over_data"], dtype=dt),
            jnp.asarray(a["over_rows"]),
            jnp.asarray(a["over_aux"]),
            metric=Metric(m["metric"]),
            dim=m["dim"],
            n_rows=m["n_rows"],
            n_clusters=m["n_clusters"],
            bucket_cap=m["bucket_cap"],
            n_overflow=m["n_overflow"],
            approx=m["approx"],
            recall_target=m["recall_target"],
        )
