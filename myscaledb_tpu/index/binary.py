"""Binary vector indexes: BinaryFLAT (exact) and BinaryMSTG (IVF-bucketed).

Reference: BinaryFLAT / BINARYMSTG over FixedString(D/8) columns
(SURVEY.md §2.3; test 00038_mqvs_binary_vector_feature.sql). Metrics:
Hamming and Jaccard (ops/binary.py kernels).

BinaryMSTG: the coarse quantizer clusters the UNPACKED {0,1} float view
with MXU k-means (centroids live in float space; probing by L2-on-bits is
equivalent to probing by expected Hamming distance), while bucket payloads
stay packed uint8 and are scored with popcount kernels. Overflow spills to
an always-scanned exact region, as in the float IVF.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import IndexParameterError
from ..metrics import Metric
from ..ops import binary as binops
from ..ops import kmeans
from ..ops._pallas import round_up
from ..ops.topk import NEG_INF, topk_scores
from .base import IndexKind, ParamsKey, VectorIndex, register_index_pytree
from .ivf import DEFAULT_NPROBE, default_ncentroids
from .registry import register


def _choose_bucket_cap(sizes: np.ndarray, n_rows: int) -> int:
    """Smallest bucket capacity with <=2% of rows spilling to overflow,
    capped at 4x the mean (binary indexes keep the padded-bucket layout —
    binary payloads are small enough that padding is cheap)."""
    import math as _math

    from ..ops._pallas import round_up as _round_up

    mean = max(1.0, n_rows / max(len(sizes), 1))
    hi = int(_round_up(max(32, int(_math.ceil(4.0 * mean))), 8))
    lo = int(_round_up(max(32, int(_math.ceil(1.0 * mean))), 8))
    cap = hi
    for cand in range(lo, hi + 1, 8):
        if np.maximum(sizes - cand, 0).sum() <= 0.02 * n_rows:
            cap = cand
            break
    return int(cap)


@register(IndexKind.BINARYFLAT)
@register_index_pytree
class BinaryFlatIndex(VectorIndex):
    _array_fields = ("data",)
    _static_fields = ("metric", "dim", "n_rows")

    def __init__(self, data, *, metric: Metric, dim: int, n_rows: int):
        self.data = data
        self.metric = metric
        self.dim = dim
        self.n_rows = n_rows

    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        if metric not in (Metric.HAMMING, Metric.JACCARD):
            raise IndexParameterError(f"binary index does not support {metric}")
        return cls(payload.data, metric=metric, dim=dim, n_rows=n_rows)

    def search_t(self, queries, k, *, mask=None, params: ParamsKey = ()):
        del params
        return binops.binary_scan_topk(
            queries, self.data, k=k, metric=self.metric, n_valid=self.n_rows, mask=mask
        )

    @property
    def memory_bytes(self) -> int:
        return 0  # references the segment payload

    def state_dict(self):
        return {"meta": {"kind": self.kind.value, "metric": self.metric.value,
                         "dim": self.dim, "n_rows": self.n_rows}}

    @classmethod
    def from_state_dict(cls, state):
        raise NotImplementedError("BinaryFLAT rebuilds from the segment payload")


@register(IndexKind.BINARYMSTG)
@register_index_pytree
class BinaryMSTGIndex(VectorIndex):
    _array_fields = (
        "centroids",  # f32[C, dim] in unpacked-bit space
        "csq",
        "bucket_data",  # uint8[C, B, nbytes]
        "bucket_rows",
        "over_data",
        "over_rows",
    )
    _static_fields = ("metric", "dim", "n_rows", "n_clusters", "bucket_cap", "n_overflow")

    def __init__(self, **kw):
        for f in self._array_fields + self._static_fields:
            setattr(self, f, kw.pop(f))
        assert not kw

    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        if metric not in (Metric.HAMMING, Metric.JACCARD):
            raise IndexParameterError(f"binary index does not support {metric}")
        params = dict(params or {})
        c = int(params.get("ncentroids", max(4, default_ncentroids(n_rows) // 4)))
        c = max(1, min(c, n_rows))
        packed = payload.data[:n_rows]  # uint8[n, nbytes]
        bits = binops.unpack_bits_f32(packed, dim)  # f32[n, dim]
        sample = kmeans.training_sample(bits, n_rows, c, seed=0)
        cents = kmeans.kmeans_fit(sample, n_clusters=c, n_iters=8, seed=0)
        assign = np.asarray(kmeans.assign_chunked(bits, cents, chunk=16_384))

        sizes = np.bincount(assign, minlength=c)
        cap = _choose_bucket_cap(sizes, n_rows)
        order = np.argsort(assign, kind="stable")
        packed_h = np.asarray(packed)
        nbytes = packed_h.shape[1]

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

        safe = np.maximum(bucket_rows.reshape(-1), 0)
        bucket_data = packed_h[safe].reshape(c, cap, nbytes)
        bucket_data[bucket_rows < 0] = 0
        over_data = np.zeros((opad, nbytes), np.uint8)
        over_rows = np.full(opad, -1, np.int32)
        if n_over:
            over_data[:n_over] = packed_h[over]
            over_rows[:n_over] = over
        return cls(
            centroids=cents,
            csq=jnp.sum(cents * cents, axis=1),
            bucket_data=jnp.asarray(bucket_data),
            bucket_rows=jnp.asarray(bucket_rows),
            over_data=jnp.asarray(over_data),
            over_rows=jnp.asarray(over_rows),
            metric=metric,
            dim=dim,
            n_rows=n_rows,
            n_clusters=c,
            bucket_cap=cap,
            n_overflow=n_over,
        )

    def _nprobe(self, params: ParamsKey) -> int:
        d = dict(params)
        p = d.get("nprobe", DEFAULT_NPROBE)
        if "alpha" in d and "nprobe" not in d:
            p = max(1, int(float(d["alpha"]) * DEFAULT_NPROBE))
        return int(max(1, min(int(p), self.n_clusters)))

    def search_t(self, queries, k, *, mask=None, params: ParamsKey = ()):
        nprobe = self._nprobe(params)
        nq = queries.shape[0]
        qbits = binops.unpack_bits_f32(queries, self.dim)  # [Q, dim]
        cs = (
            2.0 * jnp.dot(qbits, self.centroids.T, preferred_element_type=jnp.float32)
            - self.csq[None, :]
        )
        _, probe = jax.lax.top_k(cs, nprobe)
        kk = min(k, self.bucket_cap)

        def step(carry, s):
            bv, br = carry
            cl = probe[:, s]
            xb = jnp.take(self.bucket_data, cl, axis=0)  # [Q, B, nbytes]
            rows = jnp.take(self.bucket_rows, cl, axis=0)
            if self.metric == Metric.HAMMING:
                scores = -jnp.sum(
                    jax.lax.population_count(
                        jnp.bitwise_xor(queries[:, None, :], xb)
                    ).astype(jnp.int32),
                    axis=-1,
                ).astype(jnp.float32)
            else:
                inter = jnp.sum(
                    jax.lax.population_count(
                        jnp.bitwise_and(queries[:, None, :], xb)
                    ).astype(jnp.int32),
                    axis=-1,
                ).astype(jnp.float32)
                union = jnp.sum(
                    jax.lax.population_count(
                        jnp.bitwise_or(queries[:, None, :], xb)
                    ).astype(jnp.int32),
                    axis=-1,
                ).astype(jnp.float32)
                scores = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
            valid = rows >= 0
            if mask is not None:
                valid = jnp.logical_and(valid, jnp.take(mask, jnp.maximum(rows, 0)))
            scores = jnp.where(valid, scores, NEG_INF)
            sv, sp = topk_scores(scores, kk)
            sr = jnp.take_along_axis(rows, jnp.maximum(sp, 0), axis=-1)
            sr = jnp.where(sp >= 0, sr, -1)
            nv, pos = jax.lax.top_k(jnp.concatenate([bv, sv], -1), kk)
            nr = jnp.take_along_axis(jnp.concatenate([br, sr], -1), pos, -1)
            return (nv, nr), None

        init = (
            jnp.full((nq, kk), NEG_INF, jnp.float32),
            jnp.full((nq, kk), -1, jnp.int32),
        )
        (bv, br), _ = jax.lax.scan(step, init, jnp.arange(nprobe, dtype=jnp.int32))

        if self.n_overflow > 0:
            omask = None
            if mask is not None:
                omask = jnp.where(
                    self.over_rows >= 0,
                    jnp.take(mask, jnp.maximum(self.over_rows, 0)),
                    False,
                )
            ov, op = binops.binary_scan_topk(
                queries,
                self.over_data,
                k=kk,
                metric=self.metric,
                n_valid=self.n_overflow,
                mask=omask,
            )
            orr = jnp.where(op >= 0, jnp.take(self.over_rows, jnp.maximum(op, 0)), -1)
            bv, pos = jax.lax.top_k(jnp.concatenate([bv, ov], -1), kk)
            br = jnp.take_along_axis(jnp.concatenate([br, orr], -1), pos, -1)

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
            },
            "arrays": {f: np.asarray(getattr(self, f)) for f in self._array_fields},
        }

    @classmethod
    def from_state_dict(cls, state):
        m, a = state["meta"], state["arrays"]
        return cls(
            centroids=jnp.asarray(a["centroids"]),
            csq=jnp.asarray(a["csq"]),
            bucket_data=jnp.asarray(a["bucket_data"]),
            bucket_rows=jnp.asarray(a["bucket_rows"]),
            over_data=jnp.asarray(a["over_data"]),
            over_rows=jnp.asarray(a["over_rows"]),
            metric=Metric(m["metric"]),
            dim=m["dim"],
            n_rows=m["n_rows"],
            n_clusters=m["n_clusters"],
            bucket_cap=m["bucket_cap"],
            n_overflow=m["n_overflow"],
        )
