"""MeshTable: ONE logical corpus sharded row-wise across a jax Mesh.

This is the TPU-pod serving construct for corpora larger than one chip's
HBM: the payload lives sharded over the mesh's "data" axis, and every
search runs as a SINGLE SPMD program across all chips — per-chip fused
scan / IVF probe, then an ICI `all_gather` of the tiny per-chip top-k
lists and a local merge (the bandwidth-optimal analogue of the
reference's per-part merge + Distributed initiator fusion,
`MergeTreeBaseSearchManager.cpp:207` + `StorageDistributed.cpp:1058`).

Relation to the other scale-out constructs:
  * `ShardedTable` — N separate `Database` shards with python fan-out and
    initiator-side fusion: the analogue of the reference's Distributed
    engine over separate server processes (DCN).
  * `MeshTable` — jax single-controller SPMD over one device mesh (ICI):
    HBM capacity and scan bandwidth scale linearly with the "data" axis;
    query throughput with the "query" axis.

Scope: float vectors, L2/IP/Cosine, exact scan + sharded IVF, numeric
filter columns (device-resident, evaluated inside the program), deletes
via the alive bitmap. Rows are identified by the caller's `id` column.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import QueryShapeError, SchemaError
from ..metrics import Metric
from ..ops.topk import NEG_INF
from .distributed import (
    Mesh,
    NamedSharding,
    P,
    distributed_ivf_topk,
    distributed_scan_topk,
    make_mesh,
    replicate,
    shard_map,
    shard_rows,
    sharded_kmeans_fit,
)

ALIGN = 8  # row padding multiple per shard


class MeshTable:
    def __init__(
        self,
        name: str,
        dim: int,
        *,
        metric: Metric | str = Metric.L2,
        mesh: Optional[Mesh] = None,
        filter_columns: Tuple[str, ...] = (),
    ):
        self.name = name
        self.dim = int(dim)
        self.metric = Metric(metric) if isinstance(metric, str) else metric
        self.mesh = mesh if mesh is not None else make_mesh()
        if "data" not in self.mesh.shape:
            raise SchemaError("MeshTable mesh needs a 'data' axis")
        self.n_shards = int(self.mesh.shape["data"])
        self.filter_columns = tuple(filter_columns)
        # host staging (insert buffers) — sealed to device shards lazily
        self._ids: List[np.ndarray] = []
        self._vecs: List[np.ndarray] = []
        self._cols: Dict[str, List[np.ndarray]] = {c: [] for c in filter_columns}
        self._deleted: set = set()
        self._sealed = None  # (ids, data, aux, alive, cols, n_rows, rows_per_shard)
        self._ivf = None  # (centroids, csq, perm_*, cluster_start, bucket_pad)

    # -------------------------------------------------------------- ingest
    def insert(self, columns: Dict[str, Any]) -> int:
        ids = np.asarray(columns["id"], np.int64)
        vecs = np.asarray(columns["vec"], np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise QueryShapeError(f"vec must be [*, {self.dim}], got {vecs.shape}")
        if len(ids) != len(vecs):
            raise QueryShapeError("id/vec length mismatch")
        self._ids.append(ids)
        self._vecs.append(vecs)
        for c in self.filter_columns:
            v = np.asarray(columns[c])
            if len(v) != len(ids):
                raise QueryShapeError(f"column {c!r} length mismatch")
            self._cols[c].append(v)
        self._sealed = None
        self._ivf = None
        return len(ids)

    def delete(self, ids) -> int:
        before = len(self._deleted)
        self._deleted.update(int(i) for i in np.atleast_1d(np.asarray(ids)))
        self._sealed = None  # alive bitmap changes
        return len(self._deleted) - before

    @property
    def n_rows(self) -> int:
        return sum(len(a) for a in self._ids) - len(self._deleted)

    # ---------------------------------------------------------------- seal
    def _seal(self):
        """Distribute the staged rows across the mesh: pad N to a multiple
        of n_shards*ALIGN, shard the bf16 payload + |x|^2 + alive bitmap +
        filter columns row-wise. Idempotent until the next insert/delete."""
        if self._sealed is not None:
            return self._sealed
        if not self._ids:
            raise SchemaError("MeshTable is empty")
        ids = np.concatenate(self._ids)
        vecs = np.concatenate(self._vecs)
        n = len(ids)
        rps = max(ALIGN, -(-n // (self.n_shards * ALIGN)) * ALIGN)
        n_pad = rps * self.n_shards
        vp = np.zeros((n_pad, self.dim), np.float32)
        vp[:n] = vecs
        if self.metric == Metric.COSINE:
            nrm = np.linalg.norm(vp[:n], axis=1, keepdims=True)
            vp[:n] = vp[:n] / np.where(nrm > 0, nrm, 1.0)
        alive = np.zeros(n_pad, bool)
        alive[:n] = True
        if self._deleted:
            dead = np.isin(ids, np.fromiter(self._deleted, np.int64, len(self._deleted)))
            alive[:n] &= ~dead
        import ml_dtypes

        codes = vp.astype(ml_dtypes.bfloat16)
        dec = codes.astype(np.float32)
        if self.metric == Metric.L2:
            aux = np.einsum("ij,ij->i", dec, dec).astype(np.float32)
        elif self.metric == Metric.COSINE:
            # rows pre-normalized above: the scan's invnorm factor is 1
            aux = np.ones(n_pad, np.float32)
        else:  # IP: unused
            aux = np.zeros(n_pad, np.float32)
        data = shard_rows(self.mesh, codes)
        aux_d = shard_rows(self.mesh, aux)
        alive_d = shard_rows(self.mesh, alive)
        cols_d = {}
        for c in self.filter_columns:
            cv = np.concatenate(self._cols[c])
            pad = np.zeros(n_pad, cv.dtype)
            pad[:n] = cv
            cols_d[c] = shard_rows(self.mesh, pad)
        self._sealed = (ids, data, aux_d, alive_d, cols_d, n, rps)
        return self._sealed

    # -------------------------------------------------------------- search
    def _mask_for(self, filter, alive_d, cols_d):
        """bool[N_pad] sharded mask: alive ∩ filter. Numeric predicates
        evaluate on the DEVICE-SHARDED filter columns inside one program."""
        if filter is None:
            return alive_d

        @jax.jit
        def build(alive, cols):
            return jnp.logical_and(alive, filter(**cols))

        return build(alive_d, cols_d)

    def search(
        self, query, k: int, *, filter=None, params: Optional[Dict] = None
    ):
        """Top-k rows for [D] or [Q, D] queries. filter: a callable taking
        the declared filter columns as kwargs returning bool (traced on
        device, e.g. `lambda price: price < 100`). Returns (ids, scores):
        int64/float32 [Q, k] (-1/-inf empty)."""
        ids, data, aux_d, alive_d, cols_d, n, rps = self._seal()
        q = np.asarray(query, np.float32)
        if q.ndim == 1:
            q = q[None]
        if q.shape[1] != self.dim:
            raise QueryShapeError(f"query must be [*, {self.dim}]")
        nq = q.shape[0]
        qax = int(self.mesh.shape.get("query", 1))
        nq_pad = -(-nq // (qax * ALIGN)) * (qax * ALIGN)
        qp = np.zeros((nq_pad, self.dim), np.float32)
        qp[:nq] = q
        qdev = jax.device_put(qp, NamedSharding(self.mesh, P("query", None)))
        mask = self._mask_for(filter, alive_d, cols_d)
        nprobe = int((params or {}).get("nprobe", 0))
        if self._ivf is not None and nprobe > 0:
            # IVF path applies no filter mask: reject BEFORE dispatching
            # the SPMD program, to keep semantics exact
            if filter is not None or self._deleted:
                raise QueryShapeError(
                    "MeshTable IVF search does not support filters/deletes "
                    "yet — use the exact path (omit nprobe)"
                )
            cents, csq, pdata, paux, prows, cstart, bpad = self._ivf
            v, r = distributed_ivf_topk(
                self.mesh, qdev, cents, csq, pdata, paux, prows, cstart,
                k=k, nprobe=nprobe, bucket_pad=bpad, rows_per_shard=rps,
            )
        else:
            v, r = distributed_scan_topk(
                self.mesh, qdev, data, aux_d,
                k=k, metric=self.metric, rows_per_shard=rps, mask=mask,
            )
        vh = np.asarray(jax.device_get(v))[:nq]
        rh = np.asarray(jax.device_get(r))[:nq]
        out_ids = np.where(rh >= 0, ids[np.clip(rh, 0, len(ids) - 1)], -1)
        out_ids = np.where(np.isfinite(vh), out_ids, -1)
        return out_ids, vh

    # ------------------------------------------------------------- indexes
    def build_ivf(self, ncentroids: int = 0, *, n_iters: int = 8) -> None:
        """Sharded IVF: GLOBAL k-means over ICI (`psum` Lloyd's), then a
        per-shard cluster-major layout built on each chip (one SPMD
        program). Probe-time bucket padding = the max cluster size."""
        ids, data, aux_d, alive_d, cols_d, n, rps = self._seal()
        c = int(ncentroids) or max(16, 1 << int(math.log2(max(16, 4 * math.isqrt(n)))))
        c = min(c, rps)  # centroid init slices the first shard's rows
        cents = sharded_kmeans_fit(self.mesh, data, n_clusters=c, n_iters=n_iters)
        csq = jnp.sum(cents * cents, axis=1)

        def build_local(x, a, al):
            xf = x.astype(jnp.float32)
            scores = 2.0 * jnp.dot(
                xf, cents.T, preferred_element_type=jnp.float32
            ) - csq[None, :]
            assign = jnp.argmax(scores, axis=1)
            # dead/padding rows park in a virtual cluster c (sorted last)
            rows = jnp.arange(x.shape[0], dtype=jnp.int32)
            assign = jnp.where(al, assign, c)
            order = jnp.argsort(assign)
            sa = jnp.take(assign, order)
            pdata = jnp.take(x, order, axis=0)
            paux = jnp.take(a, order)
            prows = jnp.where(sa < c, jnp.take(rows, order), -1)
            cstart = jnp.searchsorted(sa, jnp.arange(c + 1))
            sizes = cstart[1:] - cstart[:-1]
            return pdata, paux, prows, cstart.astype(jnp.int32), jnp.max(sizes)[None]

        fn = shard_map(
            build_local,
            mesh=self.mesh,
            in_specs=(P("data", None), P("data"), P("data")),
            out_specs=(
                P("data", None), P("data"), P("data"), P("data"), P("data"),
            ),
            check_vma=False,
        )
        pdata, paux, prows, cstart, maxsz = jax.jit(fn)(data, aux_d, alive_d)
        bpad = int(np.max(np.asarray(jax.device_get(maxsz))))
        bpad = max(ALIGN, -(-bpad // ALIGN) * ALIGN)
        s = self.n_shards
        self._ivf = (
            jnp.broadcast_to(cents[None], (s,) + cents.shape),
            jnp.broadcast_to(csq[None], (s, c)),
            pdata.reshape(s, rps, -1),
            paux.reshape(s, rps),
            prows.reshape(s, rps),
            cstart.reshape(s, c + 1),
            bpad,
        )
