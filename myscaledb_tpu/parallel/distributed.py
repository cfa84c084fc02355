"""Multi-chip execution: corpus sharding, ICI top-k merge, sharded k-means.

The reference scales out two ways (SURVEY.md §5 'distributed communication
backend'): (a) shards via the Distributed engine — each shard searches its
parts and the initiator fuses top-k; (b) replicas exchange built index
files. The TPU-native equivalents here:

  * corpus rows sharded over a mesh "data" axis (a chip's HBM slice is the
    'shard'); per-chip top-k then an all_gather over ICI + local merge
    replaces the initiator's k-way fusion (getTotalTopSearchResultImpl);
  * query batches sharded over a "query" axis (connection-level
    parallelism);
  * k-means training is data-parallel Lloyd's: per-chip (sums, counts)
    psum'd over the "data" axis (the ICI allreduce replaces the build
    library's thread pool).

All functions work on any jax.sharding.Mesh, including the CPU
host-platform virtual mesh used in tests and the driver dry run.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..metrics import Metric
from ..ops import kmeans
from ..ops.bruteforce import scan_topk_t
from ..ops.topk import NEG_INF


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    query_axis: int = 1,
    axis_names: Tuple[str, str] = ("query", "data"),
) -> Mesh:
    """1xN (or QxD) mesh over the first n devices. The "data" axis shards
    the corpus; the "query" axis shards the request batch."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % query_axis:
        raise ValueError(f"n_devices={n} not divisible by query_axis={query_axis}")
    arr = np.array(devs[:n]).reshape(query_axis, n // query_axis)
    return Mesh(arr, axis_names)


def shard_rows(mesh: Mesh, host_array: np.ndarray, axis: str = "data"):
    """Place [N, ...] rows sharded over the mesh's data axis (replicated on
    the query axis). N must divide evenly (pad first)."""
    spec = P(axis) if host_array.ndim == 1 else P(axis, *([None] * (host_array.ndim - 1)))
    return jax.device_put(host_array, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, host_array: np.ndarray):
    return jax.device_put(host_array, NamedSharding(mesh, P()))


# --------------------------------------------------------------- search
def distributed_scan_topk(
    mesh: Mesh,
    queries: jax.Array,
    data: jax.Array,
    aux: Optional[jax.Array],
    *,
    k: int,
    metric: Metric,
    rows_per_shard: int,
    approx: bool = False,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact scan over a corpus sharded on the "data" axis; queries sharded
    on the "query" axis. Returns globally-merged (scores, row_ids) sharded
    over "query" — row ids are global. `mask` is an optional bool[N]
    pre-filter (WHERE bitmap ∩ alive bitmap), row-sharded like the data.

    Per chip: local fused scan (Pallas/XLA) -> [Qs, k]. ICI: all_gather the
    per-chip top-k over "data" (k·S tiny rows) and merge locally — the
    bandwidth-optimal analogue of the reference's per-part merge.
    """
    n_data = mesh.shape["data"]
    aux_in = aux if aux is not None else jnp.zeros((data.shape[0],), jnp.float32)
    mask_in = (
        mask if mask is not None else jnp.ones((data.shape[0],), jnp.bool_)
    )

    def local(q, x, a, m):
        my = jax.lax.axis_index("data")
        v, r = scan_topk_t(
            q,
            x,
            a,
            k=k,
            metric=metric,
            n_valid=rows_per_shard,
            approx=approx,
            mask=m,
        )
        r = jnp.where(r >= 0, r + my * rows_per_shard, -1)
        # [S, Q, k] on every chip of the data axis (ICI all-gather)
        gv = jax.lax.all_gather(v, "data")
        gr = jax.lax.all_gather(r, "data")
        gv = jnp.transpose(gv, (1, 0, 2)).reshape(v.shape[0], -1)
        gr = jnp.transpose(gr, (1, 0, 2)).reshape(v.shape[0], -1)
        mv, pos = jax.lax.top_k(gv, k)
        mr = jnp.take_along_axis(gr, pos, axis=-1)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        return mv, mr

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("query", None), P("data", None), P("data"), P("data")),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )
    return fn(queries, data, aux_in, mask_in)


# --------------------------------------------------------------- k-means
def sharded_lloyd_step(mesh: Mesh, data: jax.Array, centroids: jax.Array):
    """One Lloyd's iteration with the corpus sharded on "data": local
    (sums, counts) + psum over ICI, replicated centroid update."""

    def local(x, c):
        sums, counts = kmeans.lloyd_stats(x, c)
        sums = jax.lax.psum(sums, "data")
        counts = jax.lax.psum(counts, "data")
        return kmeans.lloyd_update(c, sums, counts)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(data, centroids)


def sharded_kmeans_fit(
    mesh: Mesh,
    data: jax.Array,
    *,
    n_clusters: int,
    n_iters: int = 10,
    seed: int = 0,
) -> jax.Array:
    """Multi-chip k-means over a row-sharded corpus. Init from the first
    rows of the corpus (deterministic; callers pre-shuffle)."""
    cents = jax.device_put(
        data[:n_clusters].astype(jnp.float32), NamedSharding(mesh, P())
    )
    step = jax.jit(functools.partial(sharded_lloyd_step, mesh))
    for _ in range(n_iters):
        cents = step(data, cents)
    return cents


# ------------------------------------------------------ sharded IVF search
def distributed_ivf_topk(
    mesh: Mesh,
    queries: jax.Array,  # [Q, D] sharded on "query"
    centroids: jax.Array,  # [S, C, D] sharded on "data" (per-shard quantizer)
    csq: jax.Array,  # [S, C]
    perm_data: jax.Array,  # [S, NP, D] cluster-major rows per shard
    perm_aux: jax.Array,  # [S, NP] |x|^2 (inf pad)
    perm_rows: jax.Array,  # [S, NP] local row ids (-1 pad)
    cluster_start: jax.Array,  # [S, C+1]
    *,
    k: int,
    nprobe: int,
    bucket_pad: int,
    rows_per_shard: int,
    mask: Optional[jax.Array] = None,  # bool row-sharded (local row space)
) -> Tuple[jax.Array, jax.Array]:
    """IVF search where every chip holds its own per-shard index (the
    per-part index model: each part/shard searched independently,
    MergeTreeVSManager::vectorScan), merged over ICI. L2 metric; row ids
    returned are global (local + shard offset). `mask` is an optional
    bool pre-filter over LOCAL row ids (alive ∩ WHERE), row-sharded like
    the original data — candidates are masked by a [Q, P·B] gather, the
    per-part performPrefilter analogue."""
    mask_in = (
        mask
        if mask is not None
        else jnp.ones((perm_rows.shape[0] * rows_per_shard,), jnp.bool_)
    )

    def local(q, cents, cq, pdata, paux, prows, cstart, m):
        cents, cq = cents[0], cq[0]
        pdata, paux, prows, cstart = pdata[0], paux[0], prows[0], cstart[0]
        my = jax.lax.axis_index("data")
        nq = q.shape[0]
        qs = q.astype(jnp.float32)
        cs = 2.0 * jnp.dot(qs, cents.T, preferred_element_type=jnp.float32) - cq[None, :]
        _, probe = jax.lax.top_k(cs, min(nprobe, cents.shape[0]))  # [Q, P]
        starts = jnp.take(cstart, probe)
        sizes = jnp.take(cstart, probe + 1) - starts
        offs = jnp.arange(bucket_pad, dtype=jnp.int32)
        idx = starts[..., None] + offs[None, None, :]  # [Q, P, B]
        valid = offs[None, None, :] < sizes[..., None]
        idx = jnp.where(valid, idx, 0).reshape(nq, -1)
        rows_mat = jnp.take(pdata, idx, axis=0).astype(jnp.float32)  # [Q, PB, D]
        scores = 2.0 * jnp.einsum(
            "qd,qbd->qb", qs, rows_mat, preferred_element_type=jnp.float32
        ) - jnp.take(paux, idx)
        rows = jnp.take(prows, idx)
        ok = jnp.logical_and(valid.reshape(nq, -1), rows >= 0)
        ok = jnp.logical_and(ok, jnp.take(m, jnp.maximum(rows, 0)))
        scores = jnp.where(ok, scores, NEG_INF)
        kk = min(k, scores.shape[-1])
        v, pos = jax.lax.top_k(scores, kk)
        r = jnp.take_along_axis(rows, pos, axis=-1)
        r = jnp.where(jnp.isfinite(v), r + my * rows_per_shard, -1)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            r = jnp.pad(r, ((0, 0), (0, k - kk)), constant_values=-1)
        gv = jax.lax.all_gather(v, "data")  # [S, Q, k]
        gr = jax.lax.all_gather(r, "data")
        gv = jnp.transpose(gv, (1, 0, 2)).reshape(nq, -1)
        gr = jnp.transpose(gr, (1, 0, 2)).reshape(nq, -1)
        mv, mpos = jax.lax.top_k(gv, k)
        mr = jnp.take_along_axis(gr, mpos, axis=-1)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        return mv, mr

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("query", None),
            P("data", None, None),
            P("data", None),
            P("data", None, None),
            P("data", None),
            P("data", None),
            P("data", None),
            P("data"),
        ),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )
    return fn(
        queries, centroids, csq, perm_data, perm_aux, perm_rows,
        cluster_start, mask_in,
    )


# ----------------------------------------------- sharded two-stage (MSTG)
def distributed_twostage_topk(
    mesh: Mesh,
    queries: jax.Array,  # [Q, D] sharded on "query"
    centroids: jax.Array,  # [S, C, D] sharded on "data"
    csq: jax.Array,  # [S, C]
    lo: jax.Array,  # f32[D] SQ8 codec (global, replicated)
    scale: jax.Array,  # f32[D]
    perm_codes: jax.Array,  # uint8[S, NP, D] cluster-major SQ8 codes
    perm_sq: jax.Array,  # f32[S, NP] |decode(code)|^2 (inf pad)
    perm_rows: jax.Array,  # int32[S, NP] local row ids (-1 pad)
    cluster_start: jax.Array,  # int32[S, C+1]
    raw: jax.Array,  # [S*cap, D] row-sharded full-precision slots
    raw_aux: jax.Array,  # f32[S*cap] |x|^2
    *,
    k: int,
    nprobe: int,
    num_reorder: int,
    bucket_pad: int,
    rows_per_shard: int,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage MSTG-style sharded search (SURVEY §3.5): per shard, an
    SQ8 first pass over the probed clusters selects `num_reorder`
    candidates by approximate score, then the shard re-ranks ITS OWN
    candidates exactly against the full-precision slots it already holds
    (computeTopDistanceSubset runs where the data lives — no cross-shard
    candidate gather), and the exact per-shard top-k lists merge over
    ICI. The SQ8 windows are the only per-shard index payload (1 byte/dim
    vs the IVF layout's full-precision copy), which is the point of the
    two-stage kind at mesh scale: index HBM shrinks ~4x. L2 metric, like
    distributed_ivf_topk. Reference: MergeTreeVSManager
    executeSecondStageVectorScan (.cpp:510) + VIWithDataPart
    computeTopDistanceSubset."""
    mask_in = (
        mask
        if mask is not None
        else jnp.ones((perm_rows.shape[0] * rows_per_shard,), jnp.bool_)
    )

    def local(q, cents, cq, lo, scale, pcodes, psq, prows, cstart, x, a, m):
        cents, cq = cents[0], cq[0]
        pcodes, psq, prows, cstart = pcodes[0], psq[0], prows[0], cstart[0]
        my = jax.lax.axis_index("data")
        nq = q.shape[0]
        qs = q.astype(jnp.float32)
        cs = 2.0 * jnp.dot(qs, cents.T, preferred_element_type=jnp.float32) - cq[None, :]
        _, probe = jax.lax.top_k(cs, min(nprobe, cents.shape[0]))
        starts = jnp.take(cstart, probe)
        sizes = jnp.take(cstart, probe + 1) - starts
        offs = jnp.arange(bucket_pad, dtype=jnp.int32)
        idx = starts[..., None] + offs[None, None, :]  # [Q, P, B]
        valid = offs[None, None, :] < sizes[..., None]
        idx = jnp.where(valid, idx, 0).reshape(nq, -1)
        # first pass: q.decode(c) = (q*scale).c + q.lo  (decode fused into
        # the einsum operand; the codes stream as uint8)
        codes_mat = jnp.take(pcodes, idx, axis=0).astype(jnp.float32)
        qlo = jnp.dot(qs, lo, preferred_element_type=jnp.float32)  # [Q]
        dots = jnp.einsum(
            "qd,qbd->qb", qs * scale[None, :], codes_mat,
            preferred_element_type=jnp.float32,
        ) + qlo[:, None]
        approx = 2.0 * dots - jnp.take(psq, idx)
        rows = jnp.take(prows, idx)
        ok = jnp.logical_and(valid.reshape(nq, -1), rows >= 0)
        ok = jnp.logical_and(ok, jnp.take(m, jnp.maximum(rows, 0)))
        approx = jnp.where(ok, approx, NEG_INF)
        rr = min(num_reorder, approx.shape[-1])
        av, apos = jax.lax.top_k(approx, rr)
        cand = jnp.take_along_axis(rows, apos, axis=-1)  # [Q, R] local rows
        # second stage: exact re-rank of the shard's own candidates
        xi = jnp.take(x, jnp.maximum(cand, 0), axis=0).astype(jnp.float32)
        exact = 2.0 * jnp.einsum(
            "qd,qrd->qr", qs, xi, preferred_element_type=jnp.float32
        ) - jnp.take(a, jnp.maximum(cand, 0))
        exact = jnp.where(jnp.isfinite(av), exact, NEG_INF)
        kk = min(k, exact.shape[-1])
        v, pos = jax.lax.top_k(exact, kk)
        r = jnp.take_along_axis(cand, pos, axis=-1)
        r = jnp.where(jnp.isfinite(v), r + my * rows_per_shard, -1)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            r = jnp.pad(r, ((0, 0), (0, k - kk)), constant_values=-1)
        gv = jax.lax.all_gather(v, "data")
        gr = jax.lax.all_gather(r, "data")
        gv = jnp.transpose(gv, (1, 0, 2)).reshape(nq, -1)
        gr = jnp.transpose(gr, (1, 0, 2)).reshape(nq, -1)
        mv, mpos = jax.lax.top_k(gv, k)
        mr = jnp.take_along_axis(gr, mpos, axis=-1)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        return mv, mr

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("query", None),
            P("data", None, None),
            P("data", None),
            P(),
            P(),
            P("data", None, None),
            P("data", None),
            P("data", None),
            P("data", None),
            P("data", None),
            P("data"),
            P("data"),
        ),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )
    return fn(
        queries, centroids, csq, lo, scale, perm_codes, perm_sq, perm_rows,
        cluster_start, raw, raw_aux, mask_in,
    )


# ------------------------------------------------------- sharded BM25 leg
def distributed_bm25_topk(
    mesh: Mesh,
    starts: jax.Array,  # int32[S, T] per-shard posting range starts
    lengths: jax.Array,  # int32[S, T]
    idfs: jax.Array,  # f32[T] GLOBAL idf (cluster-merged stats)
    avg_len: jax.Array,  # f32 scalar (global)
    postings_rows: jax.Array,  # int32[S, NNZ]
    postings_tf: jax.Array,  # f32[S, NNZ]
    doc_len: jax.Array,  # f32[S, CAP]
    *,
    k: int,
    budget: int,
    rows_per_shard: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """One text query against per-shard inverted indexes with GLOBAL corpus
    statistics (the _fts_statistic_info contract: idf/avg_len computed from
    cluster-wide stats so shard scores are comparable), merged over ICI."""

    def local(st, ln, idf, al, prow, ptf, dl):
        st, ln, prow, ptf, dl = st[0], ln[0], prow[0], ptf[0], dl[0]
        my = jax.lax.axis_index("data")
        cap = dl.shape[0]
        n_terms = st.shape[0]
        scores = jnp.zeros((cap,), jnp.float32)

        def body(t, acc):
            rows = jax.lax.dynamic_slice(prow, (st[t],), (budget,))
            tf = jax.lax.dynamic_slice(ptf, (st[t],), (budget,))
            valid = jnp.arange(budget, dtype=jnp.int32) < ln[t]
            rows = jnp.where(valid, rows, cap)
            dlen = jnp.take(dl, jnp.minimum(rows, cap - 1))
            denom = tf + k1 * (1.0 - b + b * dlen / al)
            contrib = idf[t] * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
            return acc.at[rows].add(jnp.where(valid, contrib, 0.0), mode="drop")

        scores = jax.lax.fori_loop(0, n_terms, body, scores)
        scores = jnp.where(scores > 0, scores, NEG_INF)
        kk = min(k, cap)
        v, r = jax.lax.top_k(scores, kk)
        r = jnp.where(jnp.isfinite(v), r + my * rows_per_shard, -1)
        if kk < k:
            v = jnp.pad(v, (0, k - kk), constant_values=NEG_INF)
            r = jnp.pad(r, (0, k - kk), constant_values=-1)
        gv = jax.lax.all_gather(v, "data").reshape(-1)
        gr = jax.lax.all_gather(r, "data").reshape(-1)
        mv, pos = jax.lax.top_k(gv, k)
        mr = jnp.take(gr, pos)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        return mv[None, :], mr[None, :]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None),
            P("data", None),
            P(None),
            P(),
            P("data", None),
            P("data", None),
            P("data", None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(starts, lengths, idfs, avg_len, postings_rows, postings_tf, doc_len)


def distributed_bm25_topk_batch(
    mesh: Mesh,
    starts: jax.Array,  # int32[S, Q, T] per-shard posting range starts
    lengths: jax.Array,  # int32[S, Q, T]
    idfs: jax.Array,  # f32[Q, T] GLOBAL idf (cluster-merged stats)
    avg_len: jax.Array,  # f32 scalar (global)
    postings_rows: jax.Array,  # int32[S, NNZ]
    postings_tf: jax.Array,  # f32[S, NNZ]
    doc_len: jax.Array,  # f32[S, CAP]
    alive: jax.Array,  # bool row-sharded flat (alive ∩ WHERE, local rows)
    *,
    k: int,
    budget: int,
    rows_per_shard: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jax.Array, jax.Array]:
    """Batched (multi-query) BM25 over per-shard inverted indexes with
    GLOBAL statistics (the _fts_statistic_info contract), merged over ICI.
    Queries are replicated across the data axis; term slots are per-query
    (T = padded query term count; lengths 0 = absent term). Returns
    replicated (scores, global_rows) f32/int32[Q, k]."""

    def local(st, ln, idf, al, prow, ptf, dl, alv):
        st, ln, prow, ptf = st[0], ln[0], prow[0], ptf[0]
        dl = dl[0]
        my = jax.lax.axis_index("data")
        cap = dl.shape[0]
        nq, n_terms = st.shape
        qi = jnp.arange(nq, dtype=jnp.int32)[:, None]
        scores = jnp.zeros((nq, cap), jnp.float32)

        def body(t, acc):
            def one_q(s0, l0):
                rows = jax.lax.dynamic_slice(prow, (s0,), (budget,))
                tf = jax.lax.dynamic_slice(ptf, (s0,), (budget,))
                valid = jnp.arange(budget, dtype=jnp.int32) < l0
                return rows, tf, valid

            rows, tf, valid = jax.vmap(one_q)(st[:, t], ln[:, t])  # [Q, B]
            rows = jnp.where(valid, rows, cap)  # cap = dropped by scatter
            dlen = jnp.take(dl, jnp.minimum(rows, cap - 1))
            denom = tf + k1 * (1.0 - b + b * dlen / al)
            idf_t = jnp.take(idf, t, axis=1)[:, None]
            contrib = idf_t * tf * (k1 + 1.0) / jnp.maximum(denom, 1e-9)
            return acc.at[qi, rows].add(
                jnp.where(valid, contrib, 0.0), mode="drop"
            )

        scores = jax.lax.fori_loop(0, n_terms, body, scores)
        scores = jnp.where(
            jnp.logical_and(scores > 0, alv[None, :]), scores, NEG_INF
        )
        kk = min(k, cap)
        v, r = jax.lax.top_k(scores, kk)
        r = jnp.where(jnp.isfinite(v), r + my * rows_per_shard, -1)
        if kk < k:
            v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            r = jnp.pad(r, ((0, 0), (0, k - kk)), constant_values=-1)
        gv = jax.lax.all_gather(v, "data")  # [S, Q, k]
        gr = jax.lax.all_gather(r, "data")
        gv = jnp.transpose(gv, (1, 0, 2)).reshape(nq, -1)
        gr = jnp.transpose(gr, (1, 0, 2)).reshape(nq, -1)
        mv, pos = jax.lax.top_k(gv, k)
        mr = jnp.take_along_axis(gr, pos, axis=-1)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        return mv, mr

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", None, None),
            P("data", None, None),
            P(None, None),
            P(),
            P("data", None),
            P("data", None),
            P("data", None),
            P("data"),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(
        starts, lengths, idfs, avg_len, postings_rows, postings_tf,
        doc_len, alive,
    )


# ----------------------------------------------------------- fused step
def make_train_and_search_step(mesh: Mesh, *, k: int, metric: Metric, rows_per_shard: int):
    """One jitted 'full step' over the mesh: a Lloyd's training iteration
    (psum over "data") + a sharded exact search with ICI top-k merge.
    This is the step the driver dry-runs multi-chip (see __graft_entry__).
    """

    def step(queries, data, aux, centroids):
        new_cents = sharded_lloyd_step(mesh, data, centroids)
        vals, rows = distributed_scan_topk(
            mesh,
            queries,
            data,
            aux,
            k=k,
            metric=metric,
            rows_per_shard=rows_per_shard,
        )
        return vals, rows, new_cents

    return jax.jit(step)


def make_full_step(
    mesh: Mesh,
    *,
    k: int,
    metric: Metric,
    rows_per_shard: int,
    nprobe: int,
    bucket_pad: int,
    bm25_budget: int,
):
    """The driver's multi-chip dry-run program: ONE jitted step covering the
    engine's whole distributed surface —

      1. a sharded k-means training iteration (index build; ICI psum),
      2. exact scan over the row-sharded corpus with ICI top-k merge,
      3. per-shard IVF index search merged over ICI (per-part index model),
      4. a BM25 text leg with global statistics merged over ICI,
      5. hybrid RRF fusion of the IVF + text legs on device
         (StorageDistributed.cpp:1058-1285 initiator fusion, device-side).

    Mirrors the real engine's sharding: corpus rows on the "data" axis,
    request batch on the "query" axis.
    """
    from ..search.fusion import rrf_fuse_t

    def step(
        queries,
        data,
        aux,
        centroids,
        ivf_cents,
        ivf_csq,
        ivf_pdata,
        ivf_paux,
        ivf_prows,
        ivf_cstart,
        t_starts,
        t_lengths,
        t_idfs,
        t_avglen,
        t_prow,
        t_ptf,
        t_dlen,
    ):
        new_cents = sharded_lloyd_step(mesh, data, centroids)
        ev, er = distributed_scan_topk(
            mesh, queries, data, aux, k=k, metric=metric,
            rows_per_shard=rows_per_shard,
        )
        iv, ir = distributed_ivf_topk(
            mesh, queries, ivf_cents, ivf_csq, ivf_pdata, ivf_paux,
            ivf_prows, ivf_cstart, k=k, nprobe=nprobe,
            bucket_pad=bucket_pad, rows_per_shard=rows_per_shard,
        )
        tv, tr = distributed_bm25_topk(
            mesh, t_starts, t_lengths, t_idfs, t_avglen, t_prow, t_ptf,
            t_dlen, k=k, budget=bm25_budget, rows_per_shard=rows_per_shard,
        )
        tr_b = jnp.broadcast_to(tr, (ir.shape[0], tr.shape[-1]))
        # one global tag space (rows are already global): tag 0 when valid
        fv, _ftag, fr = rrf_fuse_t(
            jnp.where(ir >= 0, 0, -1), ir,
            jnp.where(tr_b >= 0, 0, -1), tr_b,
            k,
        )
        return ev, er, iv, ir, tv, tr, fv, fr, new_cents

    return jax.jit(step)
