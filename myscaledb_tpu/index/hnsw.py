"""HNSW-family graph indexes: HNSWFLAT / HNSWSQ / HNSWPQ.

Reference capability: hnswlib-style graphs inside search-index
(SURVEY.md §2.3; params m / ef_c, search param ef_s; benchmark grid
m=32 ef_c=100, ef_s∈{50..400}). A literal HNSW — sequential greedy
insertion over a multi-layer skip graph — is a pathological fit for a
SIMD machine, so this is a TPU-first redesign with the same contract:

  BUILD (batched, MXU-heavy):
    1. candidate generation: a throwaway IVF index over the segment
       produces each node's ~2m approximate nearest neighbors in large
       query batches (pure matmul work);
    2. diversity pruning: the Vamana/HNSW robust-prune rule — keep
       candidate c unless an already-kept p has α·d(p,c) ≤ d(u,c) —
       applied to whole node-chunks at once ([B, 2m, 2m] MXU distance
       blocks + a lax.fori selection);
    3. reverse-edge pass fills remaining slots (host, one linear sweep);
    4. entry points: the IVF centroids double as the "upper layers" — a
       query starts from the representative rows of its nearest
       centroids, which is what HNSW's hierarchy achieves (log-distance
       routing) without a sequentially-built hierarchy. Entry COUNT
       scales with ef_s (or the `entries` search param);
    5. connectivity repair: components unreachable from the entry set
       get their own entries (_repair_entries) — near-neighbor candidate
       generation cannot guarantee the global connectivity hnswlib gets
       from sequential insertion.

  SEARCH (batched beam, traceable):
    a fixed-iteration frontier loop — expand the best `beam` unexpanded
    candidates per query, gather their neighbor lists, score them on the
    MXU, merge by-id-deduplicated candidates back into the ef-wide
    frontier. The pre-filter bitmap is applied to RESULT collection but
    not to routing (the graph is traversed through filtered-out nodes,
    matching the reference's bitmap-into-index behavior).

  HNSWSQ / HNSWPQ store payload codes (ops/quantize) and decode at
  gather time; scores for L2 use decoded sqnorms so ordering is exact
  w.r.t. codes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import functools

from ..errors import IndexParameterError
from ..metrics import Metric
from ..ops import distance, gathermv, kmeans, quantize
from ..ops._pallas import exact_precision, round_up
from ..ops.topk import NEG_INF, dedup_rows
from .base import IndexKind, ParamsKey, VectorIndex, check_cancel, register_index_pytree
from .ivf import WINDOW, IVFFlatIndex, _scan_rep, default_ncentroids, windows_for_probes
from .registry import register

DEFAULT_M = 32
DEFAULT_EF_C = 100
DEFAULT_EF_S = 64
BEAM = 8  # nodes expanded per iteration per query: the frontier loop is
# the search's LATENCY axis (sequential device steps); a wider beam halves
# the step count at identical total gather traffic, and breadth costs no
# recall at the ef values the reference benchmarks (50-400)
# Iteration budget: iters = max(ITER_MIN, ceil(ITER_FACTOR * ef / BEAM)).
# 1.5 expansions per frontier slot approximates hnswlib's ef-bounded
# greedy walk; ITER_MIN floors short walks so tiny ef still converges.
ITER_FACTOR = 1.5
ITER_MIN = 4
# Cost-model constants for prefer_exact_scan (measured on v5e through the
# tunnel, round 3; see STATUS.md). The frontier loop's cost is
# iterations x (fixed launch/top-k cost + per-query marginal): at nq=256,
# ef=100 (19 iters) a traversal measured ~75 ms while the exact bf16
# tile scan of the same 100k x 960 corpus is ~1-3 ms — on the MXU the
# graph only wins for multi-GB corpora at tiny batches. Conservative in
# the scan's favor is safe: the scan is exact (recall 1.0).
SCAN_BYTES_PER_S = 200e9  # effective exact-scan rate (bench r2: 204 GB/s)
SCAN_FIXED_S = 3e-4  # tile-scan top-k/merge overhead per launch
ITER_FIXED_S = 4.5e-4  # per-frontier-iteration fixed cost
ITER_PER_QUERY_S = 1.4e-5  # per-query marginal cost per iteration
# Final-cut exact re-score: bound on the decoded-f32 gather transient
# [Q, chunk, D]; wide rerank pools re-score in chunks under this cap.
RESCORE_TRANSIENT_CAP = 256 * 1024 * 1024


def scan_beats_graph(nq: int, ef: int, scan_bytes: int) -> bool:
    """The routing cost model, callable without an index instance (the
    EXPLAIN path models unloaded BUILT indexes from their descriptor)."""
    iters = max(ITER_MIN, int(math.ceil(ITER_FACTOR * ef / BEAM)))
    trav_s = iters * (ITER_FIXED_S + nq * ITER_PER_QUERY_S)
    return SCAN_FIXED_S + scan_bytes / SCAN_BYTES_PER_S < trav_s


def default_ef_search(params) -> int:
    """ef_default as _build_common derives it (for descriptor-only cost
    modeling)."""
    ef_c = int((params or {}).get("ef_c", DEFAULT_EF_C))
    return max(DEFAULT_EF_S, ef_c // 2)
PRUNE_ALPHA = 1.2
# Traversal projection width: reps wider than this are PCA-projected for
# ALL routing work (build candidate generation, query-time frontier
# scoring). Distances used for routing are approximations anyway (int8
# shadow); the exact final re-score absorbs the projection error, and the
# gather traffic — the beam search's binding cost at high dims — drops by
# dpad/TRAVERSE_DIM (3.75x at 960-d).
TRAVERSE_DIM = 256
# Node-block neighbor payload: store every node's m neighbor CODE VECTORS
# contiguously so one frontier expansion is Q*BEAM contiguous [m, Dt]
# block reads instead of Q*BEAM*m scattered row gathers. Costs
# n_rows*m*Dt bytes of HBM; disabled above this cap (the row-gather
# shadow path remains).
NODE_BLOCK_CAP_BYTES = 4 << 30
# Projection policy: prefer FULL-dimension int8 blocks when they fit the
# cap (no routing distortion — on isotropic corpora PCA cannot compress
# and costs recall); project only when full-dim blocks would not fit
# (e.g. 1M x 960: routing quality traded for feasibility, absorbed by the
# exact final re-score).


def _prune_chunk(
    node_vecs: jax.Array,  # f32[B, D]
    cand_vecs: jax.Array,  # f32[B, Ck, D]
    cand_rows: jax.Array,  # int32[B, Ck] (-1 invalid), sorted by distance
    m: int,
    alpha: float,
) -> jax.Array:
    """Robust prune for a chunk of nodes -> int32[B, m] neighbor rows."""
    bsz, ck, d = cand_vecs.shape
    # pairwise distances among candidates and node->candidate
    ip = jnp.einsum("bkd,bjd->bkj", cand_vecs, cand_vecs)
    sq = jnp.einsum("bkd,bkd->bk", cand_vecs, cand_vecs)
    d_cc = sq[:, :, None] + sq[:, None, :] - 2.0 * ip  # [B, Ck, Ck]
    d_uc = (
        jnp.einsum("bd,bd->b", node_vecs, node_vecs)[:, None]
        + sq
        - 2.0 * jnp.einsum("bd,bkd->bk", node_vecs, cand_vecs)
    )  # [B, Ck]
    valid = cand_rows >= 0

    def body(j, state):
        kept, count = state  # kept bool[B, Ck], count int32[B]
        # prune j if some kept i has alpha*d(i,j) <= d(u,j)
        dij = jax.lax.dynamic_index_in_dim(d_cc, j, axis=2, keepdims=False)
        duj = jax.lax.dynamic_index_in_dim(d_uc, j, axis=1, keepdims=False)
        vj = jax.lax.dynamic_index_in_dim(valid, j, axis=1, keepdims=False)
        blocked = jnp.any(
            jnp.logical_and(kept, alpha * dij <= duj[:, None]), axis=1
        )
        take = jnp.logical_and(jnp.logical_and(vj, ~blocked), count < m)
        kept = kept.at[:, j].set(take)
        count = count + take.astype(jnp.int32)
        return kept, count

    kept, _ = jax.lax.fori_loop(
        0,
        ck,
        body,
        (jnp.zeros((bsz, ck), bool), jnp.zeros((bsz,), jnp.int32)),
    )
    # compact kept candidates to the front, pad with -1
    order = jnp.argsort(~kept, axis=1, stable=True)  # kept first
    rows_sorted = jnp.take_along_axis(
        jnp.where(kept, cand_rows, -1), order, axis=1
    )
    return rows_sorted[:, :m]


@functools.partial(
    jax.jit, static_argnames=("per", "ck", "m", "alpha", "nprobe", "l2")
)
def _graph_chunk(
    ivf, neighbors, w0, *, per: int, ck: int, m: int, alpha: float,
    nprobe: int, l2: bool,
):
    """Candidate generation + robust prune for `per` consecutive IVF
    windows, scattered into `neighbors` (int32[n+1, m]; the last row is a
    write sink for padding).

    Cluster-blocked build: all 512 rows of a window share ONE candidate
    pool — the windows of the nprobe clusters nearest the window mean. One
    [512, pool] MXU score block replaces round 1's per-row IVF searches
    (per-query window gathers over 4k-query batches — gather-bound and ~2
    orders of magnitude slower at 1M rows)."""
    nw = ivf.n_windows
    pdw = ivf.perm_data.reshape(nw, WINDOW, -1)
    prw = ivf.perm_rows.reshape(nw, WINDOW)
    paw = ivf.perm_aux.reshape(nw, WINDOW)
    sizes = ivf.cluster_start[1:] - ivf.cluster_start[:-1]
    w_budget = int(min(nw + nprobe, nprobe * ivf.wpp + 4))
    n_sent = neighbors.shape[0] - 1

    def step(nbrs, i):
        wi = jnp.minimum(w0 + i, nw - 1)
        q = pdw[wi].astype(jnp.float32)  # [WIN, D]
        qrows = prw[wi]  # [WIN]
        qvalid = qrows >= 0
        # rank clusters by the BEST row<->centroid affinity within the
        # window (a window can span many small clusters; a window-mean
        # probe would cover only a fraction of its rows' neighborhoods)
        cs = jnp.dot(q, ivf.centroids.T, preferred_element_type=jnp.float32)
        if l2:
            cs = 2.0 * cs - ivf.csq[None, :]
        cs = jnp.where(sizes[None, :] > 0, cs, NEG_INF)
        cs = jnp.where(qvalid[:, None], cs, NEG_INF)
        cbest = jnp.max(cs, axis=0, keepdims=True)  # [1, C]
        _, probe = jax.lax.top_k(cbest, nprobe)  # [1, P]
        widx, valid_w = windows_for_probes(ivf.cluster_start, probe, nw, w_budget)
        widx, valid_w = widx[0], valid_w[0]  # [W]
        xb = pdw[widx].astype(jnp.float32).reshape(-1, q.shape[1])  # [P, D]
        prows = jnp.where(valid_w[:, None], prw[widx], -1).reshape(-1)
        scores = jax.lax.dot_general(
            q, xb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=exact_precision(),
        )  # [WIN, P]
        if l2:
            scores = 2.0 * scores - paw[widx].reshape(-1)[None, :]
        bad = jnp.logical_or(
            (prows < 0)[None, :], prows[None, :] == qrows[:, None]
        )
        scores = jnp.where(bad, NEG_INF, scores)
        cv, pos = jax.lax.top_k(scores, ck)  # [WIN, ck]
        crow = jnp.take(prows, pos)
        crow = jnp.where(jnp.isfinite(cv), crow, -1)
        cvecs = jnp.take(xb, pos, axis=0)  # [WIN, ck, D]
        cvecs = jnp.where((crow >= 0)[..., None], cvecs, 0.0)
        nb = _prune_chunk(q, cvecs, crow, m, alpha)  # [WIN, m]
        tgt = jnp.where(qvalid, qrows, n_sent)
        return nbrs.at[tgt].set(nb), None

    neighbors, _ = jax.lax.scan(
        step, neighbors, jnp.arange(per, dtype=jnp.int32)
    )
    return neighbors


def _reach_closure(
    neighbors: np.ndarray, seed: np.ndarray, reach: np.ndarray
) -> None:
    """Mark (in place) every node forward-reachable from `seed`."""
    frontier = seed[seed >= 0]
    frontier = frontier[~reach[frontier]]
    reach[frontier] = True
    while len(frontier):
        nxt = neighbors[frontier].reshape(-1)
        nxt = nxt[nxt >= 0]
        nxt = np.unique(nxt)
        nxt = nxt[~reach[nxt]]
        reach[nxt] = True
        frontier = nxt


def _repair_entries(
    neighbors: np.ndarray, entry_rows: np.ndarray, n_rows: int,
    cancel_cb=None, cap: int = 65536,
) -> np.ndarray:
    """Connectivity repair: extra entry rows so EVERY node is reachable.

    Candidate generation produces near-neighbor edges only, so a corpus
    of well-separated clusters builds near-clique components — and a
    component whose k-means cell shares its head with a neighboring
    cluster has NO entry and is invisible to the beam search at ANY ef
    (the round-3 recall plateau's second cause: ~1.6% of a blob corpus
    was unreachable from the entry set; hnswlib avoids this only because
    sequential insertion always links a new node to the current graph).
    Host BFS over the forward edges; every still-unreachable component
    contributes its first node as an extra entry (its traversal-space
    vector joins the routing centroids, so queries near the component
    enter it directly). Cost: one O(E) sweep + one small sweep per
    repaired component, build-time only."""
    reach = np.zeros(n_rows, bool)
    _reach_closure(neighbors, np.asarray(entry_rows), reach)
    extra: list = []
    while not reach.all() and len(extra) < cap:
        if len(extra) % 256 == 0:
            check_cancel(cancel_cb)
        u = int(np.argmin(reach))  # first unreachable node
        extra.append(u)
        _reach_closure(neighbors, np.asarray([u]), reach)
    return np.asarray(extra, np.int64)


def _graph_candidates(
    ivf, n_rows: int, ck: int, m: int, alpha: float, cancel_cb=None,
    progress_cb=None,
) -> jax.Array:
    """Pruned forward neighbor lists int32[n_rows, m] for every row, via
    cluster-blocked candidate generation over the throwaway IVF. Runs in a
    handful of device programs (macro-chunked for build cancellation)."""
    # probe budget scales with clusters-per-window: every row's own
    # cluster (plus a margin of neighbors) must fit in the probe list
    avg_sz = max(1.0, n_rows / max(ivf.n_clusters, 1))
    nprobe = int(
        min(ivf.n_clusters, max(12, int(math.ceil(WINDOW / avg_sz)) + 8))
    )
    nw = ivf.n_windows
    n_chunks = min(4, nw)
    per = -(-nw // n_chunks)
    neighbors = jnp.full((n_rows + 1, m), -1, jnp.int32)
    for ci in range(n_chunks):
        check_cancel(cancel_cb)
        if progress_cb is not None:
            progress_cb(0.45 + 0.4 * ci / n_chunks)
        neighbors = _graph_chunk(
            ivf, neighbors, jnp.int32(ci * per), per=per, ck=ck, m=m,
            alpha=alpha, nprobe=nprobe,
            l2=ivf.metric in (Metric.L2, Metric.COSINE),
        )
    return neighbors[:n_rows]


class _HNSWBase(VectorIndex):
    _array_fields = (
        "data",  # payload for scoring: raw (storage dtype) or codes
        "aux",  # f32[N'] decoded |x|^2 (L2)
        "codec_a",
        "codec_b",
        "neighbors",  # int32[N', m]
        "centroids",  # f32[C, Dt] entry routing (TRAVERSAL space)
        "csq",
        "entry_rows",  # int32[C]
        # SQ8 TRAVERSAL SHADOW in the (PCA-projected) traversal space: the
        # beam search is scattered-gather-bound at high dims (~49 MB/step
        # at 960-d f32), so frontier expansion scores int8 codes of a
        # TRAVERSE_DIM projection — dpad/Dt * 4 fewer gather bytes — and
        # the final candidates are exactly re-scored against the payload.
        # None only on indexes persisted before this field existed.
        "tdata",  # int8/uint8[N', Dt] traversal codes
        "ta",  # sq8 lo[Dt]
        "tb",  # sq8 scale[Dt]
        "taux",  # f32[N'] |decode(tdata)|^2 (L2 only)
        "tproj",  # f32[D', Dt] PCA projection (None = identity)
        # node-block neighbor payload (see NODE_BLOCK_CAP_BYTES)
        "nbdata",  # codes[N', m, Dt] — node i's neighbor codes, contiguous
        "nbaux",  # f32[N', m] neighbor |x|^2 (L2 only)
    )
    _optional_fields = ("tdata", "ta", "tb", "taux", "tproj", "nbdata", "nbaux")
    _static_fields = ("metric", "dim", "n_rows", "m", "ef_default", "codec")
    codec = "raw"

    def __init__(self, **kw):
        for f in self._array_fields + self._static_fields:
            setattr(self, f, kw.pop(f, None) if f in self._optional_fields else kw.pop(f))
        assert not kw

    @classmethod
    def estimate_build_bytes(cls, payload, n_rows: int, params=None) -> int:
        """Graph builds are device-resident even for host-tier payloads:
        `_build_common` uploads the FULL f32 scan rep (rep = jnp.asarray)
        plus a bf16 IVF payload, the stored data, and the int8 traversal
        shadow — the base class's host-tier sample-only estimate would
        approve beyond-HBM builds that then OOM at step 1. Count the real
        footprint for both tiers: f32 rep + ~2 payload-sized transients +
        shadow/codes (~2 bytes/dim/row)."""
        dpad = payload.data.shape[1]
        rep_f32 = 4 * n_rows * dpad
        m = int((params or {}).get("m", DEFAULT_M))
        # Mirror _build_common's projection condition EXACTLY: the shadow
        # and node blocks stay FULL-dim unless (dpad > TRAVERSE_DIM and
        # the full-dim blocks exceed the cap) — estimating TRAVERSE_DIM
        # unconditionally undercounts 960-d/100k builds ~2.3 GB and
        # admits builds that then OOM (the failure this method exists to
        # prevent).
        projected = (
            dpad > TRAVERSE_DIM and n_rows * m * dpad > NODE_BLOCK_CAP_BYTES
        )
        dt_w = TRAVERSE_DIM if projected else dpad
        nb = n_rows * m * dt_w
        blocks = nb if nb <= NODE_BLOCK_CAP_BYTES else 0
        if getattr(payload, "is_host", False):
            # bf16 IVF payload copy + stored bf16 data + int8 shadow
            return rep_f32 + (2 + 2) * n_rows * dpad + n_rows * dt_w + blocks
        return rep_f32 + 2 * int(payload.nbytes) + n_rows * dt_w + blocks

    # ------------------------------------------------------------- build
    @classmethod
    def _build_common(
        cls, payload, n_rows, *, metric, dim, params, settings, codec,
        progress_cb=None, cancel_cb=None,
    ) -> "_HNSWBase":
        if metric not in (Metric.L2, Metric.IP, Metric.COSINE):
            raise IndexParameterError(f"HNSW does not support metric {metric}")
        params = dict(params or {})
        m = int(params.get("m", DEFAULT_M))
        ef_c = int(params.get("ef_c", DEFAULT_EF_C))
        dpad = payload.data.shape[1]
        rep = _scan_rep(payload, n_rows, metric)  # f32[n, dpad]
        if isinstance(rep, np.ndarray):
            rep = jnp.asarray(rep)  # graph builds are device-resident

        # 0) traversal projection: PCA to TRAVERSE_DIM when wider. All
        # routing — build candidate generation AND query-time frontier
        # expansion — runs in this space; only the final re-score touches
        # full-dim data. PCA beats a random (JL) projection here because
        # real embedding spectra are steep (GIST-960 keeps ~95% variance
        # in 256 dims). Uncentered PCA: L2 differences are translation-
        # invariant, so the mean term only rotates the tail components.
        tproj = None
        rep_t = rep
        if dpad > TRAVERSE_DIM and n_rows * m * dpad > NODE_BLOCK_CAP_BYTES:
            sample = rep[: min(n_rows, 131072)]
            cov = jax.device_get(
                jnp.dot(sample.T, sample, preferred_element_type=jnp.float32)
            )
            check_cancel(cancel_cb)
            w, v = np.linalg.eigh(cov.astype(np.float64))
            tproj = jnp.asarray(
                np.ascontiguousarray(v[:, ::-1][:, :TRAVERSE_DIM]),
                dtype=jnp.float32,
            )
            rep_t = jnp.dot(rep, tproj, preferred_element_type=jnp.float32)

        # 1) candidate generation via a throwaway IVF over the TRAVERSAL
        # representation (normalized rows for Cosine — graph geometry must
        # match search-time scoring space)
        from ..storage.segment import VectorPayload

        ivf_payload = VectorPayload(
            data=rep_t.astype(jnp.bfloat16),
            sqnorm=jnp.sum(rep_t * rep_t, axis=1),
            invnorm=jnp.ones((n_rows,), jnp.float32),
        )
        ivf = IVFFlatIndex._build_common(
            ivf_payload,
            n_rows,
            metric=Metric.L2 if metric != Metric.IP else Metric.IP,
            dim=int(rep_t.shape[1]),
            params={"ncentroids": default_ncentroids(n_rows)},
            settings=settings,
            codec="raw",
            two_stage=False,
            progress_cb=(
                (lambda f: progress_cb(0.45 * f)) if progress_cb else None
            ),
            cancel_cb=cancel_cb,
        )
        # 2) cluster-blocked candidate gen + robust prune, all on device
        ck = min(2 * m + 1, n_rows)
        neighbors = np.array(
            _graph_candidates(
                ivf, n_rows, ck, m, PRUNE_ALPHA, cancel_cb,
                progress_cb=progress_cb,
            )
        )
        check_cancel(cancel_cb)
        if progress_cb is not None:
            progress_cb(0.9)  # graph built; codecs/shadow remain

        # 3) reverse edges into free slots (vectorized host pass): sort all
        # (v, u) reverse edges by target, then scatter each target's first
        # free_v of them into its free slots
        src = np.repeat(np.arange(n_rows, dtype=np.int32), m)
        dst = neighbors.reshape(-1)
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        # rank of each reverse edge within its target group
        grp_start = np.searchsorted(dst, np.arange(n_rows))
        rank = np.arange(len(dst)) - grp_start[dst]
        deg = (neighbors >= 0).sum(axis=1)
        free = m - deg
        slot = deg[dst] + rank
        keep = slot < m
        # duplicate-edge check: u already in v's forward list
        fwd = neighbors[dst[keep]]
        dup = (fwd == src[keep, None]).any(axis=1)
        tgt = dst[keep][~dup]
        who = src[keep][~dup]
        where = slot[keep][~dup]
        neighbors[tgt, where] = who

        # 4) entry points = IVF centroid representatives
        entry_rows = np.asarray(ivf.cluster_heads())
        # 5) connectivity repair: every forward-unreachable component
        # gets its own entry (see _repair_entries)
        extra_entries = _repair_entries(
            neighbors, entry_rows, n_rows, cancel_cb=cancel_cb
        )
        centroids = ivf.centroids
        csq = ivf.csq
        if len(extra_entries):
            extra_c = rep_t[jnp.asarray(extra_entries)]
            centroids = jnp.concatenate([centroids, extra_c], axis=0)
            if csq is not None:
                csq = jnp.concatenate(
                    [csq, jnp.sum(extra_c * extra_c, axis=1)]
                )
            entry_rows = np.concatenate(
                [entry_rows, extra_entries.astype(entry_rows.dtype)]
            )

        # traversal shadow: int8 codes of the traversal-space rep (ALL
        # codecs — routing always uses the cheapest representation)
        ta, tb = quantize.sq8_train_dev(rep_t)
        tdata = quantize.sq8_encode_dev(rep_t, ta, tb)
        taux = None
        if metric in (Metric.L2, Metric.COSINE):
            # Cosine too: projection breaks unit norms, so traversal uses
            # the L2 form (monotone in cosine for normalized full-dim
            # inputs); the exact final re-score restores true cosine.
            tdec = quantize.sq8_decode_dev(tdata, ta, tb).astype(jnp.float32)
            taux = jnp.sum(tdec * tdec, axis=1)

        # node-block neighbor payload: contiguous [m, Dt] code blocks per
        # node — a frontier expansion becomes BEAM contiguous reads
        nbdata = nbaux = None
        neigh_dev = jnp.asarray(neighbors)
        dt_w = int(tdata.shape[1])
        if n_rows * m * dt_w <= NODE_BLOCK_CAP_BYTES:
            safe_n = jnp.maximum(neigh_dev, 0)
            nbdata = jnp.take(tdata, safe_n, axis=0)  # [N, m, Dt]
            if taux is not None:
                nbaux = jnp.take(taux, safe_n)  # [N, m]

        # payload codec for scoring (encoded on device — the corpus never
        # round-trips to the host during a build)
        codec_a = codec_b = None
        host_pl = getattr(payload, "is_host", False)
        store_dt = jnp.bfloat16 if host_pl else payload.data.dtype
        if codec == "raw":
            if metric == Metric.COSINE:
                # Score EXACTLY like the tile scan does: raw payload rows
                # x f32 1/|x| (ops/distance.py:15) — NOT normalize-then-
                # round-to-bf16, which perturbs the same row's score by
                # ~2^-8 relative (bf16 mantissa) vs the scan. That skew
                # made distance-based recall@10 plateau at ~0.95 across
                # every ef in round 3: ~3% of returned rows were
                # *correct* but scored outside the 1e-4 recall tolerance
                # (round-3 verdict missing #1 — the "recall ceiling" was
                # mostly a scoring-consistency defect, not graph quality).
                # Aliasing the payload also halves the graph's HBM
                # footprint for cosine (no normalized copy).
                if host_pl:
                    data = jnp.asarray(
                        np.asarray(payload.data[:n_rows], np.float32)
                    ).astype(store_dt)
                    aux_arr = jnp.asarray(
                        np.asarray(payload.invnorm[:n_rows], np.float32)
                    )
                else:
                    data = payload.data
                    aux_arr = payload.invnorm
            else:
                data = payload.data if not host_pl else rep.astype(store_dt)
                aux_arr = (
                    jnp.sum(rep * rep, axis=1) if metric == Metric.L2 else None
                )
        elif codec == "sq8":
            codec_a, codec_b = quantize.sq8_train_dev(rep)
            data = quantize.sq8_encode_dev(rep, codec_a, codec_b)
            dec = quantize.sq8_decode_dev(data, codec_a, codec_b).astype(
                jnp.float32
            )
            aux_arr = jnp.sum(dec * dec, axis=1)
        elif codec == "pq":
            mm = int(params.get("M", 32))
            if dim % mm:
                raise IndexParameterError(f"dim {dim} not divisible by M={mm}")
            codec_a = quantize.pq_train_dev(
                rep[:, :dim], mm, bits=int(params.get("bit_size", 8))
            )
            data = quantize.pq_encode_dev(rep[:, :dim], codec_a)
            cbn = quantize.pq_codeword_sqnorms(codec_a)
            aux_arr = jnp.sum(
                jnp.take_along_axis(cbn.T, data.astype(jnp.int32), axis=0),
                axis=1,
            )
        else:  # pragma: no cover
            raise IndexParameterError(codec)

        return cls(
            data=data,
            aux=aux_arr,
            codec_a=codec_a,
            codec_b=codec_b,
            neighbors=neigh_dev,
            centroids=centroids,
            csq=csq,
            entry_rows=jnp.asarray(entry_rows),
            tdata=tdata,
            ta=ta,
            tb=tb,
            taux=taux,
            tproj=tproj,
            nbdata=nbdata,
            nbaux=nbaux,
            metric=metric,
            dim=dim,
            n_rows=n_rows,
            m=m,
            ef_default=max(DEFAULT_EF_S, ef_c // 2),
            codec=codec,
        )

    # ------------------------------------------------------------- score
    def _decode_rows(self, rows: jax.Array) -> jax.Array:
        g = jnp.take(self.data, jnp.maximum(rows, 0), axis=0)
        if self.codec == "sq8":
            return quantize.sq8_decode_dev(g, self.codec_a, self.codec_b)
        if self.codec == "pq":
            return quantize.pq_decode_dev(g, self.codec_a)
        return g

    def _score_rows(self, q_parts, rows: jax.Array) -> jax.Array:
        """EXACT scores f32[Q, R] for per-query row sets rows[Q, R]
        against the payload codec. Gathered-row scoring is f32/HIGHEST:
        the bf16 hi/lo split is unsafe inside XLA fusions here (see
        ivf.IVFIndex._decode)."""
        vecs = self._decode_rows(rows).astype(jnp.float32)  # [Q, R, D']
        d = vecs.shape[-1]
        s = jnp.zeros(rows.shape, jnp.float32)
        for p in range(q_parts.shape[0]):
            s = s + jax.lax.dot_general(
                q_parts[p][:, None, :d],
                vecs,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=exact_precision(),
            )[:, 0, :]
        if self.metric == Metric.L2:
            s = 2.0 * s - jnp.take(self.aux, jnp.maximum(rows, 0))
        elif (
            self.metric == Metric.COSINE
            and self.codec == "raw"
            and self.aux is not None
        ):
            # raw-payload cosine: aux holds f32 1/|x| (scan-identical
            # scoring; indexes persisted before this field stored
            # pre-normalized rows and take the plain-dot path)
            s = s * jnp.take(self.aux, jnp.maximum(rows, 0))
        return jnp.where(rows >= 0, s, NEG_INF)

    def _score_traverse(self, qt: jax.Array, rows: jax.Array) -> jax.Array:
        """Traversal-space scores f32[Q, R] via the int8 shadow (row
        gather). qt is the projected query [Q, Dt].

        The sq8 decode is FOLDED INTO THE DOT: dot(q, c*scale + lo) =
        dot(q*scale, c) + dot(q, lo), with the u8 codes cast to bf16
        (0..255 is exact in bf16) inside the matmul — materializing the
        decoded f32 [Q, R, Dt] block costs ~2 HBM round-trips of 4x the
        code bytes per frontier step and dominated the traversal loop
        (probe: per-iter 1.41 ms of which the gather itself was <10%)."""
        g = jnp.take(self.tdata, jnp.maximum(rows, 0), axis=0)
        qs = (qt * self.tb[None, :]).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qs[:, None, :],
            g.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        s = s + jnp.dot(qt, self.ta)[:, None]
        if self.taux is not None:
            s = 2.0 * s - jnp.take(self.taux, jnp.maximum(rows, 0))
        return jnp.where(rows >= 0, s, NEG_INF)

    def _score_blocks(
        self, qt: jax.Array, exp_rows: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Frontier expansion via node blocks: gather each expanded node's
        CONTIGUOUS [m, Dt] neighbor-code block (BEAM block reads per query
        instead of BEAM*m scattered rows) and score in traversal space.
        Returns (scores f32[Q, BEAM*m], neighbor rows int32[Q, BEAM*m])."""
        nq, beam = exp_rows.shape
        safe = jnp.maximum(exp_rows, 0)
        nbrs = jnp.take(self.neighbors, safe, axis=0)  # [Q, B, m]
        nbrs = jnp.where(exp_rows[..., None] >= 0, nbrs, -1)
        # decode folded into the dot (see _score_traverse): u8 codes go
        # into the matmul as bf16; no decoded f32 [Q, B, m, Dt] block
        qs = qt * self.tb[None, :]
        mm, dt = self.nbdata.shape[1], self.nbdata.shape[2]
        if gathermv.supports(beam, mm, dt, nq):
            # fused gather+matvec kernel: blocks stream HBM->VMEM once;
            # the XLA take-then-einsum materializes the gathered copy
            # (~3x the traffic — the traversal loop's dominant cost)
            s = gathermv.gather_block_scores(qs, safe, self.nbdata)
            s = s.reshape(nq, beam, mm)
        else:
            g = jnp.take(self.nbdata, safe, axis=0)  # [Q, B, m, Dt]
            s = jnp.einsum(
                "qd,qbmd->qbm", qs.astype(jnp.bfloat16),
                g.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        s = s + jnp.dot(qt, self.ta)[:, None, None]
        if self.nbaux is not None:
            s = 2.0 * s - jnp.take(self.nbaux, safe, axis=0)
        nbrs = nbrs.reshape(nq, -1)
        s = s.reshape(nq, -1)
        return jnp.where(nbrs >= 0, s, NEG_INF), nbrs

    def _project_query(self, q: jax.Array) -> jax.Array:
        if self.tproj is None:
            return q
        d = self.tproj.shape[0]
        return jnp.dot(
            q[:, :d], self.tproj, preferred_element_type=jnp.float32
        )

    def _q_parts(self, q: jax.Array) -> jax.Array:
        return q.astype(jnp.float32)[None]

    def prefer_exact_scan(
        self, nq: int, k: int, params, scan_bytes: int
    ) -> bool:
        """Graph-vs-scan cost model (scan_beats_graph). `params` is the
        caller's search-params dict/key; ef drives the iteration count
        exactly as search_t derives it."""
        p = dict(params or ())
        ef = max(int(p.get("ef_s", self.ef_default)), k)
        return scan_beats_graph(nq, ef, scan_bytes)

    # ------------------------------------------------------------- search
    def search_t(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
    ) -> Tuple[jax.Array, jax.Array]:
        p = dict(params)
        ef = int(p.get("ef_s", self.ef_default))
        ef = max(ef, k)
        iters = max(ITER_MIN, int(math.ceil(ITER_FACTOR * ef / BEAM)))
        nq = queries.shape[0]
        q = queries.astype(jnp.float32)
        if self.metric == Metric.COSINE:
            nrm = jnp.linalg.norm(q, axis=1, keepdims=True)
            q = q / jnp.where(nrm > 0, nrm, 1.0)
        q_parts = self._q_parts(q)
        qt = self._project_query(q)  # traversal space

        if self.tdata is not None:
            score_t = lambda rows: self._score_traverse(qt, rows)
        else:  # pre-shadow persisted index: route on exact scores
            score_t = lambda rows: self._score_rows(q_parts, rows)

        # entry: representatives of the nearest centroids. Centroids live
        # in TRAVERSAL space (the throwaway IVF was built there). Entry
        # COUNT scales with ef: the round-3 recall plateau (0.958 flat at
        # ef 100..400) was reachability — a walk from 8 fixed entries
        # saturates its basin and extra budget buys nothing; seeding the
        # frontier with ~ef/2 cluster representatives puts every query
        # within a short hop of its true neighborhood (the role hnswlib's
        # upper layers play). One extra matmul row of top_k, no loop cost.
        n_entry = int(p.get("entries", 0)) or max(BEAM, ef // 2)
        n_entry = min(n_entry, self.centroids.shape[0])
        cdim = self.centroids.shape[1]
        cs = jnp.dot(
            qt[:, :cdim] if qt.shape[1] >= cdim else q[:, :cdim],
            self.centroids.T,
            preferred_element_type=jnp.float32,
        )
        if self.metric in (Metric.L2, Metric.COSINE):
            cs = 2.0 * cs - self.csq[None, :]
        _, ecl = jax.lax.top_k(cs, n_entry)  # [Q, E]
        erows = jnp.take(self.entry_rows, ecl)  # [Q, E]
        escores = score_t(erows)

        def res_mask(rows, scores):
            ok = rows >= 0
            if mask is not None:
                ok = jnp.logical_and(ok, jnp.take(mask, jnp.maximum(rows, 0)))
            return jnp.where(ok, scores, NEG_INF)

        # frontier [Q, ef]: traverse-scores + rows + per-slot expanded
        # flags. Duplicates are killed at frontier ENTRY by a KNOWN bitmap
        # (one scatter + one gather per iteration): each node scores at
        # most once per query, so the frontier holds distinct rows and the
        # old per-iteration sort-dedup — the loop's binding cost once
        # node-block gathers made expansion cheap — is unnecessary.
        # (Deduping at EXPANSION instead is wrong: unexpanded copies of
        # hub nodes accumulate and crowd the beam, and recall DROPS as ef
        # grows.) Re-entry after a top-ef cut loses nothing: the
        # frontier's ef-th score is monotone nondecreasing, so a node cut
        # once would be cut again. Results accumulate as a WIDE pool of
        # (approx score, row) pairs, deduped once at the end where the
        # pool is EXACTLY re-scored (traverse scores are int8-approximate).
        npad = self.neighbors.shape[0]
        qidx = jnp.arange(nq, dtype=jnp.int32)[:, None]
        # entry dedup: two centroids may share a representative row, and
        # frontier-distinctness (relied on below) starts here. dedup_rows
        # returns ROW-ID order; re-sort by score so the top-ef cut below
        # keeps the NEAREST entries when ef < n_entry (small ef_s), and
        # mark `known` only for entries that SURVIVE the cut — marking
        # dropped ones would block them from ever re-entering via
        # neighbor expansion.
        escores, erows, _ = dedup_rows(escores, erows, None)
        pos0 = jax.lax.top_k(escores, escores.shape[1])[1]
        escores = jnp.take_along_axis(escores, pos0, axis=1)
        erows = jnp.take_along_axis(erows, pos0, axis=1)
        tril = jnp.asarray(np.tril(np.ones((BEAM, BEAM), bool), -1))
        # result-pool width: the pool accumulates the best `rerank`
        # traverse-scored candidates seen across ALL iterations (the
        # frontier alone forgets anything it cut), and the final cut
        # re-scores pool ∪ frontier EXACTLY. At 2k (round 3) dense
        # near-tie corpora lost true top-10 rows that the int8/PCA
        # traversal misranked past the frontier edge: 1M x 960 strict
        # recall@10 was 0.96 at ef 400 with rp=2k. Default 2*ef: the
        # int8/PCA-256 traversal misorders near-ties (~0.5% score bands),
        # so true top-k rows the walk DID score can sit past the ef-th
        # traverse rank; a wider pool recovers them at the exact re-score
        # for one extra chunked gather, no extra loop iterations (the
        # strict-id recall fix at 1M x 960 blob corpora).
        rp = max(k, int(p.get("rerank", 0)) or 2 * ef)
        pad = ef - n_entry if ef > n_entry else 0
        fv = jnp.pad(escores, ((0, 0), (0, pad)), constant_values=NEG_INF)[:, :ef]
        fr = jnp.pad(erows, ((0, 0), (0, pad)), constant_values=-1)[:, :ef]
        fe = jnp.zeros((nq, ef), bool)
        known = jnp.zeros((nq, npad + 1), bool)  # last col = -1 sink
        known = known.at[qidx, jnp.where(fr >= 0, fr, npad)].set(True)
        # NOTE: the result pool is NOT redundant with the frontier even
        # for unmasked searches — two expanded nodes can share a neighbor
        # within one iteration (the known bitmap only blocks repeats
        # ACROSS iterations), so the frontier can carry intra-iteration
        # duplicate rows; the final dedup_rows cut handles them.
        rv, pos = jax.lax.top_k(
            jnp.pad(
                res_mask(erows, escores),
                ((0, 0), (0, max(0, rp - erows.shape[1]))),
                constant_values=NEG_INF,
            ),
            rp,
        )
        rr = jnp.take_along_axis(
            jnp.pad(
                erows,
                ((0, 0), (0, max(0, rp - erows.shape[1]))),
                constant_values=-1,
            ),
            pos,
            axis=1,
        )

        def body(_, state):
            fv, fr, fe, rv, rr, known = state
            # expand best BEAM unexpanded frontier slots
            sel = jnp.where(jnp.logical_or(fe, fr < 0), NEG_INF, fv)
            bv, bpos = jax.lax.top_k(sel, BEAM)  # positions in frontier
            fe = jnp.logical_or(
                fe, jnp.zeros_like(fe).at[qidx, bpos].set(True)
            )
            exp_rows = jnp.take_along_axis(fr, bpos, axis=1)  # [Q, BEAM]
            exp_rows = jnp.where(bv > NEG_INF, exp_rows, -1)
            # intra-beam dedup: entry-dedup keeps the frontier distinct
            # ACROSS iterations, but copies scored in the same batch can
            # coexist — O(BEAM^2) compare nulls the later copies
            dup = jnp.logical_and(
                exp_rows[:, :, None] == exp_rows[:, None, :], tril
            ).any(-1)
            exp_rows = jnp.where(dup, -1, exp_rows)
            if self.nbdata is not None:
                # contiguous node-block expansion (the gather-bound step)
                ns, nbrs = self._score_blocks(qt, exp_rows)
            else:
                nbrs = jnp.take(
                    self.neighbors, jnp.maximum(exp_rows, 0), axis=0
                )  # [Q, BEAM, m]
                nbrs = jnp.where(
                    exp_rows[..., None] >= 0, nbrs, -1
                ).reshape(nq, -1)
                ns = score_t(nbrs)  # [Q, BEAM*m]
            # kill already-known neighbors at ENTRY (they scored into the
            # pool and the frontier the first time)
            seen = jnp.take_along_axis(
                known, jnp.where(nbrs >= 0, nbrs, npad), axis=1
            )
            ns = jnp.where(seen, NEG_INF, ns)
            nbrs = jnp.where(seen, -1, nbrs)
            known = known.at[
                qidx, jnp.where(nbrs >= 0, nbrs, npad)
            ].set(True)
            # result pool: plain top-k merge of MASKED scores
            cv = jnp.concatenate([rv, res_mask(nbrs, ns)], axis=1)
            cr = jnp.concatenate([rr, nbrs], axis=1)
            rv2, pos2 = jax.lax.top_k(cv, rp)
            rr2 = jnp.take_along_axis(cr, pos2, axis=1)
            # frontier merge: no per-iteration sort-dedup (cross-iteration
            # repeats are dead; intra-iteration dups resolve in the final
            # dedup cut)
            av = jnp.concatenate([fv, ns], axis=1)
            ar = jnp.concatenate([fr, nbrs], axis=1)
            ae = jnp.concatenate([fe, jnp.zeros_like(ns, bool)], axis=1)
            nv, npos = jax.lax.top_k(av, ef)
            nr = jnp.take_along_axis(ar, npos, axis=1)
            ne = jnp.take_along_axis(ae, npos, axis=1)
            return nv, nr, ne, rv2, rr2, known

        fv, fr, fe, rv, rr, known = jax.lax.fori_loop(
            0, iters, body, (fv, fr, fe, rv, rr, known)
        )
        # final cut: pool ∪ frontier, dedup by row id, EXACT re-score
        # (raw payload / codec — traversal used int8 approximations).
        # The re-score gathers [Q, W, D] decoded f32 — chunk the pool so
        # the transient stays bounded at wide rerank pools (a 2k-wide
        # pool at Q=256, D=960 would otherwise materialize ~2 GB).
        pool_r = jnp.concatenate([rr, fr], axis=1)
        pool_v = jnp.concatenate([rv, res_mask(fr, fv)], axis=1)
        _, pr, _ = dedup_rows(pool_v, pool_r, None)
        W = pr.shape[1]
        cap = RESCORE_TRANSIENT_CAP // max(1, nq * self.dim * 4)
        if W <= max(cap, k):
            ev = res_mask(pr, self._score_rows(q_parts, pr))
            rv, pos = jax.lax.top_k(ev, k)
            rr = jnp.take_along_axis(pr, pos, axis=1)
        else:
            step = max(k, cap, 128)
            rv = jnp.full((nq, k), NEG_INF, jnp.float32)
            rr = jnp.full((nq, k), -1, pr.dtype)
            for s in range(0, W, step):
                chunk = pr[:, s : s + step]
                evc = res_mask(chunk, self._score_rows(q_parts, chunk))
                cv = jnp.concatenate([rv, evc], axis=1)
                cr = jnp.concatenate([rr, chunk], axis=1)
                rv, pos = jax.lax.top_k(cv, k)
                rr = jnp.take_along_axis(cr, pos, axis=1)
        rr = jnp.where(jnp.isfinite(rv), rr, -1)
        return rv, rr

    # -------------------------------------------------------------- misc
    @property
    def memory_bytes(self) -> int:
        total = 0
        for f in self._array_fields:
            a = getattr(self, f)
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total

    def state_dict(self) -> Dict[str, Any]:
        arrays = {
            f: np.asarray(getattr(self, f))
            for f in self._array_fields
            if getattr(self, f) is not None
        }
        return {
            "meta": {
                "kind": self.kind.value,
                "metric": self.metric.value,
                "dim": self.dim,
                "n_rows": self.n_rows,
                "m": self.m,
                "ef_default": self.ef_default,
                "codec": self.codec,
                "storage_dtype": str(self.data.dtype),
            },
            "arrays": arrays,
        }

    @classmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "_HNSWBase":
        m = state["meta"]
        a = state["arrays"]
        dt = jnp.bfloat16 if "bfloat16" in m["storage_dtype"] else None
        kw = {}
        for f in cls._array_fields:
            v = a.get(f)
            if v is None:
                kw[f] = None
            elif f == "data" and dt is not None and m["codec"] == "raw":
                kw[f] = jnp.asarray(v, dtype=dt)
            else:
                kw[f] = jnp.asarray(v)
        kw.update(
            metric=Metric(m["metric"]),
            dim=m["dim"],
            n_rows=m["n_rows"],
            m=m["m"],
            ef_default=m["ef_default"],
            codec=m["codec"],
        )
        obj = cls.__new__(cls)
        _HNSWBase.__init__(obj, **kw)
        return obj


@register(IndexKind.HNSWFLAT)
@register_index_pytree
class HNSWFlatIndex(_HNSWBase):
    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=params,
            settings=settings, codec="raw",
            progress_cb=progress_cb, cancel_cb=cancel_cb,
        )


@register(IndexKind.HNSWSQ)
@register_index_pytree
class HNSWSQIndex(_HNSWBase):
    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=params,
            settings=settings, codec="sq8",
            progress_cb=progress_cb, cancel_cb=cancel_cb,
        )


@register(IndexKind.HNSWPQ)
@register_index_pytree
class HNSWPQIndex(_HNSWBase):
    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=params,
            settings=settings, codec="pq",
            progress_cb=progress_cb, cancel_cb=cancel_cb,
        )
