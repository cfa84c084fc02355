"""Fused brute-force scan: chunked score computation + masked top-k.

This is the TPU replacement for the reference's mark-by-mark FAISS scan
(vectorScanWithoutIndex, src/VectorIndex/Storages/MergeTreeVSManager.cpp:960
— stream column, pack filter-passing rows, FAISS knn, running top-k merge
via searchWrapper :1538-1679).

TPU design: the base matrix is HBM-resident and statically shaped; we scan
it in row chunks, computing an MXU score tile per chunk (Pallas kernel from
ops/distance.py on aligned shapes), apply the filter/validity mask as a
-inf select (pre-filter semantics: masked rows can never enter the top-k,
exactly like the DenseBitmap passed *into* the index search at
VIWithDataPart.cpp:930), take a per-chunk top-k, and merge chunk results
exactly. XLA pipelines the chunk loop, overlapping HBM reads of chunk i+1
with compute of chunk i.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..metrics import Metric
from . import distance
from ._pallas import round_up
from .topk import NEG_INF, merge_topk_lists, topk_scores

# Rows per scan chunk. 128k rows x 128 dims of bf16 = 32 MiB per chunk read.
DEFAULT_CHUNK_ROWS = 128 * 1024


def _choose_chunk(n: int, target: int) -> int:
    """Largest multiple of 1024 that divides n and is <= target (segments
    are 1024-row aligned). Falls back to n itself for small/odd sizes."""
    if n <= target:
        return n
    if n % 1024 == 0:
        units = n // 1024
        best = 1
        limit = max(1, target // 1024)
        for c in range(1, limit + 1):
            if units % c == 0:
                best = c
        return best * 1024
    return n  # unaligned: single shot


def _chunk_scores(q, block, aux_block, metric):
    """Scores for one chunk; Pallas when aligned on TPU, XLA reference
    otherwise (interpreted Pallas on CPU is pure overhead — the kernel
    itself is covered by dedicated interpret-mode tests)."""
    from ._pallas import use_interpret

    qn, d = q.shape
    nb = block.shape[0]
    if (
        not use_interpret()
        and qn % 8 == 0
        and d % 128 == 0
        and nb % distance.DEFAULT_N_TILE == 0
    ):
        return distance.scores(q, block, aux_block, metric=metric)
    return distance.scores_ref(q, block, aux_block, metric=metric)


def scan_topk_t(
    queries: jax.Array,
    base: jax.Array,
    aux: Optional[jax.Array],
    *,
    k: int,
    metric: Metric,
    n_valid: int,
    mask: Optional[jax.Array] = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    approx: bool = False,
    recall_target: float = 0.99,
) -> Tuple[jax.Array, jax.Array]:
    """Brute-force top-k over a (possibly padded, possibly filtered) base.

    queries: f32[Q, D] — raw; Cosine normalization is applied here.
    base:    [N, D] storage payload (f32 or bf16), rows >= n_valid are padding.
    aux:     f32[N] per-row metric auxiliary (base_aux), or None to compute.
    mask:    optional bool[N] pre-filter (WHERE bitmap ∩ delete bitmap).
    Returns (scores f32[Q, k], indices int32[Q, k]); missing slots are
    (-inf, -1).
    """
    nq, d = queries.shape
    n = base.shape[0]
    queries = distance.normalize_queries(queries.astype(jnp.float32), metric)
    if aux is None and metric != Metric.IP:
        aux = distance.base_aux(base, metric)
    if aux is None:
        aux = jnp.zeros((n,), jnp.float32)

    # Pad queries to the sublane multiple for the Pallas path.
    nq_pad = round_up(max(nq, 1), 8)
    if nq_pad != nq:
        queries = jnp.pad(queries, ((0, nq_pad - nq), (0, 0)))

    valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    if mask is not None:
        valid = jnp.logical_and(valid, mask)

    # Tile-max pruned scan (no score-matrix round trip): one Pallas pass
    # reduces scores to per-sub-tile maxes inside VMEM, then only the
    # top-(k+slack) sub-tiles per query are gathered and exactly rescored.
    from . import tilescan

    if not approx and tilescan.supports(n, d, queries.shape[0], k):
        # Strategy gate: the tile-max prune re-reads ksel*SUB raw ROWS per
        # query for the exact rescore (2 x Q x ksel x 128 x D x itemsize
        # of gather write+read traffic); the full-scores path pays the
        # [Q, N] score matrix round-trips instead (~3 x Q x N x 4). At
        # SIFT shapes (1M x 128, batch 100) the prune wins ~6x; at GIST
        # shapes (100k x 960-d f32, batch 256) the rescore gather is
        # ~3.2 GB — 10x the corpus — and the full path wins ~10x.
        ksel = min(k + tilescan.TILE_SLACK, n // tilescan.SUB)
        prune_bytes = 2 * nq_pad * ksel * tilescan.SUB * d * base.dtype.itemsize
        full_bytes = 3 * nq_pad * n * 4
        if prune_bytes < full_bytes:
            aux_in = aux if aux is not None else jnp.zeros((n,), jnp.float32)
            vals, idx = tilescan.tile_topk_scan(
                queries, base, aux_in, valid.astype(jnp.uint8), k=k,
                metric=metric,
            )
            return vals[:nq], idx[:nq]

    chunk = _choose_chunk(n, chunk_rows)
    def _select(s):
        if approx:
            return topk_scores(
                s, k, approx=True, recall_target=recall_target
            )
        from .topk import wide_exact_topk

        return wide_exact_topk(s, k)

    if chunk >= n:
        s = _chunk_scores(queries, base, aux, metric)
        s = jnp.where(valid[None, :], s, NEG_INF)
        vals, idx = _select(s)
    else:
        nc = n // chunk
        blocks = base.reshape(nc, chunk, d)
        auxb = aux.reshape(nc, chunk)
        validb = valid.reshape(nc, chunk)
        offs = jnp.arange(nc, dtype=jnp.int32) * chunk

        def body(args):
            block, a, v, off = args
            s = _chunk_scores(queries, block, a, metric)
            s = jnp.where(v[None, :], s, NEG_INF)
            cv, ci = _select(s)
            return cv, jnp.where(ci >= 0, ci + off, -1)

        cvals, cidx = jax.lax.map(body, (blocks, auxb, validb, offs))
        # [nc, Q, k] -> [Q, nc, k] -> exact merge to [Q, k]
        vals, idx = merge_topk_lists(
            jnp.transpose(cvals, (1, 0, 2)), jnp.transpose(cidx, (1, 0, 2)), k
        )

    idx = jnp.where(jnp.isfinite(vals), idx, -1)
    return vals[:nq], idx[:nq]


def stream_scan_topk(
    queries: jax.Array,
    data_np,
    aux_np,
    *,
    k: int,
    metric: Metric,
    n_valid: int,
    mask=None,
    chunk: int = 131_072,
) -> Tuple[jax.Array, jax.Array]:
    """Exact scan over a HOST-resident payload (beyond-HBM tier): stream
    fixed-size chunks through the device and fold a running top-k. Eager
    (one device program per chunk, pipelined by dispatch); the padded
    fixed chunk shape keeps it at one compile."""
    import numpy as np

    from .topk import merge_topk

    nq = queries.shape[0]
    d = data_np.shape[1]
    bv = jnp.full((nq, k), NEG_INF, jnp.float32)
    br = jnp.full((nq, k), -1, jnp.int32)
    qn = distance.normalize_queries(queries.astype(jnp.float32), metric)
    if mask is not None:
        total = -(-n_valid // chunk) * chunk
        if mask.shape[0] < total:
            mask = jnp.pad(mask, (0, total - mask.shape[0]))
    steps = 0
    # ONE reusable staging buffer: a fresh 512 MB np array per chunk left
    # ~0.8 GB/chunk resident on the tunnel backend even after the sync
    # (per-transfer pinned copies keyed by source buffer) — a 33 GB
    # corpus climbed past 100 GB RSS. Refilling the same buffer keeps the
    # whole stream at one staging block; the sync below makes the refill
    # safe (the previous transfer has landed before we overwrite).
    blk = np.zeros((chunk, d), np.float32)
    ab = np.zeros((chunk,), np.float32)
    for i in range(0, n_valid, chunk):
        m = min(chunk, n_valid - i)
        blk[:m] = data_np[i : i + m]
        if m < chunk:
            blk[m:] = 0.0
        if aux_np is not None:
            ab[:m] = aux_np[i : i + m]
            if m < chunk:
                ab[m:] = 0.0
        cm = None if mask is None else jax.lax.dynamic_slice_in_dim(mask, i, chunk)
        v, r = scan_topk(
            qn, jnp.asarray(blk), jnp.asarray(ab),
            k=k, metric=metric, n_valid=m, mask=cm,
        )
        r = jnp.where(r >= 0, r + i, -1)
        bv, br = merge_topk(bv, br, v, r, k)
        steps += 1
        # sync EVERY chunk: (a) bounds the dispatch pipeline (unbounded
        # dispatch pinned 50+ staging blocks and drew the kernel OOM
        # killer), (b) makes the staging-buffer refill above safe — the
        # chunk's transfer has landed before the next overwrite.
        # device_get of a dependent scalar is the only reliable sync on
        # this tunnel (block_until_ready resolves at enqueue); ~34 ms,
        # noise next to a 512 MB transfer.
        float(jax.device_get(bv[0, 0]))
    return bv, br


scan_topk = jax.jit(
    scan_topk_t,
    static_argnames=(
        "k",
        "metric",
        "n_valid",
        "chunk_rows",
        "approx",
        "recall_target",
    ),
)
