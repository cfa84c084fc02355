"""Top-k selection and k-way merge primitives.

The reference merges per-part top-k lists with a heap
(getTotalTopSearchResultImpl, src/VectorIndex/Storages/
MergeTreeBaseSearchManager.cpp:207) and runs FAISS heap-select inside the
scan (searchWrapper, MergeTreeVSManager.cpp:1538-1679). On TPU the
equivalents are:

  * `jax.lax.approx_max_k` — the TPU's hardware-accelerated PartialReduce
    top-k, designed for exactly this MIPS/ANN use (used when
    QuerySettings.use_approx_topk).
  * exact `jax.lax.top_k` for the final merge and for exact-scan configs.

All selection happens on max-is-better scores (metrics.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def topk_scores(
    scores: jax.Array,
    k: int,
    *,
    approx: bool = False,
    recall_target: float = 0.99,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k along the last axis. Returns (values f32[..., k], idx int32[..., k])."""
    n = scores.shape[-1]
    kk = min(k, n)
    if approx and kk < n:
        vals, idx = jax.lax.approx_max_k(scores, kk, recall_target=recall_target)
    else:
        vals, idx = jax.lax.top_k(scores, kk)
    if kk < k:
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, k - kk)]
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        idx = jnp.pad(idx, pad, constant_values=-1)
    return vals, idx.astype(jnp.int32)


WIDE_SUB = 128  # rows per reduction sub-tile (wide_exact_topk)
WIDE_SLACK = 2  # extra sub-tiles beyond k (tie head-room)


def wide_exact_topk(
    scores: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """EXACT top-k over very wide score rows via a two-level reduce.

    `lax.top_k` sorts the whole row; at 100k+ lanes that dominates an
    exact scan (measured ~30 ms per 256-query batch at 960-d on v5e,
    ~10x the matmul itself). Instead: per-128-lane sub-tile maxes (one
    cheap reduce), top (k+slack) sub-tiles per query, gather ONLY those
    sub-tiles' score slices (k*128*4 bytes/query instead of the whole
    row) and run the small exact top-k there. Exactness: the k best
    rows occupy <= k distinct sub-tiles, and any sub-tile holding one
    has max >= the k-th best score, so at most k sub-tiles can rank
    above it — top (k+slack) sub-tiles by max always contain the true
    top-k (the same pruning bound ops/tilescan.py relies on; slack
    covers max ties at the boundary).

    Requires width % 128 == 0 (segment capacities are 1024-aligned).
    Falls back to the flat top-k when the shape makes pruning pointless.
    """
    q, n = scores.shape
    nsub = n // WIDE_SUB
    ksel = min(k + WIDE_SLACK, nsub)
    if n % WIDE_SUB or ksel * WIDE_SUB * 2 >= n:
        return topk_scores(scores, k)
    sm = scores.reshape(q, nsub, WIDE_SUB)
    _, sub = jax.lax.top_k(jnp.max(sm, axis=2), ksel)  # [Q, ksel]
    g = jnp.take_along_axis(sm, sub[:, :, None], axis=1)  # [Q, ksel, SUB]
    rows = sub[:, :, None] * WIDE_SUB + jax.lax.broadcasted_iota(
        jnp.int32, (q, ksel, WIDE_SUB), 2
    )
    v, p = jax.lax.top_k(g.reshape(q, -1), min(k, ksel * WIDE_SUB))
    r = jnp.take_along_axis(rows.reshape(q, -1), p, axis=-1)
    if v.shape[-1] < k:
        v = jnp.pad(v, ((0, 0), (0, k - v.shape[-1])), constant_values=NEG_INF)
        r = jnp.pad(r, ((0, 0), (0, k - r.shape[-1])), constant_values=-1)
    return v, jnp.where(jnp.isfinite(v), r, -1).astype(jnp.int32)


def merge_topk(
    vals_a: jax.Array,
    idx_a: jax.Array,
    vals_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge two top-k lists (same leading dims) into one, exactly."""
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    mvals, pos = jax.lax.top_k(vals, min(k, vals.shape[-1]))
    midx = jnp.take_along_axis(idx, pos, axis=-1)
    if mvals.shape[-1] < k:
        pad = [(0, 0)] * (vals.ndim - 1) + [(0, k - mvals.shape[-1])]
        mvals = jnp.pad(mvals, pad, constant_values=NEG_INF)
        midx = jnp.pad(midx, pad, constant_values=-1)
    return mvals, midx


def dedup_rows(values: jax.Array, rows: jax.Array, extra=None):
    """Kill duplicate row ids along the last axis, keeping one copy per
    row (the `extra`-flagged copy when given — e.g. beam-search 'expanded'
    flags). Padding (-1) sorts last. Row ids must be < 2^30."""
    pad_key = jnp.int32(2**31 - 1)
    if extra is not None:
        key = jnp.where(
            rows >= 0,
            rows.astype(jnp.int32) * 2 + (1 - extra.astype(jnp.int32)),
            pad_key,
        )
    else:
        key = jnp.where(rows >= 0, rows.astype(jnp.int32), pad_key)
    order = jnp.argsort(key, axis=-1, stable=True)
    v_s = jnp.take_along_axis(values, order, axis=-1)
    r_s = jnp.take_along_axis(rows, order, axis=-1)
    dup = jnp.concatenate(
        [
            jnp.zeros_like(r_s[..., :1], bool),
            jnp.logical_and(r_s[..., 1:] == r_s[..., :-1], r_s[..., 1:] >= 0),
        ],
        axis=-1,
    )
    v_s = jnp.where(dup, NEG_INF, v_s)
    r_s = jnp.where(dup, -1, r_s)
    if extra is not None:
        e_s = jnp.take_along_axis(extra, order, axis=-1)
        e_s = jnp.where(dup, False, e_s)
        return v_s, r_s, e_s
    return v_s, r_s, None


@functools.partial(jax.jit, static_argnames=("k",))
def merge_topk_lists(vals: jax.Array, idx: jax.Array, k: int):
    """Collapse a stacked [..., L, k'] set of top-k lists to one [..., k].

    Used for the global merge across segments / chips / chunks (the
    k-way-merge analogue of MergeTreeBaseSearchManager.cpp:207).
    """
    flat_v = vals.reshape(*vals.shape[:-2], -1)
    flat_i = idx.reshape(*idx.shape[:-2], -1)
    mvals, pos = jax.lax.top_k(flat_v, min(k, flat_v.shape[-1]))
    midx = jnp.take_along_axis(flat_i, pos, axis=-1)
    if mvals.shape[-1] < k:
        pad = [(0, 0)] * (mvals.ndim - 1) + [(0, k - mvals.shape[-1])]
        mvals = jnp.pad(mvals, pad, constant_values=NEG_INF)
        midx = jnp.pad(midx, pad, constant_values=-1)
    return mvals, midx
