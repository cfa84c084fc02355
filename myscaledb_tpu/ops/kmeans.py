"""K-means (Lloyd's) for the IVF coarse quantizer — TPU-shaped.

Replaces the k-means inside the reference's search-index library (consumed
via index->build, SURVEY.md §2.3). Design:

  * assignment = argmax over an MXU score matrix (2 x·cᵀ - |c|²), chunked
    over rows so no [N, C] matrix is ever materialized;
  * centroid update = segment_sum scatter-add;
  * training runs on a bounded sample (≤ sample_per_centroid rows per
    centroid), like FAISS's max_points_per_centroid;
  * the iteration body is a pure function of (data_shard, centroids) so the
    multi-chip variant is the same body inside shard_map with a psum over
    the per-shard (sums, counts) — see parallel/distributed.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def assign_chunked(
    data: jax.Array, centroids: jax.Array, chunk: int = 65_536
) -> jax.Array:
    """argmin_c ||x - c||^2 for each row, computed in row chunks.

    data: [N, D] (any float dtype), centroids: f32[C, D] -> int32[N].
    """
    n = data.shape[0]
    csq = jnp.sum(centroids * centroids, axis=1)  # [C]

    def one(block):
        s = (
            2.0
            * jnp.dot(
                block.astype(jnp.float32),
                centroids.T,
                preferred_element_type=jnp.float32,
            )
            - csq[None, :]
        )
        return jnp.argmax(s, axis=1).astype(jnp.int32)

    if n <= chunk:
        return one(data)
    # pad to a multiple of chunk for an even lax.map
    nc = -(-n // chunk)
    pad = nc * chunk - n
    dpad = jnp.pad(data, ((0, pad), (0, 0)))
    out = jax.lax.map(one, dpad.reshape(nc, chunk, data.shape[1]))
    return out.reshape(-1)[:n]


def lloyd_stats(
    data: jax.Array, centroids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One Lloyd's E+M statistic pass: per-centroid (sums f32[C, D],
    counts f32[C]) for a data shard. psum these across chips for the
    sharded variant."""
    c = centroids.shape[0]
    a = assign_chunked(data, centroids)
    sums = jax.ops.segment_sum(data.astype(jnp.float32), a, num_segments=c)
    counts = jax.ops.segment_sum(
        jnp.ones((data.shape[0],), jnp.float32), a, num_segments=c
    )
    return sums, counts


def lloyd_update(
    centroids: jax.Array, sums: jax.Array, counts: jax.Array
) -> jax.Array:
    """M step: mean of assigned rows. Empty clusters are reseeded by
    splitting the largest clusters (perturbed copies of their centroids,
    FAISS split_clusters-style) — this keeps the cluster-size histogram
    tight, which directly bounds the IVF bucket padding."""
    c, d = centroids.shape
    safe = jnp.maximum(counts, 1.0)[:, None]
    new = jnp.where(counts[:, None] > 0, sums / safe, centroids)
    empty = counts <= 0
    # rank of each empty slot among empties -> round-robin over the
    # largest clusters
    order = jnp.argsort(-counts)  # big clusters first
    n_targets = max(1, min(32, c))
    empty_rank = jnp.cumsum(empty.astype(jnp.int32)) - 1
    target = order[jnp.clip(empty_rank % n_targets, 0, c - 1)]
    donor = new[target]  # [C, D] (only rows where empty matter)
    # deterministic small perturbation, different per slot
    slot = jnp.arange(c, dtype=jnp.float32)[:, None]
    jitter = 1e-3 * jnp.sin(slot * (jnp.arange(d, dtype=jnp.float32)[None, :] + 1.0))
    scale = jnp.maximum(jnp.abs(donor), 1e-3)
    reseed = donor + jitter * scale
    return jnp.where(empty[:, None], reseed, new)


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iters"))
def kmeans_fit(
    data: jax.Array,
    *,
    n_clusters: int,
    n_iters: int = 10,
    seed: int = 0,
) -> jax.Array:
    """Single-device k-means. data: [N, D] -> centroids f32[C, D].

    Init: random distinct-ish rows (uniform without replacement).
    """
    n, d = data.shape
    key = jax.random.PRNGKey(seed)
    perm = jax.random.permutation(key, n)[:n_clusters]
    cents = data[perm].astype(jnp.float32)

    def body(_, c):
        sums, counts = lloyd_stats(data, c)
        return lloyd_update(c, sums, counts)

    return jax.lax.fori_loop(0, n_iters, body, cents)


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "n_extra", "n_iters", "refine_iters")
)
def kmeans_fit_balanced(
    data: jax.Array,
    *,
    n_clusters: int,
    n_extra: int,
    n_iters: int = 10,
    refine_iters: int = 4,
    seed: int = 0,
) -> jax.Array:
    """Balanced k-means in ONE compiled program (fixed output shape
    [n_clusters + n_extra, D]).

    Plain Lloyd's, then `n_extra` additional centroids are seeded on the
    heaviest clusters *proportionally to their size* (systematic sampling
    over the size histogram — a cluster holding 3x the average mass gets
    ~3x the split copies), then a short refinement lets the copies drift
    apart and split their donors. This replaces the round-1 recursive
    re-clustering (which recompiled a fresh k-means per round, dominating
    build time over the device tunnel) with zero data-dependent shapes:
    every IVF build with the same (sample, C) signature reuses one
    executable. Centroids that end up owning no rows are fine — the IVF
    probe masks zero-size clusters out.
    """
    n, d = data.shape
    key = jax.random.PRNGKey(seed)
    perm = jax.random.permutation(key, n)[:n_clusters]
    cents = data[perm].astype(jnp.float32)

    def body(_, c):
        sums, counts = lloyd_stats(data, c)
        return lloyd_update(c, sums, counts)

    cents = jax.lax.fori_loop(0, n_iters, body, cents)
    if n_extra <= 0:
        return cents

    _, counts = lloyd_stats(data, cents)
    order = jnp.argsort(-counts)
    cum = jnp.cumsum(counts[order])
    total = jnp.maximum(cum[-1], 1.0)
    pos = (jnp.arange(n_extra, dtype=jnp.float32) + 0.5) * (total / n_extra)
    idx = jnp.searchsorted(cum, pos)
    target = order[jnp.clip(idx, 0, n_clusters - 1)]
    donors = cents[target]  # [E, D]
    slot = jnp.arange(n_extra, dtype=jnp.float32)[:, None]
    jitter = 1e-3 * jnp.sin(slot * (jnp.arange(d, dtype=jnp.float32)[None, :] + 1.0))
    extra = donors + jitter * jnp.maximum(jnp.abs(donors), 1e-3)
    cents = jnp.concatenate([cents, extra], axis=0)
    return jax.lax.fori_loop(0, refine_iters, body, cents)


def assign_chunked_host(
    data_np, centroids: jax.Array, chunk: int = 262_144
) -> np.ndarray:
    """assign_chunked over a HOST-resident corpus: upload one chunk at a
    time (beyond-HBM builds never hold the full f32 rep on device)."""
    n = data_np.shape[0]
    out = np.empty(n, np.int32)
    for i in range(0, n, chunk):
        blk = jnp.asarray(np.ascontiguousarray(data_np[i : i + chunk]))
        out[i : i + chunk] = np.asarray(assign_chunked(blk, centroids))
    return out


def training_sample_host(
    data_np,
    n_valid: int,
    n_clusters: int,
    *,
    sample_per_centroid: int = 128,
    seed: int = 0,
    max_rows=None,
):
    """training_sample for a HOST corpus: sample rows in numpy, upload only
    the sample."""
    target = min(n_valid, max(n_clusters * sample_per_centroid, n_clusters))
    if max_rows is not None:
        target = max(min(target, max_rows), min(n_valid, n_clusters))
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_valid, target)
    return jnp.asarray(data_np[idx].astype(np.float32))


def training_sample(
    data: jax.Array,
    n_valid: int,
    n_clusters: int,
    *,
    sample_per_centroid: int = 128,
    seed: int = 0,
    max_rows: Optional[int] = None,
) -> jax.Array:
    """Bounded training subset (valid rows only). Host-free: index select on
    device. Matches the reference's bounded train blocks
    (max_build_index_train_block_size, Settings.h:117); `max_rows` is the
    byte-budget bound derived from max_build_index_train_block_bytes."""
    target = min(n_valid, max(n_clusters * sample_per_centroid, n_clusters))
    if max_rows is not None:
        target = max(min(target, max_rows), min(n_valid, n_clusters))
    key = jax.random.PRNGKey(seed)
    idx = jax.random.randint(key, (target,), 0, n_valid)
    return jnp.take(data, idx, axis=0).astype(jnp.float32)
