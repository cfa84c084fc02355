"""Binary-vector kernels: Hamming and Jaccard over packed bits.

Replaces the FAISS binary brute force the reference calls directly
(hammings_knn_mc / jaccard_knn, src/VectorIndex/Common/BruteForceSearch.h:
77-105). Vectors are FixedString(D/8)-style packed uint8 rows.

TPU mapping: XOR/AND on uint8 + lax.population_count on the VPU, chunked
over rows; scores use the max-is-better convention of metrics.py:

  Hamming:  score = -popcount(q ^ x)
  Jaccard:  score = |q & x| / |q | x|   (= 1 - jaccard distance)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..metrics import Metric
from .topk import NEG_INF, merge_topk_lists, topk_scores

DEFAULT_CHUNK_ROWS = 64 * 1024


def binary_chunk_scores(
    q: jax.Array, x: jax.Array, metric: Metric
) -> jax.Array:
    """scores f32[Q, Nc] for packed uint8 q[Q, B], x[Nc, B]."""
    qe = q[:, None, :]
    xe = x[None, :, :]
    if metric == Metric.HAMMING:
        d = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(qe, xe)).astype(jnp.int32),
            axis=-1,
        )
        return -d.astype(jnp.float32)
    if metric == Metric.JACCARD:
        inter = jnp.sum(
            jax.lax.population_count(jnp.bitwise_and(qe, xe)).astype(jnp.int32),
            axis=-1,
        ).astype(jnp.float32)
        union = jnp.sum(
            jax.lax.population_count(jnp.bitwise_or(qe, xe)).astype(jnp.int32),
            axis=-1,
        ).astype(jnp.float32)
        return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    raise ValueError(f"not a binary metric: {metric}")


def binary_scan_topk(
    queries: jax.Array,  # uint8[Q, B]
    base: jax.Array,  # uint8[N, B]
    *,
    k: int,
    metric: Metric,
    n_valid: int,
    mask: Optional[jax.Array] = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    approx: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Masked exact binary top-k (traceable)."""
    nq = queries.shape[0]
    n, b = base.shape
    valid = jnp.arange(n, dtype=jnp.int32) < n_valid
    if mask is not None:
        valid = jnp.logical_and(valid, mask)

    chunk = n
    if n > chunk_rows and n % 1024 == 0:
        units = n // 1024
        best = 1
        for c in range(1, max(1, chunk_rows // 1024) + 1):
            if units % c == 0:
                best = c
        chunk = best * 1024

    if chunk >= n:
        s = binary_chunk_scores(queries, base, metric)
        s = jnp.where(valid[None, :], s, NEG_INF)
        vals, idx = topk_scores(s, k, approx=approx)
    else:
        nc = n // chunk
        blocks = base.reshape(nc, chunk, b)
        validb = valid.reshape(nc, chunk)
        offs = jnp.arange(nc, dtype=jnp.int32) * chunk

        def body(args):
            block, v, off = args
            s = binary_chunk_scores(queries, block, metric)
            s = jnp.where(v[None, :], s, NEG_INF)
            cv, ci = topk_scores(s, k, approx=approx)
            return cv, jnp.where(ci >= 0, ci + off, -1)

        cvals, cidx = jax.lax.map(body, (blocks, validb, offs))
        vals, idx = merge_topk_lists(
            jnp.transpose(cvals, (1, 0, 2)), jnp.transpose(cidx, (1, 0, 2)), k
        )
    idx = jnp.where(jnp.isfinite(vals), idx, -1)
    return vals[:nq], idx[:nq]


def unpack_bits_f32(packed: jax.Array, dim: int) -> jax.Array:
    """uint8[..., B] -> f32[..., dim] of {0, 1} (for k-means clustering of
    binary corpora)."""
    bits = jnp.unpackbits(packed, axis=-1, count=dim)
    return bits.astype(jnp.float32)
