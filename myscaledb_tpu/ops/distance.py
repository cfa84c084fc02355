"""Tiled distance/similarity score kernels (Pallas TPU) + jnp reference.

Replaces the reference's FAISS brute-force kernels
(src/VectorIndex/Common/BruteForceSearch.h:62-111 — knn_inner_product /
knn_L2sqr) with an MXU-tiled score matrix:

    scores[Q, N] = f(queries[Q, D] · base[N, D]^T)

using the max-is-better score convention of `myscaledb_tpu.metrics`:

    IP:     s = q·x
    L2:     s = 2 q·x - |x|^2        (-|q-x|^2 up to the per-query constant
                                      |q|^2, which cancels in top-k; the
                                      constant is reapplied when reporting)
    Cosine: s = (q/|q|)·x * 1/|x|    (queries pre-normalized by the caller)

All shapes must be padded: Q to a multiple of 8, N to a multiple of the N
tile (segments are padded at creation), D to a multiple of 128. Padded base
rows are handled by the caller via the validity mask (see
ops/bruteforce.py); padded D columns must be zero-filled (zero columns do
not change any metric).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..metrics import Metric
from ._pallas import cdiv, exact_precision, round_up, use_interpret

# Default tile sizes. N tile of 512 keeps the base block (512 x 1024 bf16 =
# 1 MiB) comfortably in VMEM even for GIST-sized dims.
DEFAULT_Q_TILE = 128
DEFAULT_N_TILE = 512


def split_query_bf16(q: jax.Array) -> jax.Array:
    """Split f32 queries into bf16 (hi, lo) halves stacked on axis 0.

    q ≈ hi + lo with both bf16 gives ~16 mantissa bits for the query side
    of the score matmul while the payload side stays bf16 — two MXU passes,
    zero extra HBM traffic, removing the bf16 query-quantization noise that
    would otherwise reorder near-tied neighbors (|Δq|·|x| can exceed the
    gap between rank-10 and rank-11 at SIFT scale)."""
    q = q.astype(jnp.float32)
    hi = q.astype(jnp.bfloat16)
    lo = (q - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, lo])


def _score_kernel(metric: Metric, split: bool, q_ref, x_ref, aux_ref, out_ref):
    """One (Q_TILE, N_TILE) tile of the score matrix.

    q_ref is [2, Q_TILE, D] (bf16 hi/lo halves) when split, else [Q_TILE, D].
    aux_ref is [1, N_TILE]: |x|^2 for L2, 1/|x| for Cosine, unused for IP.
    """
    dn = (((1,), (1,)), ((), ()))
    if split:
        s = jax.lax.dot_general(
            q_ref[0], x_ref[:], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            q_ref[1], x_ref[:], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    else:
        s = jax.lax.dot_general(
            q_ref[:], x_ref[:], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    if metric == Metric.L2:
        out_ref[:] = 2.0 * s - aux_ref[:]
    elif metric == Metric.COSINE:
        out_ref[:] = s * aux_ref[:]
    else:  # IP
        out_ref[:] = s


@functools.partial(
    jax.jit, static_argnames=("metric", "q_tile", "n_tile", "precision")
)
def scores(
    queries: jax.Array,
    base: jax.Array,
    aux: Optional[jax.Array] = None,
    *,
    metric: Metric = Metric.L2,
    q_tile: int = DEFAULT_Q_TILE,
    n_tile: int = DEFAULT_N_TILE,
    precision: str = "default",
) -> jax.Array:
    """Score matrix [Q, N], larger = better. Pallas path.

    queries: f32[Q, D] (pre-normalized for Cosine)
    base:    f32|bf16[N, D]
    aux:     f32[N] metric auxiliary (|x|^2 for L2, 1/|x| for Cosine)
    """
    q, n, d = queries.shape[0], base.shape[0], base.shape[1]
    if queries.shape[1] != d:
        raise ValueError(f"dim mismatch: queries D={queries.shape[1]} base D={d}")
    # largest sublane-aligned tile that divides Q
    for t in (min(q_tile, q), 128, 64, 32, 16, 8):
        if t <= q_tile and q % t == 0 and t % 8 == 0:
            q_tile = t
            break
    if q % q_tile or n % n_tile or d % 128:
        raise ValueError(
            f"padded shapes required: Q={q} % {q_tile}, N={n} % {n_tile}, D={d} % 128"
        )
    if aux is None:
        if metric != Metric.IP:
            raise ValueError(f"aux vector required for metric {metric}")
        aux = jnp.zeros((n,), jnp.float32)
    aux2d = aux.reshape(1, n).astype(jnp.float32)

    # bf16 payload: hi/lo query split keeps the matmul on the fast bf16 MXU
    # path without query-quantization noise. f32 payload: plain f32 matmul.
    split = base.dtype == jnp.bfloat16
    if split:
        q_in = split_query_bf16(queries)
        q_spec = pl.BlockSpec(
            (2, q_tile, d), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        )
    else:
        q_in = queries.astype(jnp.float32)
        q_spec = pl.BlockSpec(
            (q_tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )

    grid = (q // q_tile, n // n_tile)
    kernel = functools.partial(_score_kernel, metric, split)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            q_spec,
            pl.BlockSpec((n_tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(4 if split else 2) * q * n * d,
            bytes_accessed=q * d * base.dtype.itemsize
            + n * d * base.dtype.itemsize
            + q * n * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(q_in, base, aux2d)


def scores_ref(
    queries: jax.Array,
    base: jax.Array,
    aux: Optional[jax.Array] = None,
    *,
    metric: Metric = Metric.L2,
) -> jax.Array:
    """Pure-XLA reference implementation (correctness oracle; also the
    fallback for unpadded shapes)."""
    s = jnp.dot(
        queries.astype(jnp.float32),
        base.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=exact_precision(),
    )
    if metric == Metric.L2:
        if aux is None:
            aux = jnp.sum(base.astype(jnp.float32) ** 2, axis=1)
        return 2.0 * s - aux[None, :]
    if metric == Metric.COSINE:
        if aux is None:
            nrm = jnp.linalg.norm(base.astype(jnp.float32), axis=1)
            aux = jnp.where(nrm > 0, 1.0 / nrm, 0.0)
        return s * aux[None, :]
    return s


def base_aux(base: jax.Array, metric: Metric) -> Optional[jax.Array]:
    """Precompute the per-row auxiliary vector for a base matrix."""
    if metric == Metric.L2:
        return jnp.sum(base.astype(jnp.float32) ** 2, axis=1)
    if metric == Metric.COSINE:
        nrm = jnp.linalg.norm(base.astype(jnp.float32), axis=1)
        return jnp.where(nrm > 0.0, 1.0 / nrm, 0.0)
    return None


def normalize_queries(queries: jax.Array, metric: Metric) -> jax.Array:
    """Pre-normalize queries for Cosine (VIWithDataPart.h:349-381 does
    normalize-then-IP in the reference)."""
    if metric != Metric.COSINE:
        return queries
    nrm = jnp.linalg.norm(queries.astype(jnp.float32), axis=-1, keepdims=True)
    return queries / jnp.where(nrm > 0.0, nrm, 1.0)
