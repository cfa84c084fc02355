"""Fused Pallas kernel: score tile + in-register top-k, no score matrix.

The chunked XLA scan (ops/bruteforce.py) materializes each [Q, chunk]
score tile to HBM and reads it back for top-k — 4x the payload traffic at
Q≈100. This kernel keeps the running top-k in VMEM scratch across grid
steps: per (query-tile, row-tile) step it computes the MXU score tile,
extracts the tile's top-k by k iterative max+mask passes on the VPU, and
merges into the carry. HBM traffic = payload + queries + [Q, k] outputs.

Worth it only for small k (extraction is O(k) VPU passes): the wrapper in
bruteforce.scan_topk_t uses it for k <= FUSED_MAX_K on aligned shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..metrics import Metric
from ._pallas import use_interpret

# Off by default: at batch>=100 the VPU top-k extraction costs more than
# the chunked path's score-matrix round trip (measured on v5e). Kept for
# small-batch/latency tuning in later rounds.
ENABLED = False
FUSED_MAX_K = 32
ROW_TILE = 1024
Q_TILE_MAX = 128
NEG = -3.4e38  # large-negative instead of -inf (NaN-safe diffs)
BIG_IDX = 2**31 - 1


def _extract_topk(s, col, payload, k):
    """Top-k of s[Qt, T] by k max+mask passes, carrying `payload` (e.g.
    global row ids) for each selected position. Gather-free (Mosaic has no
    general in-kernel gather): the selected position's payload is read with
    a masked min over the row. Returns (vals [Qt, k], payload [Qt, k])."""
    vs, ps = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1)  # [Qt]
        pos = jnp.min(jnp.where(s >= m[:, None], col, BIG_IDX), axis=1)
        sel = col == pos[:, None]
        pay = jnp.min(jnp.where(sel, payload, BIG_IDX), axis=1)
        vs.append(m)
        ps.append(pay)
        s = jnp.where(sel, NEG, s)
    return jnp.stack(vs, axis=1), jnp.stack(ps, axis=1)


def _kernel(k, metric, split, q_ref, x_ref, aux_ref, mask_ref,
            vals_ref, idx_ref, bv, bi):
    nj = pl.program_id(1)
    n_steps = pl.num_programs(1)

    @pl.when(nj == 0)
    def _():
        bv[...] = jnp.full_like(bv, NEG)
        bi[...] = jnp.full_like(bi, -1)

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
        s = 2.0 * s - aux_ref[:]
    elif metric == Metric.COSINE:
        s = s * aux_ref[:]
    s = jnp.where(mask_ref[:] != 0, s, NEG)

    qt, t = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, t), 1)
    tv, ti = _extract_topk(s, col, col + nj * t, k)

    # merge carry [Qt, k] with tile top-k [Qt, k]
    mv = jnp.concatenate([bv[...], tv], axis=1)
    mi = jnp.concatenate([bi[...], ti], axis=1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, mv.shape, 1)
    nv, ni = _extract_topk(mv, col2, mi, k)
    bv[...] = nv
    bi[...] = jnp.where(nv > NEG, ni, -1)

    @pl.when(nj == n_steps - 1)
    def _():
        vals_ref[...] = bv[...]
        idx_ref[...] = bi[...]


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def fused_scan_topk(
    queries: jax.Array,  # f32[Qpad, D] (Qpad % 8 == 0, <= Q_TILE_MAX)
    base: jax.Array,  # [N, D] f32|bf16, N % ROW_TILE == 0
    aux: jax.Array,  # f32[N]
    mask_u8: jax.Array,  # uint8[N] (1 = candidate)
    *,
    k: int,
    metric: Metric,
):
    qn, d = queries.shape
    n = base.shape[0]
    assert n % ROW_TILE == 0 and qn % 8 == 0 and qn <= Q_TILE_MAX
    split = base.dtype == jnp.bfloat16
    if split:
        from .distance import split_query_bf16

        q_in = split_query_bf16(queries)
        q_spec = pl.BlockSpec(
            (2, qn, d), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        )
    else:
        q_in = queries.astype(jnp.float32)
        q_spec = pl.BlockSpec((qn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, k, metric, split)
    grid = (qn // qn, n // ROW_TILE)  # (1, steps) — qn fits one tile
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            q_spec,
            pl.BlockSpec((ROW_TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn, k), jnp.float32),
            pltpu.VMEM((qn, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(4 if split else 2) * qn * n * d + 2 * k * qn * n,
            bytes_accessed=n * d * base.dtype.itemsize + n * 5 + qn * d * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(q_in, base, aux.reshape(1, n).astype(jnp.float32), mask_u8.reshape(1, n))
    vals = jnp.where(idx >= 0, vals, -jnp.inf)
    return vals, idx
