"""Tile-max pruned exact scan: Pallas tile-max pass + exact rescore.

The chunked XLA scan (ops/bruteforce.py) materializes score tiles to HBM
and reads them back for top-k — ~3x the payload traffic at batch 100. The
round-1 fused kernel avoided that but paid O(k) VPU extraction passes per
tile. This is the TPU-shaped fix, a two-phase hierarchical prune:

  1. TILE-MAX (Pallas): one pass over the payload computing, per query,
     the max score of every SUB(=128)-row sub-tile — the score matrix is
     reduced 128:1 inside VMEM and never touches HBM. HBM traffic =
     payload read + [Q, N/128] maxes (0.8% of a score matrix).
  2. SELECT + RESCORE (XLA): the top (k+slack) sub-tiles per query are
     gathered and exactly rescored, then cut to k.

Correctness: v_k = the k-th best masked score of a query. Any row with
score > v_k makes its sub-tile's max > v_k, so at most k sub-tiles have
max > v_k and they are exactly the tiles containing rows > v_k. Taking
the top-(k+slack) sub-tiles by max therefore covers the exact top-k (the
slack absorbs boundary ties). The rescore applies the same mask, so the
result equals the exhaustive masked top-k.

Replaces FAISS knn_L2sqr/knn_inner_product (BruteForceSearch.h:62-111)
at speed-of-light HBM traffic: payload + ~20% gather instead of payload
+ 2x score matrix.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..metrics import Metric
from ._pallas import exact_precision, use_interpret

SUB = 128  # rows per sub-tile (one max per query per sub-tile)
OUT_LANES = 128  # output block width (lane-aligned)
# Payload block cap (VMEM double buffering). Measured on v5e via the axon
# tunnel: 4 MiB blocks stream at ~107 GB/s — the chip's PRACTICAL ceiling
# here (a compute-free Pallas stream kernel and plain XLA reductions cap
# at the same ~100-110 GB/s) — while 0.5 MiB blocks drop to ~70 GB/s and
# grids past ~500 steps fall off a cliff (57 ms for the same bytes).
MAX_X_BLOCK_BYTES = 4 << 20
NEG = -3.4e38  # large-negative instead of -inf (NaN-safe diffs)
CHUNK_BUDGET_BYTES = 5 << 20  # live f32 score-chunk cap inside the kernel
TILE_SLACK = 2  # extra sub-tiles beyond k (boundary-tie head-room)
MAX_K = 128  # above this the gather outgrows the saved traffic


def supports(n: int, d: int, q_pad: int, k: int) -> bool:
    """Shape gate: big, aligned segments (the 128k-row-aligned capacity
    rule makes every >=128k-row segment qualify)."""
    return (
        k <= MAX_K
        and d % 128 == 0
        and q_pad % 8 == 0
        and n % (SUB * OUT_LANES) == 0
        and n // SUB > 2 * (k + TILE_SLACK)
    )


def _tile_max_kernel(
    metric, split, n_sub_per_tile, steps_per_block, chunk,
    q_ref, x_ref, aux_ref, mask_ref, out_ref,
):
    j = pl.program_id(1)
    dn = (((1,), (1,)), ((), ()))
    qt = q_ref.shape[1] if split else q_ref.shape[0]
    n_tile = x_ref.shape[0]
    # score matrix computed in `chunk`-row pieces: a full [qt, n_tile] f32
    # buffer (8 MiB at qt=128/n_tile=16384) plus the payload double-buffer
    # blows the 16 MiB scoped-VMEM stack; chunking bounds the live score
    # buffer without shrinking the 4 MiB HBM streaming block
    ms = []
    for c in range(0, n_tile, chunk):
        xs = x_ref[c : c + chunk, :]
        if split:
            s = jax.lax.dot_general(
                q_ref[0], xs, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q_ref[1], xs, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                q_ref[:], xs, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
        if metric == Metric.L2:
            s = 2.0 * s - aux_ref[:, c : c + chunk]
        elif metric == Metric.COSINE:
            s = s * aux_ref[:, c : c + chunk]
        s = jnp.where(mask_ref[:, c : c + chunk] != 0, s, NEG)
        ms.append(jnp.max(s.reshape(qt, chunk // SUB, SUB), axis=2))
    m = ms[0] if len(ms) == 1 else jnp.concatenate(ms, axis=1)
    # Mosaic cannot store a sub-width vector at a dynamic lane offset, so
    # write the FULL out block each step: tile this step's maxes across
    # all lane groups and select only this step's group (read-modify-write
    # keeps the other groups; the block stays in VMEM across its
    # steps_per_block consecutive grid steps).
    mtiled = jnp.tile(m, (1, steps_per_block))  # [qt, OUT_LANES]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (qt, OUT_LANES), 1)
    step = j % steps_per_block
    sel = (lanes // n_sub_per_tile) == step

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.where(sel, mtiled, NEG)

    @pl.when(step != 0)
    def _():
        out_ref[...] = jnp.where(sel, mtiled, out_ref[...])


@functools.partial(jax.jit, static_argnames=("metric", "q_tile", "n_tile"))
def tile_maxes(
    queries: jax.Array,  # f32[Qpad, D]
    base: jax.Array,  # f32|bf16[N, D]
    aux: jax.Array,  # f32[N]
    mask_u8: jax.Array,  # uint8[N]
    *,
    metric: Metric,
    q_tile: int = 128,
    n_tile: int = 16384,
) -> jax.Array:
    """f32[Qpad, N/SUB] per-sub-tile maxes of the masked score matrix."""
    q, d = queries.shape
    n = base.shape[0]
    for t in (min(q_tile, q), 128, 64, 32, 16, 8):
        if t <= q_tile and q % t == 0 and t % 8 == 0:
            q_tile = t
            break
    # bound the payload block (VMEM double-buffering) even at GIST dims
    while n_tile > 256 and n_tile * d * base.dtype.itemsize > MAX_X_BLOCK_BYTES:
        n_tile //= 2
    n_sub_per_tile = n_tile // SUB
    steps_per_block = OUT_LANES // n_sub_per_tile
    assert n % (n_tile * steps_per_block) == 0, (n, n_tile, steps_per_block)
    # live score-chunk budget: scoped VMEM is 16 MiB and the payload
    # double-buffer takes 2 x MAX_X_BLOCK_BYTES = 8 MiB of it; the f32
    # score chunk must fit the rest (measured: q_tile=128 x n_tile=16384
    # = 8 MiB overflowed the stack by 420 KiB at the server's batch-256
    # shape, q_tile=104 squeaked by)
    chunk = n_tile
    while chunk > SUB and q_tile * chunk * 4 > CHUNK_BUDGET_BYTES:
        chunk //= 2

    split = base.dtype == jnp.bfloat16
    if split:
        from .distance import split_query_bf16

        q_in = split_query_bf16(queries)
        q_spec = pl.BlockSpec(
            (2, q_tile, d), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        )
    else:
        q_in = queries.astype(jnp.float32)
        q_spec = pl.BlockSpec(
            (q_tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )
    kernel = functools.partial(
        _tile_max_kernel, metric, split, n_sub_per_tile, steps_per_block, chunk
    )
    grid = (q // q_tile, n // n_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            q_spec,
            pl.BlockSpec((n_tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_tile, OUT_LANES),
            lambda i, j, spb=steps_per_block: (i, j // spb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q, n // SUB), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(4 if split else 2) * q * n * d,
            bytes_accessed=n * d * base.dtype.itemsize
            + n * 5
            + q * (n // SUB) * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(q_in, base, aux.reshape(1, n).astype(jnp.float32), mask_u8.reshape(1, n))


def tile_topk_scan(
    queries: jax.Array,  # f32[Qpad, D] (normalized for Cosine)
    base: jax.Array,  # [N, D]
    aux: jax.Array,  # f32[N]
    mask_u8: jax.Array,  # uint8[N] (1 = candidate; folds validity+filter)
    *,
    k: int,
    metric: Metric,
) -> Tuple[jax.Array, jax.Array]:
    """Exact masked top-k via tile-max prune. Traceable (jit-safe)."""
    q, d = queries.shape
    n = base.shape[0]
    n_sub = n // SUB
    maxes = tile_maxes(queries, base, aux, mask_u8, metric=metric)
    ksel = min(k + TILE_SLACK, n_sub)
    _, sub = jax.lax.top_k(maxes, ksel)  # [Q, S] sub-tile ids
    bsub = base.reshape(n_sub, SUB, d)
    # gather stays in the storage dtype — a f32 materialization of the
    # gathered tiles would double the rescore phase's HBM traffic; the
    # einsum upcasts inside the MXU pass
    g = jnp.take(bsub, sub, axis=0)  # [Q, S, SUB, D]
    qf = queries.astype(jnp.float32)
    s = jnp.einsum(
        "qd,qsrd->qsr", qf, g.astype(jnp.float32),
        precision=exact_precision(),
        preferred_element_type=jnp.float32,
    ).reshape(q, -1)
    asub = jnp.take(aux.reshape(n_sub, SUB), sub, axis=0).reshape(q, -1)
    if metric == Metric.L2:
        s = 2.0 * s - asub
    elif metric == Metric.COSINE:
        s = s * asub
    ok = jnp.take(mask_u8.reshape(n_sub, SUB), sub, axis=0).reshape(q, -1) != 0
    s = jnp.where(ok, s, -jnp.inf)
    rows = (
        sub[:, :, None] * SUB
        + jax.lax.broadcasted_iota(jnp.int32, (q, ksel, SUB), 2)
    ).reshape(q, -1)
    kk = min(k, s.shape[-1])
    v, p = jax.lax.top_k(s, kk)
    r = jnp.take_along_axis(rows, p, axis=-1)
    r = jnp.where(jnp.isfinite(v), r, -1)
    if kk < k:
        v = jnp.pad(v, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        r = jnp.pad(r, ((0, 0), (0, k - kk)), constant_values=-1)
    return v, r
