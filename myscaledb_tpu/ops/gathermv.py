"""Fused neighbor-block gather + traversal matvec (Pallas TPU).

The HNSW frontier expansion scores each query's BEAM expanded nodes'
neighbor-code blocks (`nbdata` u8[N, m, Dt], node-block layout —
index/hnsw.py). The XLA formulation (`jnp.take` then einsum) MATERIALIZES
the gathered [Q, BEAM, m, Dt] copy in HBM: at 960-d / BEAM=8 / m=32 that
is ~134 MB written + re-read per frontier iteration, and the probe shows
it dominates the traversal (per-iter 1.41 ms of which the actual gather
scatter-ness is <10%).

This kernel streams each block HBM->VMEM exactly once via scalar-prefetch
index maps (the block row ids are known before the step runs, so the DMA
pipeline buffers ahead) and dots it against the query in VMEM — the
gathered copy never exists. Each grid step handles QSUB=8 queries
(8 x BEAM block DMAs) so every VMEM slice is static and sublane-aligned
(Mosaic rejects dynamically-indexed sublane loads).

Reference parity note: this replaces hnswlib's per-node
`_mm_prefetch(get_data_by_internal_id(...))` pattern
(contrib/hnswlib/hnswalg.h) — same idea, TPU execution model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas import use_interpret

LANE = 128
SUB_U8 = 32  # int8/u8 min sublane
QSUB = 8  # queries per grid step (f32 sublane alignment)


def supports(beam: int, m: int, dt: int, q: int = QSUB) -> bool:
    """Shape gate: u8 tile alignment for the [m, Dt] blocks, a
    lane-aligned [QSUB, BEAM*m] output tile, and a bounded per-step
    DMA set (QSUB*BEAM block buffers, double-buffered, in VMEM)."""
    vmem = 2 * (QSUB * beam * m * dt + QSUB * dt * 2 + QSUB * beam * m * 4)
    return (
        m % SUB_U8 == 0
        and dt % LANE == 0
        and (beam * m) % LANE == 0
        and vmem <= 12 << 20
    )


def _kernel(beam, rows_ref, q_ref, *refs):
    out_ref = refs[-1]
    nb_refs = refs[:-1]  # QSUB*beam refs, ordered (query-in-step, b)
    outs = []
    for i in range(QSUB):
        qv = q_ref[i : i + 1, :]  # [1, Dt] bf16 (static slice)
        row = []
        for b in range(beam):
            blk = nb_refs[i * beam + b][0]  # [m, Dt] u8
            # Mosaic has no direct u8->bf16 cast; widen through i32/f32
            blk = blk.astype(jnp.int32).astype(jnp.float32)
            row.append(
                jax.lax.dot_general(
                    qv,
                    blk.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [1, m]
            )
        outs.append(jnp.concatenate(row, axis=1))  # [1, beam*m]
    out_ref[:] = jnp.concatenate(outs, axis=0)  # [QSUB, beam*m]


def gather_block_scores(
    qs: jax.Array,  # f32/bf16[Q, Dt] — query pre-scaled by the sq8 scale
    rows: jax.Array,  # int32[Q, BEAM] — block rows, CLAMPED to [0, N)
    nbdata: jax.Array,  # u8[N, m, Dt] — node-block neighbor codes
) -> jax.Array:
    """f32[Q, BEAM*m] raw dot scores dot(qs[q], nbdata[rows[q, b], j, :]).

    Invalid rows must be clamped by the caller (scores for them are
    computed and masked outside — same contract as the XLA path)."""
    q, beam = rows.shape
    n, m, dt = nbdata.shape
    qpad = -q % QSUB
    if qpad:
        qs = jnp.pad(qs, ((0, qpad), (0, 0)))
        rows = jnp.pad(rows, ((0, qpad), (0, 0)))
    qp = q + qpad
    nb_specs = [
        pl.BlockSpec(
            (1, m, dt),
            functools.partial(
                lambda s, rr, i, b: (rr[s * QSUB + i, b], 0, 0), i=i, b=b
            ),
            memory_space=pltpu.VMEM,
        )
        for i in range(QSUB)
        for b in range(beam)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp // QSUB,),
        in_specs=[
            pl.BlockSpec(
                (QSUB, dt), lambda s, rr: (s, 0), memory_space=pltpu.VMEM
            ),
            *nb_specs,
        ],
        out_specs=pl.BlockSpec(
            (QSUB, beam * m), lambda s, rr: (s, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, beam),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp, beam * m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * beam * m * dt,
            bytes_accessed=qp * beam * m * dt + qp * dt * 2 + qp * beam * m * 4,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(rows, qs.astype(jnp.bfloat16), *([nbdata] * (QSUB * beam)))
    return out[:q] if qpad else out
