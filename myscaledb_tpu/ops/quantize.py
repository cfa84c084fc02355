"""Vector quantization codecs for compressed indexes (PQ / SQ8).

The reference's IVFPQ/IVFSQ/HNSWPQ/HNSWSQ compress stored vectors to cut
memory and scan bandwidth (SURVEY.md §2.3: params M (subquantizers, dim %
M == 0), bit_size). TPU re-design:

  * SQ8: per-dimension affine int8. Scoring decodes to bf16 *inside* the
    scan (the codebook math fuses into the matmul) — HBM traffic drops 2x
    vs bf16 payloads, which is the whole game for a bandwidth-bound scan.
  * PQ: classic product quantization (M subspaces x 256 centroids, 8-bit
    codes). Scoring = decode-then-dot: gather codewords from VMEM-resident
    codebooks and run the normal MXU score matmul — numerically identical
    to ADC lookup tables but shaped for the MXU instead of scalar LUTs.

Both codecs also precompute per-row |x̂|^2 of the DECODED vector so L2
scores stay exact w.r.t. the quantized representation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kmeans


# ----------------------------------------------------------------- SQ8
@dataclasses.dataclass
class SQ8Params:
    """Per-dimension affine: x ≈ lo + (code/255)*(hi-lo)."""

    lo: np.ndarray  # f32[D]
    scale: np.ndarray  # f32[D]  ((hi-lo)/255)


def sq8_train(rep: np.ndarray) -> SQ8Params:
    lo = rep.min(axis=0).astype(np.float32)
    hi = rep.max(axis=0).astype(np.float32)
    scale = ((hi - lo) / 255.0).astype(np.float32)
    scale = np.where(scale > 0, scale, 1.0)
    return SQ8Params(lo=lo, scale=scale)


def sq8_encode(rep: np.ndarray, p: SQ8Params) -> np.ndarray:
    q = np.round((rep - p.lo[None, :]) / p.scale[None, :])
    return np.clip(q, 0, 255).astype(np.uint8)


def sq8_decode_dev(codes: jax.Array, lo: jax.Array, scale: jax.Array) -> jax.Array:
    """uint8[..., D] -> bf16[..., D] decoded values (fused into the scan)."""
    return (
        codes.astype(jnp.float32) * scale + lo
    ).astype(jnp.bfloat16)


def sq8_train_dev(rep: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Device-side sq8_train: per-dimension (lo, scale) without ever
    downloading the corpus (build-time host round-trips dominated round-1
    IVF build wall time)."""
    lo = jnp.min(rep, axis=0).astype(jnp.float32)
    hi = jnp.max(rep, axis=0).astype(jnp.float32)
    scale = (hi - lo) / 255.0
    return lo, jnp.where(scale > 0, scale, 1.0)


def sq8_encode_dev(rep: jax.Array, lo: jax.Array, scale: jax.Array) -> jax.Array:
    q = jnp.round((rep - lo[None, :]) / scale[None, :])
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def pq_train_dev(
    rep: jax.Array, m: int, *, bits: int = 8, n_iters: int = 12, seed: int = 0
) -> jax.Array:
    """Device-side pq_train -> codebooks f32[M, K, ds]. All M subspace
    k-means calls share one compiled executable (identical shapes)."""
    n, d = rep.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by M={m}")
    ds = d // m
    ksub = 1 << bits
    ksub_eff = min(ksub, n)
    books = []
    for j in range(m):
        sub = jax.lax.dynamic_slice_in_dim(rep, j * ds, ds, axis=1)
        c = kmeans.kmeans_fit(
            sub, n_clusters=ksub_eff, n_iters=n_iters, seed=seed + j
        )
        if ksub_eff < ksub:
            c = jnp.concatenate(
                [c, jnp.broadcast_to(c[-1:], (ksub - ksub_eff, ds))], axis=0
            )
        books.append(c)
    return jnp.stack(books, axis=0)


def pq_encode_dev(rep: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Device-side pq_encode -> uint8[N, M]."""
    m, _, ds = codebooks.shape
    cols = []
    for j in range(m):
        sub = jax.lax.dynamic_slice_in_dim(rep, j * ds, ds, axis=1)
        cols.append(kmeans.assign_chunked(sub, codebooks[j]))
    return jnp.stack(cols, axis=1).astype(jnp.uint8)


def pq_codeword_sqnorms(codebooks: jax.Array) -> jax.Array:
    """|decoded codeword|^2 per (subspace, code) — f32[M, K], matching the
    bf16 decode used at scan time so L2 stays exact w.r.t. codes."""
    cb = codebooks.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.sum(cb * cb, axis=-1)


# ------------------------------------------------------------------ PQ
@dataclasses.dataclass
class PQParams:
    """M subspaces of ds dims, 2^bits centroids each."""

    codebooks: np.ndarray  # f32[M, K, ds]
    m: int
    bits: int

    @property
    def ksub(self) -> int:
        return 1 << self.bits


def pq_train(
    rep: np.ndarray, m: int, *, bits: int = 8, n_iters: int = 12, seed: int = 0
) -> PQParams:
    n, d = rep.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by M={m}")
    ds = d // m
    ksub = 1 << bits
    ksub_eff = min(ksub, n)
    books = np.zeros((m, ksub, ds), np.float32)
    for j in range(m):
        sub = jnp.asarray(rep[:, j * ds : (j + 1) * ds])
        c = kmeans.kmeans_fit(
            sub, n_clusters=ksub_eff, n_iters=n_iters, seed=seed + j
        )
        books[j, :ksub_eff] = np.asarray(c)
        if ksub_eff < ksub:
            books[j, ksub_eff:] = books[j, ksub_eff - 1]
    return PQParams(codebooks=books, m=m, bits=bits)


def pq_encode(rep: np.ndarray, p: PQParams, chunk: int = 65_536) -> np.ndarray:
    n, d = rep.shape
    ds = d // p.m
    codes = np.zeros((n, p.m), np.uint8)
    for j in range(p.m):
        cb = jnp.asarray(p.codebooks[j])
        for i in range(0, n, chunk):
            sub = jnp.asarray(rep[i : i + chunk, j * ds : (j + 1) * ds])
            a = kmeans.assign_chunked(sub, cb)
            codes[i : i + chunk, j] = np.asarray(a).astype(np.uint8)
    return codes


def pq_decode_dev(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """uint8[..., M] + f32[M, K, ds] -> bf16[..., M*ds] decoded vectors.

    The codebooks are tiny (M*K*ds*4 = e.g. 32*256*4*4 = 128 KiB) so the
    gathers hit VMEM/caches; HBM only supplies the 1-byte codes.
    """
    m = codebooks.shape[0]
    parts = []
    for j in range(m):
        parts.append(jnp.take(codebooks[j], codes[..., j].astype(jnp.int32), axis=0))
    return jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)


def decoded_sqnorm(decode_fn, codes: np.ndarray, chunk: int = 65_536) -> np.ndarray:
    """|x̂|^2 of decoded rows, computed in chunks on device."""
    n = codes.shape[0]
    out = np.zeros(n, np.float32)
    for i in range(0, n, chunk):
        dec = decode_fn(jnp.asarray(codes[i : i + chunk])).astype(jnp.float32)
        out[i : i + chunk] = np.asarray(jnp.sum(dec * dec, axis=-1))
    return out
