"""Shared helpers for Pallas TPU kernels.

On non-TPU backends (the CPU test mesh, the driver's virtual-device dry
run) Pallas kernels run in interpret mode; on TPU they compile via Mosaic.
"""

from __future__ import annotations

import functools

import jax

LANE = 128  # TPU lane width; last dim of every tile
SUBLANE_F32 = 8
SUBLANE_BF16 = 16


@functools.cache
def use_interpret() -> bool:
    """True when Pallas must run interpreted (no TPU backend)."""
    return jax.default_backend() != "tpu"


@functools.cache
def exact_precision():
    """Precision for f32 dots that must be numerically exact. On TPU the
    DEFAULT f32 matmul is one-pass bf16 (O(1) absolute error at SIFT
    score scale) -> HIGHEST. On CPU f32 is already exact and HIGHEST
    forces a painfully slow non-BLAS path -> default."""
    import jax as _jax

    return _jax.lax.Precision.HIGHEST if _jax.default_backend() == "tpu" else None


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
