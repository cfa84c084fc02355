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


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
