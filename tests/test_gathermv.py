"""Fused gather+matvec kernel (ops/gathermv.py) vs the XLA reference.

The kernel is the HNSW traversal's hot path on TPU (interpret mode
here); its contract is bit-comparable to the take-then-bf16-einsum it
replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myscaledb_tpu.ops import gathermv


@pytest.mark.parametrize("m,dt,beam", [(32, 256, 8), (32, 128, 4), (64, 128, 8)])
def test_matches_bf16_einsum(m, dt, beam):
    rng = np.random.default_rng(m + dt + beam)
    n, q = 300, 5
    nb = rng.integers(0, 256, (n, m, dt), dtype=np.uint8)
    rows = rng.integers(0, n, (q, beam)).astype(np.int32)
    qs = rng.standard_normal((q, dt)).astype(np.float32)
    assert gathermv.supports(beam, m, dt)
    out = np.asarray(
        gathermv.gather_block_scores(
            jnp.asarray(qs), jnp.asarray(rows), jnp.asarray(nb)
        )
    )
    g = jnp.take(jnp.asarray(nb), jnp.asarray(rows), axis=0)
    ref = np.asarray(
        jnp.einsum(
            "qd,qbmd->qbm",
            jnp.asarray(qs).astype(jnp.bfloat16),
            g.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    ).reshape(q, beam * m)
    scale = float(np.abs(ref).mean()) + 1e-6
    assert np.abs(out - ref).max() <= 0.02 * scale


def test_supports_gate():
    assert not gathermv.supports(8, 16, 256)  # m not 32-aligned
    assert not gathermv.supports(8, 32, 100)  # dt not lane-aligned
    assert not gathermv.supports(3, 32, 256)  # beam*m not lane-aligned
    assert gathermv.supports(8, 32, 1024)


def test_repeated_and_clamped_rows():
    rng = np.random.default_rng(0)
    n, m, dt, q, beam = 64, 32, 128, 3, 4
    nb = rng.integers(0, 256, (n, m, dt), dtype=np.uint8)
    rows = np.zeros((q, beam), np.int32)  # all the same block
    qs = rng.standard_normal((q, dt)).astype(np.float32)
    out = np.asarray(
        gathermv.gather_block_scores(
            jnp.asarray(qs), jnp.asarray(rows), jnp.asarray(nb)
        )
    ).reshape(q, beam, m)
    for b in range(1, beam):
        np.testing.assert_array_equal(out[:, 0], out[:, b])
