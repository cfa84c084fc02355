"""Fused Pallas scan+top-k kernel vs the reference path (interpret mode on
CPU; exactness for k <= FUSED_MAX_K)."""

import jax.numpy as jnp
import numpy as np
import pytest

from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.ops import distance
from myscaledb_tpu.ops.fused_scan import ROW_TILE, fused_scan_topk


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_oracle(rng, metric, dtype):
    n, d, k, nq = 2 * ROW_TILE, 128, 7, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    xd = jnp.asarray(x, dtype=dtype)
    qd = distance.normalize_queries(jnp.asarray(q), metric)
    aux = distance.base_aux(xd, metric)
    if aux is None:
        aux = jnp.zeros((n,), jnp.float32)
    n_valid = n - 100
    mask = (np.arange(n) < n_valid).astype(np.uint8)
    vals, idx = fused_scan_topk(
        qd, xd, aux, jnp.asarray(mask), k=k, metric=metric
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    # oracle on the quantized payload
    xq = np.asarray(xd.astype(jnp.float32))[:n_valid]
    qn = np.asarray(qd)
    s = qn @ xq.T
    if metric == Metric.L2:
        s = 2 * s - (xq**2).sum(1)[None]
    elif metric == Metric.COSINE:
        nr = np.linalg.norm(xq, axis=1)
        s = s / np.where(nr > 0, nr, 1)
    want = np.argsort(-s, 1)[:, :k]
    for i in range(nq):
        assert set(idx[i].tolist()) == set(want[i].tolist()), i
        np.testing.assert_allclose(
            vals[i], np.sort(s[i])[::-1][:k], rtol=2e-3, atol=2e-3
        )


def test_fused_masked(rng):
    n, d, k = ROW_TILE, 128, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    allowed = rng.choice(n, 40, replace=False)
    mask = np.zeros(n, np.uint8)
    mask[allowed] = 1
    aux = distance.base_aux(jnp.asarray(x), Metric.L2)
    vals, idx = fused_scan_topk(
        jnp.asarray(q), jnp.asarray(x), aux, jnp.asarray(mask), k=k, metric=Metric.L2
    )
    idx = np.asarray(idx)
    assert np.all(np.isin(idx[idx >= 0], allowed))


def test_fused_fewer_than_k(rng):
    n, d, k = ROW_TILE, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    mask = np.zeros(n, np.uint8)
    mask[:3] = 1
    aux = distance.base_aux(jnp.asarray(x), Metric.L2)
    vals, idx = fused_scan_topk(
        jnp.asarray(q), jnp.asarray(x), aux, jnp.asarray(mask), k=k, metric=Metric.L2
    )
    idx = np.asarray(idx)
    assert np.all((idx[:, :3] >= 0) & (idx[:, :3] < 3))
    assert np.all(idx[:, 3:] == -1)
    assert np.all(np.isneginf(np.asarray(vals)[:, 3:]))
