"""Unit tests: score kernels vs numpy ground truth (the reference's
correctness oracle is numpy exact scan — tests/vector_search/test_distance.py
pattern, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.ops import bruteforce, distance
from myscaledb_tpu.ops.topk import merge_topk_lists, topk_scores


def _np_scores(q, x, metric):
    s = q.astype(np.float64) @ x.astype(np.float64).T
    if metric == Metric.L2:
        return 2 * s - (x.astype(np.float64) ** 2).sum(1)[None, :]
    if metric == Metric.COSINE:
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = np.linalg.norm(x.astype(np.float64), axis=1)
        return (qn.astype(np.float64) @ x.astype(np.float64).T) / np.where(
            xn > 0, xn, 1
        )
    return s


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_scores_pallas_matches_numpy(rng, metric):
    q = rng.standard_normal((16, 128), dtype=np.float32)
    x = rng.standard_normal((1024, 128), dtype=np.float32)
    qq = distance.normalize_queries(jnp.asarray(q), metric)
    aux = distance.base_aux(jnp.asarray(x), metric)
    got = np.asarray(
        distance.scores(qq, jnp.asarray(x), aux, metric=metric, n_tile=512)
    )
    want = _np_scores(q, x, metric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_scores_ref_matches_numpy(rng, metric):
    q = rng.standard_normal((5, 96), dtype=np.float32)
    x = rng.standard_normal((77, 96), dtype=np.float32)
    qq = distance.normalize_queries(jnp.asarray(q), metric)
    got = np.asarray(distance.scores_ref(qq, jnp.asarray(x), metric=metric))
    np.testing.assert_allclose(got, _np_scores(q, x, metric), rtol=1e-4, atol=1e-4)


def test_scores_bf16_storage_close(rng):
    q = rng.standard_normal((8, 128), dtype=np.float32)
    x = rng.standard_normal((512, 128), dtype=np.float32)
    got = np.asarray(
        distance.scores(
            jnp.asarray(q),
            jnp.asarray(x, dtype=jnp.bfloat16),
            distance.base_aux(jnp.asarray(x), Metric.L2),
            metric=Metric.L2,
        )
    )
    want = _np_scores(q, x, Metric.L2)
    # bf16 payload: ~1e-2 relative noise is expected
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert rel.max() < 0.03


def test_topk_exact_and_padding(rng):
    s = jnp.asarray(rng.standard_normal((4, 50), dtype=np.float32))
    vals, idx = topk_scores(s, 60)
    assert vals.shape == (4, 60) and idx.shape == (4, 60)
    np_order = np.argsort(-np.asarray(s), axis=1)
    np.testing.assert_array_equal(np.asarray(idx)[:, :50], np_order)
    assert np.all(np.asarray(idx)[:, 50:] == -1)
    assert np.all(np.isneginf(np.asarray(vals)[:, 50:]))


def test_merge_topk_lists(rng):
    v = jnp.asarray(rng.standard_normal((3, 4, 8), dtype=np.float32))
    i = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (3, 4, 8))
    mv, mi = merge_topk_lists(jnp.transpose(v, (0, 1, 2)), i, 5)
    flat = np.asarray(v).reshape(3, 32)
    want = -np.sort(-flat, axis=1)[:, :5]
    # merge is over the last two dims [4, 8] per leading row
    got = np.asarray(mv)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
@pytest.mark.parametrize("n,chunk", [(2048, 2048), (4096, 1024)])
def test_scan_topk_exact(rng, metric, n, chunk):
    d, k, nq = 128, 10, 7
    q = rng.standard_normal((nq, d), dtype=np.float32)
    x = rng.standard_normal((n, d), dtype=np.float32)
    n_valid = n - 100
    vals, idx = bruteforce.scan_topk(
        jnp.asarray(q),
        jnp.asarray(x),
        None,
        k=k,
        metric=metric,
        n_valid=n_valid,
        chunk_rows=chunk,
    )
    want = _np_scores(q, x[:n_valid], metric)
    order = np.argsort(-want, axis=1)[:, :k]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1), np.sort(order, axis=1))


def test_scan_topk_mask(rng):
    n, d, k = 2048, 128, 5
    q = rng.standard_normal((3, d), dtype=np.float32)
    x = rng.standard_normal((n, d), dtype=np.float32)
    mask = np.zeros(n, dtype=bool)
    allowed = rng.choice(n, size=64, replace=False)
    mask[allowed] = True
    vals, idx = bruteforce.scan_topk(
        jnp.asarray(q),
        jnp.asarray(x),
        None,
        k=k,
        metric=Metric.L2,
        n_valid=n,
        mask=jnp.asarray(mask),
    )
    idx = np.asarray(idx)
    assert np.all(np.isin(idx[idx >= 0], allowed))
    # exact within the allowed set
    want = _np_scores(q, x[allowed], Metric.L2)
    order = allowed[np.argsort(-want, axis=1)[:, :k]]
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(order, axis=1))


def test_scan_topk_k_larger_than_valid(rng):
    n, d = 1024, 128
    q = rng.standard_normal((2, d), dtype=np.float32)
    x = rng.standard_normal((n, d), dtype=np.float32)
    vals, idx = bruteforce.scan_topk(
        jnp.asarray(q), jnp.asarray(x), None, k=50, metric=Metric.IP, n_valid=20
    )
    idx = np.asarray(idx)
    assert (idx >= 0).sum(axis=1).tolist() == [20, 20]
