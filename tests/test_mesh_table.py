"""MeshTable: one logical corpus sharded across the (virtual 8-device)
mesh; searches are single SPMD programs with ICI merges. Ground truth =
host numpy over the same rows."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.parallel.mesh_table import MeshTable


@pytest.fixture(scope="module")
def corpus(rng_mod):
    n, d = 20_000, 32
    vecs = rng_mod.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 7  # non-trivial id mapping
    price = rng_mod.integers(0, 1000, n).astype(np.int32)
    return ids, vecs, price


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(0xFEED)


def _gt_l2(vecs, q, k):
    d = ((vecs.astype(np.float64) - q) ** 2).sum(1)
    return np.argsort(d)[:k]


def test_exact_scan_matches_numpy(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m", 32)
    t.insert({"id": ids, "vec": vecs})
    q = vecs[123] + 0.01
    out_ids, scores = t.search(q, 10)
    want = ids[_gt_l2(vecs, q, 10)]
    # tie-tolerant: compare the sets of distances via membership of ids
    assert out_ids[0, 0] == ids[123] or set(out_ids[0]) & set(want[:3])
    assert set(out_ids[0]) == set(want) or len(set(out_ids[0]) & set(want)) >= 8


def test_batch_and_id_mapping(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m2", 32)
    t.insert({"id": ids, "vec": vecs})
    qs = vecs[[5, 77, 1234]]
    out_ids, _ = t.search(qs, 3)
    assert out_ids.shape == (3, 3)
    assert out_ids[0, 0] == ids[5]
    assert out_ids[1, 0] == ids[77]
    assert out_ids[2, 0] == ids[1234]


def test_filter_and_delete(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m3", 32, filter_columns=("price",))
    t.insert({"id": ids, "vec": vecs, "price": price})
    q = vecs[500]
    out_ids, _ = t.search(q, 5, filter=lambda price: price < 200)
    sel = {int(i) for i, p in zip(ids, price) if p < 200}
    assert all(int(i) in sel for i in out_ids[0] if i >= 0)
    # delete the top hit and re-search
    out_ids0, _ = t.search(q, 1)
    t.delete(int(out_ids0[0, 0]))
    out_ids1, _ = t.search(q, 1)
    assert out_ids1[0, 0] != out_ids0[0, 0]


def test_cosine(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m4", 32, metric=Metric.COSINE)
    t.insert({"id": ids, "vec": vecs})
    q = vecs[42]
    out_ids, scores = t.search(q, 5)
    assert out_ids[0, 0] == ids[42]
    # descending similarity scores
    s = scores[0]
    assert (np.diff(s[np.isfinite(s)]) <= 1e-6).all()


def test_sharded_ivf(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m5", 32)
    t.insert({"id": ids, "vec": vecs})
    t.build_ivf(ncentroids=64)
    hits = 0
    for i in (3, 900, 7777):
        out_ids, _ = t.search(vecs[i], 5, params={"nprobe": 16})
        hits += int(out_ids[0, 0] == ids[i])
    assert hits >= 2
    # full probe is exhaustive over alive rows
    out_ids, _ = t.search(vecs[11], 3, params={"nprobe": 64})
    assert out_ids[0, 0] == ids[11]


def test_ivf_rejects_filters(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m6", 32, filter_columns=("price",))
    t.insert({"id": ids, "vec": vecs, "price": price})
    t.build_ivf(ncentroids=32)
    from myscaledb_tpu.errors import QueryShapeError

    with pytest.raises(QueryShapeError):
        t.search(vecs[0], 3, params={"nprobe": 8}, filter=lambda price: price < 10)


def test_incremental_insert(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m7", 32)
    t.insert({"id": ids[:10_000], "vec": vecs[:10_000]})
    a, _ = t.search(vecs[2], 1)
    assert a[0, 0] == ids[2]
    t.insert({"id": ids[10_000:], "vec": vecs[10_000:]})  # reseal
    b, _ = t.search(vecs[15_000], 1)
    assert b[0, 0] == ids[15_000]
    assert t.n_rows == 20_000
