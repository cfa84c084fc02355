"""IVF-FLAT: k-means, bucket layout, recall vs exact scan, filters.

Mirrors the reference's recall oracle: numpy exact scan ground truth
(tests/vector_search/test_distance.py pattern; recall targets per
BASELINE.json config 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.index.ivf import IVFFlatIndex, default_ncentroids
from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.ops import kmeans
from myscaledb_tpu.storage.segment import Segment
from myscaledb_tpu.storage.schema import FloatVector, Schema, UInt64


def _recall(got_ids, want_ids):
    hits = 0
    for g, w in zip(got_ids, want_ids):
        hits += len(set(int(x) for x in g if x >= 0) & set(int(x) for x in w))
    return hits / want_ids.size


def test_kmeans_converges(rng):
    # 4 well-separated blobs -> centroids land on them
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    data = np.concatenate(
        [c + 0.1 * rng.standard_normal((200, 2)).astype(np.float32) for c in centers]
    )
    # C > #blobs: with random init, every blob must end up with >=1 centroid
    cents = np.asarray(kmeans.kmeans_fit(jnp.asarray(data), n_clusters=8, n_iters=15))
    d = np.linalg.norm(cents[:, None, :] - centers[None], axis=-1).min(axis=0)
    assert np.all(d < 0.5)


def test_assign_chunked_matches_full(rng):
    data = rng.standard_normal((1000, 16)).astype(np.float32)
    cents = rng.standard_normal((7, 16)).astype(np.float32)
    a1 = np.asarray(kmeans.assign_chunked(jnp.asarray(data), jnp.asarray(cents), chunk=128))
    want = np.argmin(((data[:, None] - cents[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(a1, want)


def _make_vectors(rng, n, d, clustered=False):
    if not clustered:
        return rng.standard_normal((n, d)).astype(np.float32)
    # mixture of Gaussians — the structure real embeddings have (IVF's
    # operating assumption; uniform Gaussian is its worst case)
    n_blobs = 50
    centers = 8.0 * rng.standard_normal((n_blobs, d)).astype(np.float32)
    which = rng.integers(0, n_blobs, n)
    return (centers[which] + rng.standard_normal((n, d))).astype(np.float32)


def _build_segment(rng, n, d, metric=Metric.L2, clustered=False):
    schema = Schema({"id": UInt64(), "vec": FloatVector(d)})
    vecs = _make_vectors(rng, n, d, clustered)
    seg = Segment.from_columns(
        0,
        schema,
        {"id": np.arange(n, dtype=np.uint64), "vec": vecs},
        storage_dtype=jnp.float32,
    )
    return seg, vecs


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_ivf_recall(rng, metric):
    n, d, k, nq = 20_000, 32, 10, 20
    seg, vecs = _build_segment(rng, n, d, clustered=True)
    idx = IVFFlatIndex.build(
        seg.vector("vec"), n, metric=metric, dim=d, params={"ncentroids": 64}
    )
    # query near existing points (the benchmark regime)
    q = (vecs[rng.choice(n, nq, replace=False)]
         + 0.1 * rng.standard_normal((nq, d))).astype(np.float32)
    dpad = seg.vector("vec").data.shape[1]
    qdev = jnp.asarray(np.pad(q, ((0, 0), (0, dpad - d))))
    vals, rows = idx.search(qdev, k, params={"nprobe": 16})
    rows = np.asarray(rows)

    if metric == Metric.L2:
        s = -((q[:, None] - vecs[None]) ** 2).sum(-1)
    elif metric == Metric.IP:
        s = q @ vecs.T
    else:
        s = (q / np.linalg.norm(q, axis=1, keepdims=True)) @ (
            vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        ).T
    want = np.argsort(-s, axis=1)[:, :k]
    r = _recall(rows, want)
    assert r >= 0.93, f"IVF recall {r} too low for {metric}"
    # full-probe must be exact (overflow + all buckets cover everything)
    vals2, rows2 = idx.search(qdev, k, params={"nprobe": 64})
    assert _recall(np.asarray(rows2), want) == 1.0


def test_ivf_filtered(rng):
    n, d, k = 10_000, 16, 5
    seg, vecs = _build_segment(rng, n, d)
    idx = IVFFlatIndex.build(
        seg.vector("vec"), n, metric=Metric.L2, dim=d, params={"ncentroids": 32}
    )
    allowed = rng.choice(n, 500, replace=False)
    mask = np.zeros(seg.capacity, bool)
    mask[allowed] = True
    dpad = seg.vector("vec").data.shape[1]
    q = rng.standard_normal((4, d)).astype(np.float32)
    qdev = jnp.asarray(np.pad(q, ((0, 0), (0, dpad - d))))
    vals, rows = idx.search(qdev, k, params={"nprobe": 32}, mask=jnp.asarray(mask))
    rows = np.asarray(rows)
    assert np.all(np.isin(rows[rows >= 0], allowed))


def test_ivf_end_to_end_table(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 1000
    st.table.storage_dtype = "float32"
    d = 24
    t = db.create_table(
        "ivf_t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(d)}), settings=st
    )
    vecs = rng.standard_normal((8000, d)).astype(np.float32)
    t.insert({"id": np.arange(8000, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=32, metric_type="L2")
    assert t.wait_index_built()
    rows = t.system_vector_indices()
    assert rows[0]["status"] == "Built" and rows[0]["type"] == "IVFFLAT"
    q = vecs[77]
    res = t.search("vec", q, k=5, params={"nprobe": 8})
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 77
    # deleted rows never surface through the index path
    t.delete(F("id") == 77)
    res2 = t.search("vec", q, k=5, params={"nprobe": 32})
    assert 77 not in t.gather(res2, ["id"])["id"][0].astype(int)


def test_ivf_state_roundtrip(rng):
    n, d = 5000, 16
    seg, vecs = _build_segment(rng, n, d)
    idx = IVFFlatIndex.build(
        seg.vector("vec"), n, metric=Metric.L2, dim=d, params={"ncentroids": 16}
    )
    idx2 = IVFFlatIndex.from_state_dict(idx.state_dict())
    dpad = seg.vector("vec").data.shape[1]
    q = jnp.asarray(np.pad(vecs[:3], ((0, 0), (0, dpad - d))))
    v1, r1 = idx.search(q, 5)
    v2, r2 = idx2.search(q, 5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_default_ncentroids():
    assert 16 <= default_ncentroids(10_000) <= 1024
    assert default_ncentroids(1_000_000) >= 1024
