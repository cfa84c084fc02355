"""End-to-end: table ingest + exact search + filters + deletes + system
tables. Mirrors the reference's SQL functional tests 00001 (distance),
00009-00012 (brute force), 00016-00017 (lightweight delete)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F


def make_table(db, n=3000, d=64, seed=7, segments=2):
    rng = np.random.default_rng(seed)
    schema = ms.Schema(
        {
            "id": ms.UInt64(),
            "tag": ms.String(),
            "price": ms.Float32(),
            "vec": ms.FloatVector(d),
        }
    )
    # f32 storage: these tests compare exact rankings against an f32 numpy
    # oracle (bf16 payloads rank by quantized values — near-ties differ)
    st = ms.Settings()
    st.table.storage_dtype = "float32"
    t = db.create_table("docs", schema, settings=st)
    all_vecs, all_ids = [], []
    per = n // segments
    for s in range(segments):
        ids = np.arange(s * per, (s + 1) * per, dtype=np.uint64)
        vecs = rng.standard_normal((per, d)).astype(np.float32)
        t.insert(
            {
                "id": ids,
                "tag": np.array(["news" if i % 3 == 0 else "blog" for i in ids], dtype=object),
                "price": (ids % 100).astype(np.float32),
                "vec": vecs,
            }
        )
        all_vecs.append(vecs)
        all_ids.append(ids)
    return t, np.concatenate(all_vecs), np.concatenate(all_ids), rng


def test_exact_search_recall_1(db):
    t, vecs, ids, rng = make_table(db)
    q = rng.standard_normal((5, vecs.shape[1])).astype(np.float32)
    res = t.search("vec", q, k=10)
    # ground truth by numpy L2
    d2 = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1)[:, :10]
    got_ids = t.gather(res, ["id"])["id"].astype(np.int64)
    want_ids = ids[want].astype(np.int64)
    np.testing.assert_array_equal(np.sort(got_ids, axis=1), np.sort(want_ids, axis=1))
    # distances ascending for L2
    d = res.distances
    assert np.all(np.diff(d, axis=1) >= -1e-4)
    np.testing.assert_allclose(
        np.sort(d, axis=1), np.sort(d2[np.arange(5)[:, None], want], axis=1), rtol=2e-2
    )


def test_single_query_and_default_k(db):
    t, vecs, ids, rng = make_table(db)
    q = vecs[42]
    res = t.search("vec", q)
    assert res.nq == 1 and res.k == 30  # DEFAULT_TOPK=30 (VICommon.h:170)
    got = t.gather(res, ["id"])["id"][0, 0]
    assert int(got) == int(ids[42])
    # bf16 storage: self-distance is ~|x - bf16(x)|^2, small but nonzero
    assert res.distances[0, 0] < 0.05


def test_filtered_search_prefilter_semantics(db):
    t, vecs, ids, rng = make_table(db)
    q = rng.standard_normal((3, vecs.shape[1])).astype(np.float32)
    flt = (F("price") < 10) & (F("tag") == "news")
    res = t.search("vec", q, k=8, filter=flt)
    got = t.gather(res, ["id", "price", "tag"])
    valid = res.valid
    assert valid.any()
    assert np.all(got["price"][valid] < 10)
    assert all(v == "news" for v in got["tag"][valid].ravel())
    # pre-filter: results are the exact top-k of the filtered subset
    sel = (ids % 100 < 10) & (ids % 3 == 0)
    sub = vecs[sel]
    d2 = ((q[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    want_ids = ids[sel][np.argsort(d2, axis=1)[:, :8]].astype(np.int64)
    got_ids = got["id"].astype(np.int64)
    np.testing.assert_array_equal(
        np.sort(got_ids, axis=1), np.sort(want_ids, axis=1)
    )


def test_lightweight_delete(db):
    t, vecs, ids, rng = make_table(db)
    target = int(ids[7])
    q = vecs[7]
    res = t.search("vec", q, k=1)
    assert int(t.gather(res, ["id"])["id"][0, 0]) == target
    ndel = t.delete(F("id") == target)
    assert ndel == 1
    res2 = t.search("vec", q, k=1)
    assert int(t.gather(res2, ["id"])["id"][0, 0]) != target
    assert t.n_rows == len(ids) - 1


def test_merge_drops_deleted_rows(db):
    t, vecs, ids, rng = make_table(db)
    t.delete(F("id") < 100)
    n_live = t.n_rows
    new_id = t.merge()
    assert new_id is not None
    assert len(t.live_segments()) == 1
    assert t.n_rows == n_live
    q = vecs[500]
    res = t.search("vec", q, k=1)
    assert int(t.gather(res, ["id"])["id"][0, 0]) == int(ids[500])


def test_metric_ip_and_cosine(db):
    rng = np.random.default_rng(3)
    d = 32
    schema = ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(d)})
    t = db.create_table("m", schema)
    vecs = rng.standard_normal((500, d)).astype(np.float32)
    t.insert({"id": np.arange(500, dtype=np.uint64), "vec": vecs})
    q = rng.standard_normal(d).astype(np.float32)

    res_ip = t.search("vec", q, k=5, metric="IP")
    want = np.argsort(-(vecs @ q))[:5]
    got = t.gather(res_ip, ["id"])["id"][0].astype(np.int64)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    # IP distances descending (similarity)
    assert np.all(np.diff(res_ip.distances[0]) <= 1e-5)

    res_c = t.search("vec", q, k=5, metric="Cosine")
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    wantc = np.argsort(-sims)[:5]
    gotc = t.gather(res_c, ["id"])["id"][0].astype(np.int64)
    np.testing.assert_array_equal(np.sort(gotc), np.sort(wantc))
    # cosine distance = 1 - sim, ascending
    np.testing.assert_allclose(
        np.sort(res_c.distances[0]), 1 - (-np.sort(-sims)[:5]), atol=2e-2
    )


def test_query_shape_errors(db):
    t, vecs, ids, rng = make_table(db)
    with pytest.raises(ms.QueryShapeError):
        t.search("vec", vecs[0], k=0)
    with pytest.raises(ms.QueryShapeError):
        t.search("vec", vecs[0], k=20_000)  # > max_search_result_window
    with pytest.raises(ms.SchemaError):
        t.search("nope", vecs[0], k=5)
    with pytest.raises(ms.QueryShapeError):
        t.search("vec", vecs[0][:10], k=5)


def test_system_tables_and_events(db):
    t, vecs, ids, rng = make_table(db)
    t.add_vector_index("idx", "vec", type="FLAT")
    assert t.wait_index_built()
    rows = db.system_table("vector_indices")
    assert len(rows) == 1 and rows[0]["status"] in ("Built",)
    segs = db.system_table("vector_index_segments")
    assert len(segs) == 2
    ev = db.system_table("vector_index_event_log")
    kinds = {e["event"] for e in ev}
    assert "DefinitionCreated" in kinds
    # segments are below min_rows_to_build -> SMALL_PART, no builds
    assert all(s["status"] == "Small" for s in segs)


def test_index_build_on_large_segment(db):
    # force "large" by lowering the threshold
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    rng = np.random.default_rng(1)
    schema = ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)})
    t = db.create_table("big", schema, settings=st)
    vecs = rng.standard_normal((2000, 16)).astype(np.float32)
    t.insert({"id": np.arange(2000, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("idx", "vec", type="FLAT", metric_type="L2")
    assert t.wait_index_built()
    rows = t.system_vector_indices()
    assert rows[0]["parts_with_vector_index"] == 1
    q = vecs[3]
    res = t.search("vec", q, k=1)
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 3


def test_param_validation(db):
    t, vecs, ids, rng = make_table(db)
    with pytest.raises(ms.IndexParameterError):
        t.add_vector_index("bad", "vec", type="NOPE")
    with pytest.raises(ms.IndexParameterError):
        t.add_vector_index("bad", "vec", type="IVFFLAT", bogus=3)
    with pytest.raises(ms.IndexParameterError):
        t.add_vector_index("bad", "vec", type="IVFPQ", M=7)  # 64 % 7 != 0
    t.add_vector_index("ok", "vec", type="IVFFLAT", ncentroids=64)
    with pytest.raises(ms.IndexParameterError):
        t.add_vector_index("dup", "vec", type="FLAT")  # one index per column
