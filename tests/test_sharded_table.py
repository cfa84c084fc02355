"""ShardedTable: fan-out + initiator fusion must equal the single-table
result; BM25 cluster stats keep cross-shard scores consistent (reference:
test_mqvs_distributed_hybrid_search, _fts_statistic_info side channel)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F

DOCS = [
    "red fox jumps high", "lazy dog sleeps", "fast red car", "dog and fox play",
    "tpu vector search engine", "blue whale swims deep", "red dog barks loud",
    "quiet night sky", "fox hunts at night", "the dog chased the red ball",
    "vector indexes on tpu", "sharded search clusters",
]


def _schema(d=12):
    return ms.Schema(
        {"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(d)}
    )


def _fill(t, rng, d=12):
    n = len(DOCS)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t.add_fts_index("ft", "body")
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.array(DOCS, dtype=object),
            "vec": vecs,
        }
    )
    return vecs


def test_sharded_vector_matches_single(db, rng):
    d = 12
    single = db.create_table("single", _schema(d))
    vecs = _fill(single, rng, d)
    sharded = db.create_sharded_table("sh", _schema(d), n_shards=3, shard_key="id")
    sharded.add_fts_index("ft", "body")
    n = len(DOCS)
    sharded.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.array(DOCS, dtype=object),
            "vec": vecs,
        }
    )
    assert sharded.n_rows == n
    q = rng.standard_normal(d).astype(np.float32)
    rs = single.search("vec", q, k=5)
    rd = sharded.search("vec", q, k=5)
    ids_s = single.gather(rs, ["id"])["id"][0].astype(int)
    ids_d = sharded.gather(rd, ["id"])["id"][0].astype(int)
    np.testing.assert_array_equal(ids_s, ids_d)
    np.testing.assert_allclose(rs.distances[0], rd.distances[0], rtol=1e-5)


def test_sharded_bm25_matches_single(db, rng):
    d = 12
    single = db.create_table("single", _schema(d))
    vecs = _fill(single, rng, d)
    sharded = db.create_sharded_table("sh", _schema(d), n_shards=3, shard_key="id")
    sharded.add_fts_index("ft", "body")
    n = len(DOCS)
    sharded.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.array(DOCS, dtype=object),
            "vec": vecs,
        }
    )
    for q in ("red dog", "vector tpu", "fox"):
        rs = single.text_search("body", q, k=6)
        rd = sharded.text_search("body", q, k=6)
        ids_s = single.gather(rs, ["id"])["id"][0][rs.valid[0]].astype(int)
        ids_d = sharded.gather(rd, ["id"])["id"][0][rd.valid[0]].astype(int)
        assert set(ids_s) == set(ids_d), q
        # cluster stats: identical BM25 scores, not just identical sets
        np.testing.assert_allclose(
            np.sort(rs.scores[0][rs.valid[0]]),
            np.sort(rd.scores[0][rd.valid[0]]),
            rtol=1e-5,
        )


def test_sharded_hybrid_and_filters(db, rng):
    d = 12
    sharded = db.create_sharded_table("sh", _schema(d), n_shards=2, shard_key="id")
    sharded.add_fts_index("ft", "body")
    n = len(DOCS)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sharded.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.array(DOCS, dtype=object),
            "vec": vecs,
        }
    )
    res = sharded.hybrid_search("vec", "body", vecs[6], "red dog", k=4, fusion_type="rrf")
    ids = sharded.gather(res, ["id"])["id"][0][res.valid[0]].astype(int)
    assert 6 in ids  # both legs agree on doc 6
    # filtered fan-out
    res2 = sharded.search("vec", vecs[3], k=4, filter=F("id") >= 6)
    ids2 = sharded.gather(res2, ["id"])["id"][0][res2.valid[0]].astype(int)
    assert len(ids2) and np.all(ids2 >= 6)
    # deletes propagate to every shard
    assert sharded.delete(F("id") == 6) == 1
    res3 = sharded.search("vec", vecs[6], k=1)
    assert int(sharded.gather(res3, ["id"])["id"][0, 0]) != 6


def test_sharded_index_ddl(db, rng):
    d = 12
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 4
    sharded = db.create_sharded_table(
        "sh", _schema(d), n_shards=2, settings=st, shard_key="id"
    )
    n = len(DOCS)
    sharded.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.array(DOCS, dtype=object),
            "vec": rng.standard_normal((n, d)).astype(np.float32),
        }
    )
    sharded.add_vector_index("v", "vec", type="FLAT")
    assert sharded.wait_index_built()
    rows = db.system_table("vector_indices")
    assert len(rows) == 2  # one per shard
    assert all(r["status"] == "Built" for r in rows)
