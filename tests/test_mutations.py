"""Mutations (ALTER TABLE ... UPDATE): scalar updates in place, vector
indexes inherited, fts stores rebuilt when covered columns mutate,
vector-column updates rejected (MutateTask inheritance semantics)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.index.base import IndexStatus


def test_update_scalar_keeps_index(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        "m",
        ms.Schema({"id": ms.UInt64(), "price": ms.Float32(), "vec": ms.FloatVector(8)}),
        settings=st,
    )
    vecs = rng.standard_normal((1000, 8)).astype(np.float32)
    t.insert(
        {
            "id": np.arange(1000, dtype=np.uint64),
            "price": np.zeros(1000, np.float32),
            "vec": vecs,
        }
    )
    t.add_vector_index("i", "vec", type="IVFFLAT", ncentroids=8)
    assert t.wait_index_built()
    inst_before = t._slots[(0, "i")].instance
    n = t.update(F("id") < 10, {"price": 99.0})
    assert n == 10
    # index object untouched (inheritance, not rebuild)
    assert t._slots[(0, "i")].instance is inst_before
    assert t._slots[(0, "i")].status == IndexStatus.LOADED
    res = t.search("vec", vecs[3], k=1, params={"nprobe": 8})
    g = t.gather(res, ["id", "price"])
    assert int(g["id"][0, 0]) == 3 and g["price"][0, 0] == 99.0
    # vector column update rejected
    with pytest.raises(ms.SchemaError):
        t.update(F("id") == 0, {"vec": np.zeros(8)})


def test_update_rebuilds_fts(db, rng):
    t = db.create_table(
        "mf", ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(4)})
    )
    t.add_fts_index("ft", "body")
    t.insert(
        {
            "id": np.arange(3, dtype=np.uint64),
            "body": np.array(["old words", "other text", "more text"], dtype=object),
            "vec": rng.standard_normal((3, 4)).astype(np.float32),
        }
    )
    assert t.text_search("body", "old", k=3).valid[0].any()
    t.update(F("id") == 0, {"body": "fresh content"})
    assert not t.text_search("body", "old", k=3).valid[0].any()
    res = t.text_search("body", "fresh", k=3)
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 0


def test_sql_update(db, rng):
    db.sql(
        "CREATE TABLE u (id UInt64, price Float32, vec Array(Float32), "
        "CONSTRAINT c CHECK length(vec) = 4)"
    )
    db.sql("INSERT INTO u (id, price, vec) VALUES (1, 5.0, [1.0,0,0,0]), (2, 6.0, [0.0,1,0,0])")
    out = db.sql("ALTER TABLE u UPDATE price = 42.5 WHERE id = 2")
    assert out[0]["updated"] == 1
    rows = db.sql("SELECT id, price FROM u ORDER BY id")
    assert rows[1]["price"] == 42.5 and rows[0]["price"] == 5.0
