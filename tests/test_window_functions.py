"""Window functions: row_number/rank/dense_rank and partition
aggregates OVER (PARTITION BY ... ORDER BY ...) — the inherited
ClickHouse WindowTransform tail outside the search contract
(src/Processors/Transforms/WindowTransform.cpp)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import SQLError


@pytest.fixture()
def tbl(db):
    t = db.create_table(
        "w",
        ms.Schema({"id": ms.UInt64(), "grp": ms.UInt64(), "x": ms.Float32()}),
    )
    t.insert(
        {
            "id": np.arange(9, dtype=np.uint64),
            "grp": np.array([0, 0, 0, 1, 1, 1, 2, 2, 2], np.uint64),
            "x": np.array([3, 1, 2, 5, 5, 4, 9, 8, 7], np.float32),
        }
    )
    return db


def test_row_number_partitioned(tbl):
    rows = tbl.sql(
        "SELECT id, grp, row_number() OVER (PARTITION BY grp ORDER BY x) "
        "AS rn FROM w ORDER BY id"
    )
    # group 0: x = 3,1,2 -> rn by ascending x: id1=1, id2=2, id0=3
    by_id = {r["id"]: r["rn"] for r in rows}
    assert by_id[1] == 1 and by_id[2] == 2 and by_id[0] == 3
    # group 2: x = 9,8,7 -> id8=1, id7=2, id6=3
    assert by_id[8] == 1 and by_id[7] == 2 and by_id[6] == 3


def test_rank_vs_dense_rank_ties(tbl):
    rows = tbl.sql(
        "SELECT id, rank() OVER (PARTITION BY grp ORDER BY x DESC) AS r, "
        "dense_rank() OVER (PARTITION BY grp ORDER BY x DESC) AS dr "
        "FROM w WHERE grp == 1 ORDER BY id"
    )
    by_id = {r["id"]: (r["r"], r["dr"]) for r in rows}
    # grp 1: x = 5,5,4 -> ranks 1,1,3; dense 1,1,2
    assert by_id[3] == (1, 1) and by_id[4] == (1, 1) and by_id[5] == (3, 2)


def test_partition_aggregates(tbl):
    rows = tbl.sql(
        "SELECT id, sum(x) OVER (PARTITION BY grp) AS s, "
        "count() OVER (PARTITION BY grp) AS c, "
        "avg(x) OVER (PARTITION BY grp) AS a FROM w ORDER BY id LIMIT 3"
    )
    assert all(r["s"] == 6.0 and r["c"] == 3 for r in rows)
    assert rows[0]["a"] == pytest.approx(2.0)


def test_global_window(tbl):
    rows = tbl.sql(
        "SELECT id, row_number() OVER (ORDER BY x DESC) AS rn FROM w "
        "ORDER BY rn LIMIT 2"
    )
    assert rows[0]["id"] == 6 and rows[0]["rn"] == 1  # x=9 is global max
    assert rows[1]["id"] == 7


def test_window_over_join_rows(tbl):
    rows = tbl.sql(
        "SELECT a.id, row_number() OVER (PARTITION BY a.grp ORDER BY a.x) "
        "AS rn FROM (SELECT id, grp, x FROM w) AS a "
        "WHERE a.id < 6 ORDER BY a.id"
    )
    assert len(rows) == 6 and {r["rn"] for r in rows} == {1, 2, 3}


def test_rank_requires_order_by(tbl):
    with pytest.raises(SQLError):
        tbl.sql("SELECT rank() OVER (PARTITION BY grp) AS r FROM w")


def test_window_with_search_rejected(tbl, db):
    t = db.create_table(
        "wv",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(4)}),
    )
    t.insert(
        {
            "id": np.arange(8, dtype=np.uint64),
            "vec": np.eye(8, 4, dtype=np.float32) + 0.1,
        }
    )
    with pytest.raises(SQLError):
        db.sql(
            "SELECT id, distance(vec, [1,0,0,0]) AS d, "
            "row_number() OVER (ORDER BY id) AS rn FROM wv ORDER BY d LIMIT 3"
        )
