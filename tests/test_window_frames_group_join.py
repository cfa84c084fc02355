"""Window ROWS frames + lag/lead, and GROUP BY over JOIN/subquery
sources — columnar engine vs the row-dict oracle, plus million-row
bounds (round-3 verdict item #6; reference inherits ClickHouse's
src/Processors/Transforms/WindowTransform.cpp and Aggregator.cpp)."""

import time

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import SQLError
from myscaledb_tpu.sql import columnar


@pytest.fixture()
def tbl(db, rng):
    t = db.create_table(
        "w",
        ms.Schema({"id": ms.UInt64(), "grp": ms.UInt64(), "x": ms.Float32()}),
    )
    n = 200
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "grp": rng.integers(0, 7, n).astype(np.uint64),
            "x": rng.standard_normal(n).astype(np.float32),
        }
    )
    t2 = db.create_table(
        "dimw", ms.Schema({"grp": ms.UInt64(), "v": ms.Float32()})
    )
    t2.insert(
        {
            "grp": np.arange(5, dtype=np.uint64),  # grps 5,6 unmatched
            "v": rng.standard_normal(5).astype(np.float32),
        }
    )
    return db


WINDOW_QUERIES = [
    # ROWS frames over aggregates
    "SELECT id, sum(x) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM w ORDER BY id LIMIT 50",
    "SELECT id, avg(x) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS a FROM w ORDER BY id LIMIT 50",
    "SELECT id, count() OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM w "
    "ORDER BY id LIMIT 50",
    "SELECT id, sum(x) OVER (ORDER BY id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS t "
    "FROM w ORDER BY id LIMIT 20",
    # default frame with ORDER BY = running aggregate over peers
    # (RANGE UNBOUNDED PRECEDING AND CURRENT ROW, the reference default)
    "SELECT id, sum(x) OVER (PARTITION BY grp ORDER BY id) AS s FROM w "
    "ORDER BY id LIMIT 50",
    "SELECT id, avg(x) OVER (ORDER BY grp) AS a FROM w ORDER BY id LIMIT 50",
    # explicit RANGE frames (value offsets on the ORDER BY key; peers)
    "SELECT id, count() OVER (ORDER BY x "
    "RANGE BETWEEN 0.5 PRECEDING AND 0.5 FOLLOWING) AS c FROM w "
    "ORDER BY id LIMIT 50",
    "SELECT id, sum(x) OVER (PARTITION BY grp ORDER BY id "
    "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS s FROM w "
    "ORDER BY id LIMIT 50",
    "SELECT id, min(x) OVER (PARTITION BY grp ORDER BY id DESC "
    "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS m FROM w "
    "ORDER BY id LIMIT 50",
    "SELECT id, max(x) OVER (ORDER BY id "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m FROM w "
    "ORDER BY id LIMIT 30",
    # scalar expressions as window arguments
    "SELECT id, lag(x * 10, 1, 0) OVER (PARTITION BY grp ORDER BY id) AS p "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, sum(x * 2) OVER (PARTITION BY grp ORDER BY id) AS s "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, max(x + id) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m FROM w "
    "ORDER BY id LIMIT 50",
    # min/max over sliding frames (sparse-table RMQ path)
    "SELECT id, min(x) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m FROM w ORDER BY id LIMIT 50",
    "SELECT id, max(x) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN 1 PRECEDING AND 3 FOLLOWING) AS m FROM w ORDER BY id LIMIT 50",
    "SELECT id, min(x) OVER (ORDER BY id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m FROM w "
    "ORDER BY id LIMIT 30",
    # frames that are empty near the partition head/tail -> None
    "SELECT id, sum(x) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING) AS s FROM w ORDER BY id LIMIT 50",
    "SELECT id, max(x) OVER (ORDER BY id "
    "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS m FROM w ORDER BY id LIMIT 20",
    # lag / lead
    "SELECT id, lag(x) OVER (PARTITION BY grp ORDER BY id) AS p "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, lead(x, 2) OVER (PARTITION BY grp ORDER BY id) AS nx "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, lag(id, 1, 999) OVER (ORDER BY id) AS p FROM w "
    "ORDER BY id LIMIT 20",
    # whole-partition aggregates and ranks still agree
    "SELECT id, min(x) OVER (PARTITION BY grp) AS m, "
    "rank() OVER (PARTITION BY grp ORDER BY x DESC) AS r FROM w "
    "ORDER BY id LIMIT 60",
    # first_value / last_value / ntile (WindowTransform.cpp family tail)
    "SELECT id, first_value(x) OVER (PARTITION BY grp ORDER BY id) AS f "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, last_value(x) OVER (PARTITION BY grp ORDER BY id) AS l "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, first_value(x) OVER (PARTITION BY grp) AS f FROM w "
    "ORDER BY id LIMIT 50",
    "SELECT id, last_value(x) OVER (PARTITION BY grp ORDER BY id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l "
    "FROM w ORDER BY id LIMIT 50",
    "SELECT id, first_value(x * 2) OVER (ORDER BY id "
    "ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING) AS f FROM w "
    "ORDER BY id LIMIT 20",
    "SELECT id, ntile(4) OVER (PARTITION BY grp ORDER BY id) AS b "
    "FROM w ORDER BY id LIMIT 60",
    "SELECT id, ntile(7) OVER (ORDER BY x) AS b FROM w ORDER BY id LIMIT 60",
]

GROUP_JOIN_QUERIES = [
    "SELECT grp, count() AS c, sum(x) AS s FROM w GROUP BY grp ORDER BY grp",
    "SELECT w.grp, count() AS c, avg(v) AS av FROM w JOIN dimw ON "
    "w.grp = dimw.grp GROUP BY w.grp ORDER BY w.grp",
    "SELECT w.grp, count() AS c FROM w JOIN dimw ON w.grp = dimw.grp "
    "WHERE x > 0 GROUP BY w.grp HAVING c > 5 ORDER BY c DESC, w.grp",
    "SELECT grp, min(x) AS lo, max(x) AS hi, uniq(id) AS u FROM "
    "(SELECT id, grp, x FROM w WHERE id < 150) AS sub GROUP BY grp "
    "ORDER BY grp LIMIT 5",
    "SELECT count() AS c, sum(v) AS s FROM w JOIN dimw ON w.grp = dimw.grp",
]


def _norm(rows):
    out = []
    for r in rows:
        nr = {}
        for k, v in r.items():
            nr[k] = round(float(v), 4) if isinstance(v, float) else v
        out.append(nr)
    return out


def test_window_frames_columnar_matches_oracle(tbl, monkeypatch):
    db = tbl
    for q in WINDOW_QUERIES:
        fast = db.sql(q)
        monkeypatch.setattr(columnar, "run_composite", lambda *_: None)
        slow = db.sql(q)
        monkeypatch.undo()
        assert _norm(fast) == _norm(slow), q


def test_window_plain_table_uses_columnar(tbl, monkeypatch):
    db = tbl
    called = {}
    orig = columnar.run_composite

    def spy(runner, st):
        out = orig(runner, st)
        called["hit"] = out is not None
        return out

    monkeypatch.setattr(columnar, "run_composite", spy)
    db.sql(WINDOW_QUERIES[0])
    assert called["hit"]
    # sliding min/max no longer falls back to the row oracle
    q_min = next(q for q in WINDOW_QUERIES if "min(x) OVER (PARTITION" in q)
    called.clear()
    db.sql(q_min)
    assert called["hit"]


def test_group_by_join_columnar_matches_oracle(tbl, monkeypatch):
    db = tbl
    for q in GROUP_JOIN_QUERIES:
        fast = db.sql(q)
        monkeypatch.setattr(columnar, "run_composite", lambda *_: None)
        slow = db.sql(q)
        monkeypatch.undo()
        assert _norm(fast) == _norm(slow), q
        assert fast, q  # non-empty results on this data


def test_group_by_join_uses_columnar(tbl, monkeypatch):
    db = tbl
    called = {}
    orig = columnar.run_composite

    def spy(runner, st):
        out = orig(runner, st)
        called["hit"] = out is not None
        return out

    monkeypatch.setattr(columnar, "run_composite", spy)
    db.sql(GROUP_JOIN_QUERIES[1])
    assert called["hit"]


def test_lag_default_and_bounds(tbl):
    rows = tbl.sql(
        "SELECT id, lag(id, 1, 777) OVER (ORDER BY id) AS p FROM w "
        "ORDER BY id LIMIT 3"
    )
    assert rows[0]["p"] == 777 and rows[1]["p"] == 0 and rows[2]["p"] == 1
    rows = tbl.sql(
        "SELECT id, lead(id) OVER (ORDER BY id) AS nx FROM w "
        "ORDER BY id DESC LIMIT 1"
    )
    assert rows[0]["nx"] is None  # last row has no lead


def test_range_frame_semantics(db):
    """Hand-checked RANGE semantics: peers share one value; value
    offsets select by key distance, not row distance."""
    t = db.create_table(
        "rr", ms.Schema({"id": ms.UInt64(), "k": ms.UInt64(), "x": ms.Float32()})
    )
    t.insert(
        {
            "id": np.arange(6, dtype=np.uint64),
            "k": np.asarray([1, 1, 2, 5, 5, 9], np.uint64),
            "x": np.asarray([1, 2, 4, 8, 16, 32], np.float32),
        }
    )
    # running sum over peers: k=1 rows both see 1+2; k=5 rows both see 31
    rows = db.sql("SELECT id, sum(x) OVER (ORDER BY k) AS s FROM rr ORDER BY id")
    assert [r["s"] for r in rows] == [3.0, 3.0, 7.0, 31.0, 31.0, 63.0]
    # value offsets: k within +-1 of the current key
    rows = db.sql(
        "SELECT id, count() OVER (ORDER BY k "
        "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c FROM rr ORDER BY id"
    )
    assert [r["c"] for r in rows] == [3, 3, 3, 2, 2, 1]
    # empty value band -> None for aggregates
    rows = db.sql(
        "SELECT id, sum(x) OVER (ORDER BY k "
        "RANGE BETWEEN 3 PRECEDING AND 2 PRECEDING) AS s FROM rr ORDER BY id"
    )
    assert rows[0]["s"] is None and rows[3]["s"] == 4.0


def test_first_last_ntile_semantics(db):
    """Hand-checked: last_value's default frame ends at the CURRENT PEER
    GROUP (the famous surprise); ntile splits larger-buckets-first."""
    t = db.create_table(
        "fl", ms.Schema({"id": ms.UInt64(), "k": ms.UInt64(), "x": ms.Float32()})
    )
    t.insert(
        {
            "id": np.arange(5, dtype=np.uint64),
            "k": np.asarray([1, 1, 2, 3, 3], np.uint64),
            "x": np.asarray([10, 20, 30, 40, 50], np.float32),
        }
    )
    rows = db.sql(
        "SELECT id, last_value(x) OVER (ORDER BY k) AS l FROM fl ORDER BY id"
    )
    # peers share the frame end: k=1 -> 20, k=2 -> 30, k=3 -> 50
    assert [r["l"] for r in rows] == [20.0, 20.0, 30.0, 50.0, 50.0]
    rows = db.sql(
        "SELECT id, first_value(x) OVER (ORDER BY k) AS f FROM fl ORDER BY id"
    )
    assert [r["f"] for r in rows] == [10.0] * 5
    # ntile(2) over 5 rows: buckets of 3 then 2
    rows = db.sql("SELECT id, ntile(2) OVER (ORDER BY id) AS b FROM fl ORDER BY id")
    assert [r["b"] for r in rows] == [1, 1, 1, 2, 2]
    # ntile(10) with fewer rows than buckets: one row per bucket
    rows = db.sql("SELECT id, ntile(10) OVER (ORDER BY id) AS b FROM fl ORDER BY id")
    assert [r["b"] for r in rows] == [1, 2, 3, 4, 5]
    with pytest.raises(SQLError):
        db.sql("SELECT ntile(0) OVER (ORDER BY id) AS b FROM fl")
    with pytest.raises(SQLError):
        db.sql("SELECT ntile(2) OVER (PARTITION BY k) AS b FROM fl")
    with pytest.raises(SQLError):  # no frame clause on ntile
        db.sql(
            "SELECT ntile(2) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING "
            "AND CURRENT ROW) AS b FROM fl"
        )


def test_range_frame_string_keys(db):
    """Peer-group RANGE bounds (UNBOUNDED/CURRENT ROW) need only key
    EQUALITY, so they work over string ORDER BY keys — the reference
    requires numeric keys only for nonzero value offsets."""
    t = db.create_table(
        "rs", ms.Schema({"id": ms.UInt64(), "name": ms.String(), "x": ms.Float32()})
    )
    t.insert(
        {
            "id": np.arange(6, dtype=np.uint64),
            "name": np.asarray(["a", "a", "b", "c", "c", "d"], object),
            "x": np.asarray([1, 2, 4, 8, 16, 32], np.float32),
        }
    )
    # running sum over string peers (the implicit with-ORDER-BY frame)
    rows = db.sql(
        "SELECT id, sum(x) OVER (ORDER BY name) AS s FROM rs ORDER BY id"
    )
    assert [r["s"] for r in rows] == [3.0, 3.0, 7.0, 31.0, 31.0, 63.0]
    # explicit peer-group frame, DESC key
    rows = db.sql(
        "SELECT id, count() OVER (ORDER BY name DESC RANGE BETWEEN "
        "CURRENT ROW AND UNBOUNDED FOLLOWING) AS c FROM rs ORDER BY id"
    )
    # DESC sort: [d, c, c, b, a, a]; frame = current peer group -> end
    assert [r["c"] for r in rows] == [2, 2, 3, 5, 5, 6]
    # nonzero value offsets still demand a numeric key
    with pytest.raises(SQLError):
        db.sql(
            "SELECT sum(x) OVER (ORDER BY name "
            "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM rs"
        )


def test_range_peer_frame_columnar_matches_oracle(db, monkeypatch):
    """String/multi-key peer RANGE frames: columnar vs row oracle on a
    bulkier random corpus."""
    rng = np.random.default_rng(11)
    n = 300
    t = db.create_table(
        "rp", ms.Schema({"id": ms.UInt64(), "g": ms.UInt64(),
                         "name": ms.String(), "x": ms.Float32()})
    )
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "g": rng.integers(0, 4, n).astype(np.uint64),
            "name": np.asarray(
                [f"w{int(v)}" for v in rng.integers(0, 9, n)], object
            ),
            "x": rng.standard_normal(n).astype(np.float32),
        }
    )
    queries = [
        "SELECT id, sum(x) OVER (PARTITION BY g ORDER BY name) AS s "
        "FROM rp ORDER BY id LIMIT 80",
        "SELECT id, avg(x) OVER (ORDER BY name RANGE BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS a FROM rp ORDER BY id LIMIT 80",
        # multi-key peers: equality over BOTH order keys
        "SELECT id, count() OVER (ORDER BY g, name RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM rp "
        "ORDER BY id LIMIT 80",
        "SELECT id, min(x) OVER (PARTITION BY g ORDER BY name DESC "
        "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m "
        "FROM rp ORDER BY id LIMIT 80",
    ]
    for q in queries:
        fast = db.sql(q)
        monkeypatch.setattr(columnar, "run_composite", lambda *_: None)
        slow = db.sql(q)
        monkeypatch.undo()
        assert _norm(fast) == _norm(slow), q


def test_named_window_clause(tbl, db):
    """WINDOW w AS (<spec>): several OVER w items share one named spec;
    validation matches the inline form."""
    rows = tbl.sql(
        "SELECT id, sum(x) OVER w AS s, row_number() OVER w AS rn FROM w "
        "WINDOW w AS (PARTITION BY grp ORDER BY id) ORDER BY id LIMIT 50"
    )
    inline = tbl.sql(
        "SELECT id, sum(x) OVER (PARTITION BY grp ORDER BY id) AS s, "
        "row_number() OVER (PARTITION BY grp ORDER BY id) AS rn FROM w "
        "ORDER BY id LIMIT 50"
    )
    assert _norm(rows) == _norm(inline)
    with pytest.raises(SQLError):
        tbl.sql("SELECT sum(x) OVER nope AS s FROM w")
    with pytest.raises(SQLError):  # ranking validation applies to refs too
        tbl.sql(
            "SELECT rank() OVER w AS r FROM w WINDOW w AS (PARTITION BY grp)"
        )


def test_range_frame_validation(tbl):
    with pytest.raises(SQLError):
        tbl.sql(
            "SELECT sum(x) OVER (RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) "
            "AS s FROM w"
        )
    with pytest.raises(SQLError):
        tbl.sql(
            "SELECT sum(x) OVER (ORDER BY id, grp "
            "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM w"
        )


def test_frame_validation_errors(tbl):
    with pytest.raises(SQLError):
        tbl.sql(
            "SELECT row_number() OVER (ORDER BY id "
            "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r FROM w"
        )
    with pytest.raises(SQLError):
        tbl.sql("SELECT lag(x) OVER (PARTITION BY grp) AS p FROM w")
    with pytest.raises(SQLError):
        tbl.sql(
            "SELECT sum(x) OVER (ORDER BY id "
            "ROWS BETWEEN CURRENT ROW AND 2 PRECEDING) AS s FROM w"
        )


def test_window_group_mix_rejected_on_join(tbl):
    with pytest.raises(SQLError):
        tbl.sql(
            "SELECT w.grp, count() AS c, row_number() OVER (ORDER BY w.grp) "
            "AS rn FROM w JOIN dimw ON w.grp = dimw.grp GROUP BY w.grp"
        )


def test_million_row_group_by_join_bounded(db, rng):
    n1, n2 = 1_000_000, 1_000
    t1 = db.create_table(
        "bigg", ms.Schema({"id": ms.UInt64(), "k": ms.UInt64(), "x": ms.Float32()})
    )
    t2 = db.create_table(
        "dimg", ms.Schema({"k": ms.UInt64(), "v": ms.Float32()})
    )
    t1.insert(
        {
            "id": np.arange(n1, dtype=np.uint64),
            "k": rng.integers(0, n2, n1).astype(np.uint64),
            "x": rng.standard_normal(n1).astype(np.float32),
        }
    )
    t2.insert(
        {
            "k": np.arange(n2, dtype=np.uint64),
            "v": rng.standard_normal(n2).astype(np.float32),
        }
    )
    t0 = time.time()
    rows = db.sql(
        "SELECT bigg.k, count() AS c, sum(x) AS s, avg(v) AS av FROM bigg "
        "JOIN dimg ON bigg.k = dimg.k GROUP BY bigg.k "
        "HAVING c > 900 ORDER BY c DESC LIMIT 10"
    )
    dt = time.time() - t0
    assert rows and all(r["c"] > 900 for r in rows)
    assert dt < 10.0, f"1M-row GROUP-BY-over-JOIN took {dt:.1f}s"
    # windowed query at the same scale
    t0 = time.time()
    rows = db.sql(
        "SELECT id, sum(x) OVER (PARTITION BY k ORDER BY id "
        "ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS s FROM bigg "
        "ORDER BY id LIMIT 10"
    )
    dt = time.time() - t0
    assert len(rows) == 10
    assert dt < 10.0, f"1M-row windowed query took {dt:.1f}s"
