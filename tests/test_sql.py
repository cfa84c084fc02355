"""SQL surface: DDL, INSERT, distance()/batch_distance()/textsearch()/
hybridsearch() queries, direction checks, LIMIT/OFFSET windows, system
tables. Mirrors the reference SQL functional tests (tests/queries/
2_vector_search/*) at unit scale."""

import numpy as np
import pytest

import myscaledb_tpu as ms


@pytest.fixture()
def sdb(db, rng):
    db.sql(
        """
        CREATE TABLE docs (
            id UInt64,
            body String,
            price Float32,
            vec Array(Float32),
            CONSTRAINT c CHECK length(vec) = 8,
            VECTOR INDEX vidx vec TYPE FLAT('metric_type=L2'),
            INDEX ft (body) TYPE fts('{"lower_case": true}') GRANULARITY 1
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    rows = []
    texts = ["red fox jumps", "lazy dog sleeps", "fast red car", "a dog and a fox",
             "tpu vector search", "blue whale swims", "red dog barks", "quiet night sky"]
    for i, txt in enumerate(texts):
        vec = [float(i)] * 8
        rows.append(f"({i}, '{txt}', {i * 10}.0, {vec})")
    db.sql(f"INSERT INTO docs (id, body, price, vec) VALUES {', '.join(rows)}")
    return db


def test_create_insert_and_count(sdb):
    assert sdb.sql("SELECT count() FROM docs")[0]["count()"] == 8
    rows = sdb.sql("SELECT id, body FROM docs WHERE id < 3 ORDER BY id DESC")
    assert [r["id"] for r in rows] == [2, 1, 0]
    assert rows[0]["body"] == "fast red car"


def test_distance_query(sdb):
    rows = sdb.sql(
        "SELECT id, distance(vec, [3.1,3.1,3.1,3.1,3.1,3.1,3.1,3.1]) AS d "
        "FROM docs ORDER BY d ASC LIMIT 3"
    )
    assert [r["id"] for r in rows] == [3, 4, 2]
    assert rows[0]["d"] < rows[1]["d"] < rows[2]["d"]


def test_distance_with_where(sdb):
    rows = sdb.sql(
        "SELECT id, distance(vec, [3.1]*8 ) AS d FROM docs "
        "WHERE price > 35 ORDER BY d LIMIT 2"
        .replace("[3.1]*8", "[3.1,3.1,3.1,3.1,3.1,3.1,3.1,3.1]")
    )
    assert [r["id"] for r in rows] == [4, 5]


def test_distance_requires_limit(sdb):
    with pytest.raises(ms.QueryShapeError):
        sdb.sql("SELECT id, distance(vec, [1.0,1,1,1,1,1,1,1]) AS d FROM docs ORDER BY d")


def test_order_by_non_selected_column(sdb):
    """ORDER BY a column absent from the SELECT list: fetched for the
    sort, stripped from the output (standard SQL; the row path used to
    sort on missing keys)."""
    rows = sdb.sql("SELECT body FROM docs ORDER BY price DESC LIMIT 2")
    assert [set(r) for r in rows] == [{"body"}, {"body"}]
    assert rows[0]["body"] == "quiet night sky"  # highest price
    rows = sdb.sql("SELECT DISTINCT body FROM docs ORDER BY id LIMIT 2")
    assert [r["body"] for r in rows] == ["red fox jumps", "lazy dog sleeps"]


def test_order_by_direction_check(sdb):
    with pytest.raises(ms.QueryShapeError):
        sdb.sql(
            "SELECT id, distance(vec, [1.0,1,1,1,1,1,1,1]) AS d "
            "FROM docs ORDER BY d DESC LIMIT 3"
        )


def test_limit_offset(sdb):
    rows = sdb.sql(
        "SELECT id, distance(vec, [0.0,0,0,0,0,0,0,0]) AS d "
        "FROM docs ORDER BY d LIMIT 2 OFFSET 1"
    )
    assert [r["id"] for r in rows] == [1, 2]


def test_batch_distance(sdb):
    rows = sdb.sql(
        "SELECT id, batch_distance(vec, [[0.0,0,0,0,0,0,0,0],[7.0,7,7,7,7,7,7,7]]) AS d "
        "FROM docs ORDER BY d.2 LIMIT 2 BY d.1"
    )
    by_q = {}
    for r in rows:
        by_q.setdefault(r["d"][0], []).append(r["id"])
    assert by_q[0] == [0, 1]
    assert by_q[1] == [7, 6]


def test_textsearch(sdb):
    rows = sdb.sql(
        "SELECT id, body, textsearch(body, 'red dog') AS s "
        "FROM docs ORDER BY s DESC LIMIT 3"
    )
    assert rows[0]["id"] == 6  # contains both terms
    assert all(rows[i]["s"] >= rows[i + 1]["s"] for i in range(len(rows) - 1))
    with pytest.raises(ms.QueryShapeError):
        sdb.sql("SELECT id, textsearch(body, 'red') AS s FROM docs LIMIT 3")


def test_hybridsearch(sdb):
    rows = sdb.sql(
        "SELECT id, hybridsearch('fusion_type=rrf','fusion_k=60')"
        "(vec, body, [6.9,6.9,6.9,6.9,6.9,6.9,6.9,6.9], 'red dog') AS score "
        "FROM docs ORDER BY score DESC LIMIT 3"
    )
    ids = [r["id"] for r in rows]
    # doc 6 matches both legs (nearest-but-one vector + both text terms)
    assert ids[0] == 6
    assert all(rows[i]["score"] >= rows[i + 1]["score"] for i in range(len(rows) - 1))


def test_alter_and_system_tables(sdb):
    sdb.sql("ALTER TABLE docs DROP VECTOR INDEX vidx")
    assert sdb.sql("SELECT * FROM system.vector_indices") == []
    sdb.sql("ALTER TABLE docs ADD VECTOR INDEX v2 vec TYPE IVFFLAT('ncentroids=4')")
    rows = sdb.sql("SELECT name, type, status FROM system.vector_indices")
    assert rows[0]["name"] == "v2" and rows[0]["type"] == "IVFFLAT"
    ev = sdb.sql(
        "SELECT event FROM system.vector_index_event_log WHERE event = 'DefinitionDropped'"
    )
    assert len(ev) >= 1


def test_delete_and_drop(sdb):
    out = sdb.sql("DELETE FROM docs WHERE id IN (0, 1)")
    assert out == []  # ClickHouse DELETE produces no rows
    assert sdb.sql("SELECT count() FROM docs")[0]["count()"] == 6
    sdb.sql("DROP TABLE docs")
    assert "docs" not in sdb.tables()
    sdb.sql("DROP TABLE IF EXISTS docs")  # no error


def test_create_vector_index_statement(db, rng):
    db.sql(
        "CREATE TABLE v2 (id UInt64, vec Array(Float32), "
        "CONSTRAINT c CHECK length(vec) = 4)"
    )
    db.sql("INSERT INTO v2 (id, vec) VALUES (1, [1.0,0,0,0]), (2, [0.0,1,0,0])")
    db.sql("CREATE VECTOR INDEX vi ON v2 vec TYPE MSTG")
    rows = db.sql("SELECT name, type FROM system.vector_indices")
    assert rows[0]["type"] == "MSTG"
    got = db.sql(
        "SELECT id, distance(vec, [1.0,0.1,0,0]) AS d FROM v2 ORDER BY d LIMIT 1"
    )
    assert got[0]["id"] == 1


def test_parse_errors(db):
    with pytest.raises(ms.SQLError):
        db.sql("SELEC 1")
    # constraint-less vector column: CREATE defers until the first INSERT
    # pins the dim (reference behavior for unconstrained Array columns)
    db.sql("CREATE TABLE t_defer (id UInt64, v Array(Float32))")
    assert "t_defer" not in db.tables()
    db.sql("INSERT INTO t_defer VALUES (1, [0.5, 0.25])")
    assert db.table("t_defer").schema.require_vector("v").dim == 2
    with pytest.raises(ms.SQLError):
        db.sql("SELECT id FROM")


def test_optimize_table(sdb):
    sdb.sql("DELETE FROM docs WHERE id = 0")
    assert len(sdb.table("docs").live_segments()) == 1
    # add a second segment then merge via OPTIMIZE
    sdb.sql("INSERT INTO docs (id, body, price, vec) VALUES "
            "(100, 'extra doc', 1.0, [9.0,9,9,9,9,9,9,9])")
    assert len(sdb.table("docs").live_segments()) == 2
    out = sdb.sql("OPTIMIZE TABLE docs FINAL")
    assert out == []  # ClickHouse OPTIMIZE produces no rows
    assert len(sdb.table("docs").live_segments()) == 1
    assert sdb.sql("SELECT count() FROM docs")[0]["count()"] == 8  # 9 - 1 deleted
    rows = sdb.sql("SELECT id, distance(vec, [9.0,9,9,9,9,9,9,9]) AS d "
                   "FROM docs ORDER BY d LIMIT 1")
    assert rows[0]["id"] == 100


def test_sql_aggregates(db):
    db.sql(
        "CREATE TABLE agg (id UInt64, grp Int32, price Float32, "
        "vec Array(Float32), CONSTRAINT c CHECK length(vec) = 4)"
    )
    for i in range(12):
        db.sql(
            f"INSERT INTO agg VALUES ({i}, {i % 3}, {float(i)}, "
            "[0.0, 0.0, 0.0, 0.0])"
        )
    r = db.sql("SELECT count(*), sum(price), avg(price), min(price), max(price) FROM agg")
    assert r == [
        {
            "count()": 12,
            "sum(price)": 66.0,
            "avg(price)": 5.5,
            "min(price)": 0.0,
            "max(price)": 11.0,
        }
    ]
    r = db.sql("SELECT sum(price) AS s FROM agg WHERE id < 4")
    assert r == [{"s": 6.0}]
    r = db.sql(
        "SELECT grp, count(*) AS n, max(price) AS mx FROM agg "
        "GROUP BY grp ORDER BY grp ASC"
    )
    assert r == [
        {"grp": 0, "n": 4, "mx": 9.0},
        {"grp": 1, "n": 4, "mx": 10.0},
        {"grp": 2, "n": 4, "mx": 11.0},
    ]
    r = db.sql(
        "SELECT grp, avg(price) AS a FROM agg GROUP BY grp "
        "ORDER BY a DESC LIMIT 1"
    )
    assert r == [{"grp": 2, "a": 6.5}]
    # empty-result aggregates
    r = db.sql("SELECT sum(price) FROM agg WHERE id > 100")
    assert r == [{"sum(price)": None}]


def test_sql_settings_clause(db, rng):
    d = 8
    db.sql(
        "CREATE TABLE sset (id UInt64, vec Array(Float32), "
        "CONSTRAINT c CHECK length(vec) = 8)"
    )
    t = db.table("sset")
    v = rng.standard_normal((300, d)).astype(np.float32)
    t.insert({"id": np.arange(300, dtype=np.uint64), "vec": v})
    ql = ", ".join(str(float(x)) for x in v[7])
    rows = db.sql(
        f"SELECT id, distance(vec, [{ql}]) AS dd FROM sset "
        "ORDER BY dd ASC LIMIT 3 SETTINGS max_search_result_window=10000, "
        "use_approx_topk=0"
    )
    assert rows[0]["id"] == 7
    # a window cap below LIMIT must reject via the per-query setting
    from myscaledb_tpu.errors import QueryShapeError

    with pytest.raises(QueryShapeError):
        db.sql(
            f"SELECT id, distance(vec, [{ql}]) AS dd FROM sset "
            "ORDER BY dd ASC LIMIT 50 SETTINGS max_search_result_window=10"
        )
    # unknown settings are rejected like the reference
    from myscaledb_tpu.errors import SQLError

    with pytest.raises(SQLError):
        db.sql(
            f"SELECT id, distance(vec, [{ql}]) AS dd FROM sset "
            "ORDER BY dd ASC LIMIT 3 SETTINGS no_such_setting=1"
        )


def test_settings_override_coercion():
    st = ms.Settings()
    out = st.override({"use_approx_topk": "true", "default_topk": "50",
                       "hybrid_search_fusion_weight": "0.25",
                       "vector_index_cache_size": "1000"})
    assert out.query.use_approx_topk is True
    assert out.query.default_topk == 50
    assert abs(out.query.hybrid_search_fusion_weight - 0.25) < 1e-9
    assert out.server.vector_index_cache_size == 1000
    assert st.query.default_topk != 50  # original untouched
    with pytest.raises(ValueError):
        st.override({"no_such": 1})
    with pytest.raises(ValueError):
        st.override({"use_approx_topk": "yes"})  # ambiguous bool string


def test_sql_group_by_multiple_keys(db):
    db.sql(
        "CREATE TABLE mk (id UInt64, a UInt64, b UInt64, price Float32, "
        "vec Array(Float32), CONSTRAINT c CHECK length(vec)=4) "
        "ENGINE=MergeTree"
    )
    for i in range(12):
        db.sql(
            f"INSERT INTO mk VALUES ({i}, {i % 2}, {i % 3}, {float(i)}, "
            "[0.0, 0.0, 0.0, 0.0])"
        )
    r = db.sql(
        "SELECT a, b, count(*) AS n, sum(price) AS s FROM mk "
        "GROUP BY a, b ORDER BY a ASC, b ASC"
    )
    # 2x3 key grid, 2 rows each; verify one group exactly: a=0,b=0 ->
    # ids 0 and 6 -> sum 6.0
    assert len(r) == 6
    assert r[0] == {"a": 0, "b": 0, "n": 2, "s": 6.0}
    assert all(row["n"] == 2 for row in r)
    # HAVING over a multi-key grouping
    r = db.sql(
        "SELECT a, b, sum(price) AS s FROM mk GROUP BY a, b "
        "HAVING s > 12 ORDER BY s DESC"
    )
    assert all(row["s"] > 12 for row in r) and len(r) == 2


def test_sql_uniq_any_aggregates(db):
    db.sql(
        "CREATE TABLE ua (id UInt64, g UInt64, v UInt64, vec Array(Float32), "
        "CONSTRAINT c CHECK length(vec)=4) ENGINE=MergeTree"
    )
    for i in range(20):
        db.sql(
            f"INSERT INTO ua VALUES ({i}, {i % 2}, {i % 5}, [0.0,0.0,0.0,0.0])"
        )
    r = db.sql("SELECT uniq(v) AS u, uniqExact(v) AS ue, any(v) AS a FROM ua")
    assert r == [{"u": 5, "ue": 5, "a": 0}]
    r = db.sql(
        "SELECT g, uniq(v) AS u, any(id) AS first_id FROM ua "
        "GROUP BY g ORDER BY g"
    )
    # g=0 rows are even ids: v in {0,2,4,1,3} -> 5 distinct; first id 0
    assert r == [
        {"g": 0, "u": 5, "first_id": 0},
        {"g": 1, "u": 5, "first_id": 1},
    ]
    # HAVING over an inline-spelled uniq
    r = db.sql("SELECT g, uniq(v) AS u FROM ua GROUP BY g HAVING u >= 5")
    assert len(r) == 2
    # uniq OVER (...) is not a window function
    import pytest
    from myscaledb_tpu.errors import SQLError
    with pytest.raises(SQLError):
        db.sql("SELECT uniq(v) OVER (PARTITION BY g) FROM ua")


def test_sql_grouped_fast_matches_oracle(db, rng):
    """The vectorized GROUP BY path returns exactly what the tuple-loop
    oracle returns on randomized multi-key input."""
    import numpy as np
    import myscaledb_tpu as ms
    from myscaledb_tpu.sql import runner as R

    t = db.create_table(
        "gf",
        ms.Schema({
            "id": ms.UInt64(), "a": ms.UInt64(), "b": ms.UInt64(),
            "x": ms.Float32(),
        }),
    )
    n = 5000
    t.insert({
        "id": np.arange(n, dtype=np.uint64),
        "a": rng.integers(0, 7, n).astype(np.uint64),
        "b": rng.integers(0, 11, n).astype(np.uint64),
        "x": rng.standard_normal(n).astype(np.float32),
    })
    q = (
        "SELECT a, b, count(*) AS n, sum(x) AS s, min(x) AS lo, "
        "max(x) AS hi, avg(x) AS m, uniq(b) AS u, any(id) AS f "
        "FROM gf GROUP BY a, b ORDER BY a, b"
    )
    fast = db.sql(q)
    # Class-attribute access unwraps staticmethod to a plain function; restore
    # the original descriptor from __dict__ or it rebinds as an instance method.
    orig = R.SQLRunner.__dict__["_grouped_fast"]
    R.SQLRunner._grouped_fast = staticmethod(lambda *a, **k: None)
    try:
        slow = db.sql(q)
    finally:
        R.SQLRunner._grouped_fast = orig
    assert len(fast) == len(slow) == 77
    for rf, rs in zip(fast, slow):
        assert rf.keys() == rs.keys()
        for k in rf:
            if isinstance(rf[k], float):
                assert abs(rf[k] - rs[k]) < 1e-9, (k, rf, rs)
            else:
                assert rf[k] == rs[k], (k, rf, rs)
