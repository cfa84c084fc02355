"""SQL expression tail: scalar expressions in SELECT, ORDER BY
expressions, HAVING, and ORDER BY over an expression of several
distance() aliases.

The reference inherits full ClickHouse SQL (ExpressionAnalyzer /
ExpressionActions); this covers the arithmetic/function forms the
vector-search tests actually use (round() over a distance alias,
price arithmetic, HAVING over aggregates — e.g. the post-processing in
tests/queries/2_vector_search/*)."""

import numpy as np
import pytest

import myscaledb_tpu as ms


@pytest.fixture()
def edb(db):
    db.sql(
        """
        CREATE TABLE ex (
            id UInt64, price Float32, grp UInt64, vec Array(Float32),
            CONSTRAINT c CHECK length(vec) = 4,
            VECTOR INDEX v1 vec TYPE FLAT('metric_type=L2')
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    rows = ", ".join(
        f"({i}, {i * 10}.0, {i % 3}, {[float(i)] * 4})" for i in range(9)
    )
    db.sql(f"INSERT INTO ex (id, price, grp, vec) VALUES {rows}")
    return db


def test_select_arithmetic_plain(edb):
    rows = edb.sql("SELECT id, price * 2 AS p2 FROM ex WHERE id < 4 ORDER BY id")
    assert [r["p2"] for r in rows] == [0.0, 20.0, 40.0, 60.0]
    # the raw helper column must not leak into the output
    assert set(rows[0]) == {"id", "p2"}


def test_select_unaliased_expression_name(edb):
    rows = edb.sql("SELECT id, price + 1 FROM ex WHERE id = 2")
    assert rows == [{"id": 2, "price + 1": 21.0}]


def test_order_by_expression_plain(edb):
    rows = edb.sql("SELECT id FROM ex WHERE id < 4 ORDER BY -id")
    assert [r["id"] for r in rows] == [3, 2, 1, 0]


def test_math_functions(edb):
    rows = edb.sql(
        "SELECT id, round(sqrt(price), 2) AS s, least(price, 25) AS l "
        "FROM ex WHERE id IN (1, 4) ORDER BY id"
    )
    assert rows[0]["s"] == round(np.sqrt(10.0), 2)
    assert rows[1]["l"] == 25
    assert rows[0]["l"] == 10.0


def test_expression_over_distance_alias(edb):
    rows = edb.sql(
        "SELECT id, round(d, 2) AS rd, "
        "distance(vec, [2.1,2.1,2.1,2.1]) AS d "
        "FROM ex ORDER BY d ASC LIMIT 3"
    )
    assert [r["id"] for r in rows] == [2, 3, 1]
    for r in rows:
        assert r["rd"] == round(r["d"], 2)


def test_having_alias_and_inline(edb):
    rows = edb.sql(
        "SELECT grp, count() AS c FROM ex GROUP BY grp HAVING c >= 3 ORDER BY grp"
    )
    assert [r["grp"] for r in rows] == [0, 1, 2]
    rows = edb.sql(
        "SELECT grp, sum(price) FROM ex GROUP BY grp "
        "HAVING sum(price) > 100 ORDER BY grp"
    )
    assert [(r["grp"], r["sum(price)"]) for r in rows] == [(1, 120.0), (2, 150.0)]


def test_having_global_aggregate(edb):
    assert edb.sql("SELECT count() AS c FROM ex HAVING c > 100") == []
    assert edb.sql("SELECT count() AS c FROM ex HAVING c > 5") == [{"c": 9}]


def test_having_without_aggregation_rejected(edb):
    with pytest.raises(ms.SQLError):
        edb.sql("SELECT id FROM ex HAVING id > 3")


def test_expression_in_subquery_projection(edb):
    rows = edb.sql(
        "SELECT id, d * 2 AS dd FROM "
        "(SELECT id, distance(vec, [2.1,2.1,2.1,2.1]) AS d "
        " FROM ex ORDER BY d ASC LIMIT 3) ORDER BY dd"
    )
    assert [r["id"] for r in rows] == [2, 3, 1]
    assert rows[0]["dd"] == pytest.approx(4 * 0.1**2 * 2, abs=1e-3)


@pytest.fixture()
def mdb(db):
    db.sql(
        """
        CREATE TABLE mx (
            id UInt64, v1 Array(Float32), v2 Array(Float32),
            CONSTRAINT c1 CHECK length(v1) = 4,
            CONSTRAINT c2 CHECK length(v2) = 4,
            VECTOR INDEX i1 v1 TYPE FLAT('metric_type=L2'),
            VECTOR INDEX i2 v2 TYPE FLAT('metric_type=L2')
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    rows = ", ".join(
        f"({i}, {[float(i)] * 4}, {[float(9 - i)] * 4})" for i in range(10)
    )
    db.sql(f"INSERT INTO mx (id, v1, v2) VALUES {rows}")
    return db


def test_multi_distance_order_by_expression(mdb):
    q = "[4.0,4.0,4.0,4.0]"
    rows = mdb.sql(
        f"SELECT id, distance(v1, {q}) AS d1, distance(v2, {q}) AS d2 "
        "FROM mx ORDER BY d1 + 0.5 * d2 ASC LIMIT 4"
    )
    d1 = np.array([(i - 4.0) ** 2 * 4 for i in range(10)])
    d2 = np.array([((9 - i) - 4.0) ** 2 * 4 for i in range(10)])
    want = list(np.argsort(d1 + 0.5 * d2, kind="stable")[:4])
    assert [r["id"] for r in rows] == want
    for r in rows:
        assert r["d1"] == pytest.approx(d1[r["id"]], rel=1e-3)
        assert r["d2"] == pytest.approx(d2[r["id"]], rel=1e-3)


def test_multi_distance_expression_rejects_foreign_columns(mdb):
    q = "[4.0,4.0,4.0,4.0]"
    with pytest.raises(ms.QueryShapeError):
        mdb.sql(
            f"SELECT id, distance(v1, {q}) AS d1, distance(v2, {q}) AS d2 "
            "FROM mx ORDER BY d1 + id ASC LIMIT 4"
        )


# ---------------------------------------------------------------- CTEs
def test_with_cte_basic(db):
    db.sql("CREATE TABLE cte_t (id UInt64, v Float32)")
    db.sql("INSERT INTO cte_t VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    rows = db.sql(
        "WITH big AS (SELECT id, v FROM cte_t WHERE v > 15) "
        "SELECT id FROM big ORDER BY id"
    )
    assert [r["id"] for r in rows] == [2, 3]


def test_with_cte_chained_and_join(db):
    db.sql("CREATE TABLE cte_a (id UInt64, x Float32)")
    db.sql("INSERT INTO cte_a VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    rows = db.sql(
        "WITH big AS (SELECT id, x FROM cte_a WHERE x > 1), "
        "biggest AS (SELECT id, x FROM big WHERE x > 2) "
        "SELECT cte_a.id AS id, biggest.x AS bx FROM cte_a "
        "JOIN biggest ON cte_a.id = biggest.id"
    )
    assert len(rows) == 1 and rows[0]["id"] == 3 and rows[0]["bx"] == 3.0


def test_with_cte_referenced_twice(db):
    db.sql("CREATE TABLE cte_b (id UInt64, x Float32)")
    db.sql("INSERT INTO cte_b VALUES (1, 5.0), (2, 6.0)")
    rows = db.sql(
        "WITH s AS (SELECT id, x FROM cte_b) "
        "SELECT s.id AS id, r.x AS rx FROM s JOIN s AS r ON s.id = r.id "
        "ORDER BY id"
    )
    assert [r["id"] for r in rows] == [1, 2]
    assert [r["rx"] for r in rows] == [5.0, 6.0]


# ----------------------------------------------- review-fix regressions
def test_order_by_scalar_alias_plain_scan(db):
    db.sql("CREATE TABLE exp_ord (id UInt64, price Float32)")
    db.sql("INSERT INTO exp_ord VALUES (1, 3.0), (2, 1.0), (3, 2.0)")
    rows = db.sql(
        "SELECT id, price * 2 AS p2 FROM exp_ord ORDER BY p2 DESC"
    )
    assert [r["id"] for r in rows] == [1, 3, 2]
    assert rows[0]["p2"] == 6.0


def test_having_mixed_alias_and_inline(db):
    db.sql("CREATE TABLE exp_hav (grp UInt64, x Float32)")
    db.sql(
        "INSERT INTO exp_hav VALUES (1, 1.0), (1, 2.0), (2, 5.0)"
    )
    # SELECT uses an alias; HAVING uses the inline form
    rows = db.sql(
        "SELECT grp, count() AS c FROM exp_hav GROUP BY grp "
        "HAVING count() >= 2"
    )
    assert len(rows) == 1 and rows[0]["grp"] == 1 and rows[0]["c"] == 2
    # SELECT uses the inline form; HAVING uses sum(x)
    rows = db.sql(
        "SELECT grp, sum(x) FROM exp_hav GROUP BY grp HAVING sum(x) > 4"
    )
    assert len(rows) == 1 and rows[0]["grp"] == 2
