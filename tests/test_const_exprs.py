"""Analysis-time const expressions: query vectors built from lambdas
(arrayMap/range), scalar WITH aliases, scalar subqueries, FROM-less
SELECT, tuple ORDER BY, and default vector-index types.

Reference analogues: ExpressionAnalyzer.cpp:902-944 (const folding of
query vectors), 00036_mqvs_with_clause_process_function.sql,
00041_mqvs_support_create_default_index.sql."""

import numpy as np
import pytest


@pytest.fixture()
def tdb(db):
    db.sql(
        """
        CREATE TABLE cx (
            id UInt32,
            vector Array(Float32),
            CONSTRAINT check_length CHECK length(vector) = 3
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    vals = ", ".join(f"({i}, [{i}.0, {i}.0, {i}.0])" for i in range(50))
    db.sql(f"INSERT INTO cx (id, vector) VALUES {vals}")
    return db


def test_arraymap_range_query_vector(tdb):
    got = tdb.sql(
        "SELECT id, distance(vector, arrayMap(x -> (x / 1.), range(1, 4))) AS d "
        "FROM cx ORDER BY (d, id) LIMIT 5"
    )
    want = tdb.sql(
        "SELECT id, distance(vector, [1.0, 2.0, 3.0]) AS d "
        "FROM cx ORDER BY d, id LIMIT 5"
    )
    assert [r["id"] for r in got] == [r["id"] for r in want]
    np.testing.assert_allclose(
        [r["d"] for r in got], [r["d"] for r in want], rtol=1e-6
    )


def test_lambda_with_if_and_modulo(tdb):
    # arrayMap(x -> ((x / 100.) * if((x % 2) = 0, -1, 1)), range(1, 4))
    # == [0.01, -0.02, 0.03]
    got = tdb.sql(
        "WITH (arrayMap(x -> ((x / 100.) * if((x % 2) = 0, -1, 1)), range(1, 4))) "
        "AS generated_vector "
        "SELECT id, distance(vector, generated_vector) AS d "
        "FROM cx ORDER BY (d, id) ASC LIMIT 3"
    )
    want = tdb.sql(
        "SELECT id, distance(vector, [0.01, -0.02, 0.03]) AS d "
        "FROM cx ORDER BY d, id LIMIT 3"
    )
    assert [r["id"] for r in got] == [r["id"] for r in want]
    np.testing.assert_allclose(
        [r["d"] for r in got], [r["d"] for r in want], rtol=1e-5
    )


def test_scalar_with_alias_visible_in_subquery(tdb):
    got = tdb.sql(
        "WITH (SELECT arrayMap(x -> (x / 1.), range(1, 4))) AS target_vector "
        "SELECT id FROM (SELECT id, distance(vector, target_vector) AS dist "
        "FROM cx ORDER BY (dist, id) LIMIT 5)"
    )
    want = tdb.sql(
        "SELECT id FROM (SELECT id, distance(vector, [1.0, 2.0, 3.0]) AS dist "
        "FROM cx ORDER BY dist, id LIMIT 5)"
    )
    assert [r["id"] for r in got] == [r["id"] for r in want]


def test_with_array_literal_alias(tdb):
    got = tdb.sql(
        "WITH [1.0, 1.0, 1.0] AS qv "
        "SELECT id, distance(vector, qv) AS d FROM cx ORDER BY d LIMIT 2"
    )
    assert got[0]["id"] == 1 and got[0]["d"] == pytest.approx(0.0)


def test_with_scalar_alias_in_select_expression(tdb):
    got = tdb.sql(
        "WITH 10.0 AS off "
        "SELECT id, distance(vector, [0.0, 0.0, 0.0]) AS d, d + off AS dd "
        "FROM cx ORDER BY d LIMIT 2"
    )
    assert got[0]["id"] == 0
    assert got[0]["dd"] == pytest.approx(10.0)


def test_tuple_order_by_breaks_ties(tdb):
    # vector [2,2,2] is equidistant from rows 1 and 3; (d, id) must order
    # deterministically by id within the tie
    rows = tdb.sql(
        "SELECT id, distance(vector, [2.0, 2.0, 2.0]) AS d "
        "FROM cx ORDER BY (d, id) LIMIT 3"
    )
    assert [r["id"] for r in rows] == [2, 1, 3]


def test_fromless_select():
    import myscaledb_tpu as ms

    db = ms.connect()
    try:
        assert db.sql("SELECT 1") == [{"1": 1}]
        rows = db.sql("SELECT 2 + 3 AS five, range(1, 4) AS arr")
        assert rows == [{"five": 5, "arr": [1, 2, 3]}]
    finally:
        db.close()


def test_default_index_types(db):
    db.sql(
        """
        CREATE TABLE didx (
            id UInt32,
            v Array(Float32),
            w FixedString(2),
            CONSTRAINT cv CHECK length(v) = 4,
            VECTOR INDEX vi_v v,
            VECTOR INDEX vi_w w
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    rows = db.sql(
        "SELECT name, type FROM system.vector_indices WHERE table = 'didx'"
    )
    types = {r["name"]: r["type"] for r in rows}
    assert types["vi_v"] == "MSTG"
    assert types["vi_w"] == "BinaryMSTG"


def test_default_index_alter_and_create_forms(db):
    db.sql(
        """
        CREATE TABLE didx2 (
            id UInt32,
            v Array(Float32),
            v2 Array(Float32),
            CONSTRAINT cv CHECK length(v) = 4,
            CONSTRAINT cv2 CHECK length(v2) = 4
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    db.sql("ALTER TABLE didx2 ADD VECTOR INDEX vi v TYPE default('metric_type=IP')")
    db.sql("CREATE VECTOR INDEX vi2 ON didx2 v2")
    rows = db.sql(
        "SELECT name, type FROM system.vector_indices WHERE table = 'didx2'"
    )
    types = {r["name"]: r["type"] for r in rows}
    assert types == {"vi": "MSTG", "vi2": "MSTG"}


def test_uint32_columns_accepted(db):
    db.sql("CREATE TABLE u32 (id UInt32, n UInt8) ENGINE = MergeTree ORDER BY id")
    db.sql("INSERT INTO u32 (id, n) VALUES (1, 7), (2, 9)")
    rows = db.sql("SELECT id, n FROM u32 ORDER BY id")
    assert [r["n"] for r in rows] == [7, 9]


def test_where_on_distance_alias(tdb):
    # d = 3*(i-0.1)^2 -> only rows 0 and 1 are under 10
    rows = tdb.sql(
        "SELECT id, distance(vector, [0.1, 0.1, 0.1]) AS d "
        "FROM cx WHERE d < 10 ORDER BY d LIMIT 10"
    )
    assert [r["id"] for r in rows] == [0, 1]
    assert all(r["d"] < 10 for r in rows)


def test_where_mixes_alias_and_column_conjunction(tdb):
    rows = tdb.sql(
        "SELECT id, distance(vector, [0.1, 0.1, 0.1]) AS d "
        "FROM cx WHERE d < 30 AND id > 0 ORDER BY d LIMIT 10"
    )
    # d = 3*(i-0.1)^2: i=1 -> 2.43, i=2 -> 10.83, i=3 -> 25.23, i=4 -> 45.6
    assert [r["id"] for r in rows] == [1, 2, 3]


def test_where_alias_inside_or_rejected(tdb):
    import pytest as _pytest

    from myscaledb_tpu.errors import SQLError

    with _pytest.raises(SQLError):
        tdb.sql(
            "SELECT id, distance(vector, [0.1, 0.1, 0.1]) AS d "
            "FROM cx WHERE d < 10 OR id > 5 ORDER BY d LIMIT 10"
        )


def test_detach_attach_in_memory(tdb):
    from myscaledb_tpu.errors import SchemaError

    tdb.sql("DETACH TABLE cx")
    with pytest.raises(SchemaError):
        tdb.sql("SELECT id FROM cx LIMIT 1")
    tdb.sql("ATTACH TABLE cx")
    assert tdb.sql("SELECT count() FROM cx") == [{"count()": 50}]


def test_detach_attach_persisted_roundtrip(tmp_path):
    import myscaledb_tpu as ms

    db = ms.connect(path=str(tmp_path))
    try:
        db.sql(
            "CREATE TABLE pt (id UInt32, vector Array(Float32), "
            "CONSTRAINT c CHECK length(vector) = 3) ENGINE = MergeTree ORDER BY id"
        )
        db.sql("ALTER TABLE pt ADD VECTOR INDEX vi vector TYPE FLAT")
        db.sql("INSERT INTO pt (id, vector) VALUES (1, [1.0,1.0,1.0]), (2, [2.0,2.0,2.0])")
        before = db.sql(
            "SELECT id, distance(vector, [0.1,0.1,0.1]) AS d FROM pt "
            "WHERE d < 10 ORDER BY d LIMIT 10"
        )
        db.sql("DETACH TABLE pt")
        db.sql("ATTACH TABLE pt")  # deserializes from the checkpoint
        after = db.sql(
            "SELECT id, distance(vector, [0.1,0.1,0.1]) AS d FROM pt "
            "WHERE d < 10 ORDER BY d LIMIT 10"
        )
        assert before == after
    finally:
        db.close()


def test_create_table_settings_and_modify_setting(db):
    # 00038_mqvs_brute_force_setting.sql: min_rows_to_build_vector_index=0
    # makes the 10-row segment "large"; with brute force off the segment
    # is SKIPPED (empty result, not an error), and MODIFY SETTING turning
    # it back into a small part restores the scan.
    db.sql(
        "CREATE TABLE bfset (id UInt32, vector Array(Float32), "
        "CONSTRAINT c CHECK length(vector) = 3) ENGINE = MergeTree "
        "ORDER BY id SETTINGS min_rows_to_build_vector_index = 0"
    )
    assert db.table("bfset").settings.table.min_rows_to_build_vector_index == 0
    assert db.settings.table.min_rows_to_build_vector_index != 0  # no leak
    vals = ", ".join(f"({i}, [{i}.0,{i}.0,{i}.0])" for i in range(10))
    db.sql(f"INSERT INTO bfset (id, vector) VALUES {vals}")
    q = (
        "SELECT id, distance(vector, [1.0,1.0,1.0]) AS dist FROM bfset "
        "ORDER BY dist, id LIMIT 5 SETTINGS enable_brute_force_vector_search = {}"
    )
    assert db.sql(q.format(0)) == []
    assert [r["id"] for r in db.sql(q.format(1))] == [1, 0, 2, 3, 4]
    db.sql("ALTER TABLE bfset MODIFY SETTING min_rows_to_build_vector_index = 1000")
    # small part: brute force always allowed
    assert [r["id"] for r in db.sql(q.format(0))] == [1, 0, 2, 3, 4]


def test_modify_setting_rejects_unknown(db):
    db.sql("CREATE TABLE ms1 (id UInt64) ENGINE = MergeTree ORDER BY id")
    with pytest.raises(Exception, match="not_a_real_setting"):
        db.sql("ALTER TABLE ms1 MODIFY SETTING not_a_real_setting = 1")


def test_numbers_table_function(db):
    # numbers(N) / numbers(start, N): the generator every reference test
    # feeds INSERT ... SELECT from
    assert db.sql("SELECT number FROM numbers(3)") == [
        {"number": 0}, {"number": 1}, {"number": 2}
    ]
    assert db.sql("SELECT number FROM numbers(5, 2)") == [
        {"number": 5}, {"number": 6}
    ]
    rows = db.sql("SELECT number * 2 AS n2 FROM numbers(3) ORDER BY n2 DESC")
    assert [r["n2"] for r in rows] == [4, 2, 0]
    assert db.sql("SELECT sum(number) AS s FROM numbers(10)") == [{"s": 45.0}]


def test_insert_select_from_numbers(db):
    db.sql(
        "CREATE TABLE nt (id UInt32, vector Array(Float32), "
        "CONSTRAINT c CHECK length(vector) = 3) ENGINE = MergeTree ORDER BY id"
    )
    db.sql("INSERT INTO nt SELECT number, [number, number, number] FROM numbers(100)")
    assert db.sql("SELECT count() FROM nt") == [{"count()": 100}]
    rows = db.sql(
        "SELECT id, distance(vector, [1.0,1.0,1.0]) AS d FROM nt "
        "ORDER BY d, id LIMIT 3"
    )
    assert [r["id"] for r in rows] == [1, 0, 2]


def test_binary_query_constructors(db):
    # char()/unhex()/unbin() binary query vectors
    # (00038_mqvs_binary_vector_feature.sql)
    db.sql("CREATE TABLE tbin (id UInt32, vector FixedString(4)) ENGINE = MergeTree ORDER BY id")
    db.sql("INSERT INTO tbin SELECT number, char(number, number, number, number) FROM numbers(256)")
    rows = db.sql(
        "SELECT id, distance(vector, char(100, 101, 102, 103)) AS dist "
        "FROM tbin ORDER BY dist, id LIMIT 3"
    )
    assert [r["id"] for r in rows] == [100, 101, 102]
    top = db.sql(
        "SELECT id, distance(vector, unhex('64646464')) AS dist "
        "FROM tbin ORDER BY dist LIMIT 1"
    )
    assert top[0]["id"] == 100 and top[0]["dist"] == 0.0
    top = db.sql(
        "SELECT id, distance(vector, unbin('01100100011001000110010001100100')) "
        "AS dist FROM tbin ORDER BY dist LIMIT 1"
    )
    assert top[0]["id"] == 100 and top[0]["dist"] == 0.0
    rows = db.sql(
        "SELECT id, batch_distance(vector, [unhex('FFFFFFFF'), char(0, 255, 1, 254)]) "
        "AS dist FROM tbin ORDER BY dist LIMIT 1 BY dist.1"
    )
    assert rows[0]["id"] == 255 and rows[0]["dist"] == (0, 0.0)


def test_set_session_settings(db):
    # `SET k = v` session settings, applied under per-query SETTINGS
    db.sql(
        "CREATE TABLE sset (id UInt32, vector Array(Float32), "
        "CONSTRAINT c CHECK length(vector) = 3) ENGINE = MergeTree "
        "ORDER BY id SETTINGS min_rows_to_build_vector_index = 0"
    )
    db.sql("INSERT INTO sset SELECT number, [number, number, number] FROM numbers(10)")
    q = "SELECT id, distance(vector, [1.0,1.0,1.0]) AS d FROM sset ORDER BY d LIMIT 2"
    db.sql("SET enable_brute_force_vector_search = 0")
    assert db.sql(q) == []  # session default: skip index-less large part
    # the per-query clause wins over the session SET
    assert len(db.sql(q + " SETTINGS enable_brute_force_vector_search = 1")) == 2
    db.sql("SET enable_brute_force_vector_search = 1")
    assert len(db.sql(q)) == 2
    with pytest.raises(Exception, match="nonsense"):
        db.sql("SET nonsense_setting = 1")
