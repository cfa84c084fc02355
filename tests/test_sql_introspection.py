"""SHOW TABLES / SHOW CREATE TABLE / DESCRIBE / EXPLAIN statements.

Reference analogues: ClickHouse introspection statements; EXPLAIN
surfaces the per-segment index-vs-scan routing decision (fallbackToFlat
/ cost_based_index_routing) that is otherwise only in profile_events.
"""

import numpy as np

import myscaledb_tpu as ms


def _mk(db, rng, with_index=True):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        "intro_t",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(32)}),
        settings=st,
    )
    n = 2000
    t.insert({
        "id": np.arange(n, dtype=np.uint64),
        "vec": rng.standard_normal((n, 32)).astype(np.float32),
    })
    if with_index:
        t.add_vector_index("v", "vec", type="HNSWFLAT", m=16, metric_type="L2")
        assert t.wait_index_built()
    return t


def test_show_tables(db, rng):
    _mk(db, rng, with_index=False)
    names = [r["name"] for r in db.sql("SHOW TABLES")]
    assert "intro_t" in names


def test_describe(db, rng):
    _mk(db, rng, with_index=False)
    rows = db.sql("DESCRIBE intro_t")
    byname = {r["name"]: r["type"] for r in rows}
    assert set(byname) == {"id", "vec"}
    assert "32" in byname["vec"]


def test_show_create_table(db, rng):
    _mk(db, rng)
    stmt = db.sql("SHOW CREATE TABLE intro_t")[0]["statement"]
    assert "CREATE TABLE intro_t" in stmt
    assert "VECTOR INDEX v vec TYPE HNSWFLAT" in stmt
    assert "ENGINE = MergeTree" in stmt


def test_explain_routing(db, rng):
    _mk(db, rng)
    rows = db.sql(
        "EXPLAIN SELECT id, distance(vec, [0.0]) AS d FROM intro_t "
        "ORDER BY d LIMIT 5"
    )
    text = "\n".join(r["explain"] for r in rows)
    assert "ReadFromTable intro_t" in text
    assert "distance(vec)" in text
    # small corpus: the cost model must route the graph index to the scan
    assert "exact scan (cost route)" in text
    assert "Limit 5" in text


def test_explain_plain_select(db, rng):
    _mk(db, rng, with_index=False)
    rows = db.sql("EXPLAIN SELECT id FROM intro_t WHERE id < 5 LIMIT 3")
    text = "\n".join(r["explain"] for r in rows)
    assert "ReadFromTable" in text and "Prefilter" in text


# ------------------------------------------- DISTINCT / TRUNCATE / RENAME
def test_select_distinct(db):
    db.sql("CREATE TABLE dup_t (x UInt64, y UInt64)")
    db.sql("INSERT INTO dup_t VALUES (1, 2), (1, 2), (3, 4), (1, 2)")
    rows = db.sql("SELECT DISTINCT x, y FROM dup_t ORDER BY x")
    assert rows == [{"x": 1, "y": 2}, {"x": 3, "y": 4}]
    rows = db.sql("SELECT x, y FROM dup_t")
    assert len(rows) == 4  # without DISTINCT all rows come back


def test_truncate_table(db):
    db.sql("CREATE TABLE tr_t (x UInt64)")
    db.sql("INSERT INTO tr_t VALUES (1), (2)")
    db.sql("TRUNCATE TABLE tr_t")
    assert db.sql("SELECT count() FROM tr_t") == [{"count()": 0}]
    db.sql("INSERT INTO tr_t VALUES (9)")  # table stays usable
    assert db.sql("SELECT x FROM tr_t") == [{"x": 9}]


def test_rename_table(db):
    db.sql("CREATE TABLE rn_a (x UInt64)")
    db.sql("INSERT INTO rn_a VALUES (5)")
    db.sql("RENAME TABLE rn_a TO rn_b")
    assert db.sql("SELECT x FROM rn_b") == [{"x": 5}]
    names = [r["name"] for r in db.sql("SHOW TABLES")]
    assert "rn_b" in names and "rn_a" not in names


def test_insert_select(db):
    db.sql("CREATE TABLE ins_a (x UInt64, y Float32)")
    db.sql("INSERT INTO ins_a VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    db.sql("CREATE TABLE ins_b (x UInt64, y Float32)")
    db.sql("INSERT INTO ins_b SELECT x, y FROM ins_a WHERE y > 2.0")
    rows = db.sql("SELECT x FROM ins_b ORDER BY x")
    assert [r["x"] for r in rows] == [2, 3]
    # CTE-driven insert too
    db.sql(
        "INSERT INTO ins_b WITH big AS (SELECT x, y FROM ins_a WHERE x == 1) "
        "SELECT x, y FROM big"
    )
    assert len(db.sql("SELECT x FROM ins_b")) == 3


def test_backup_restore(db, tmp_path):
    db.sql("CREATE TABLE bk_t (id UInt64, v Float32)")
    db.sql("INSERT INTO bk_t VALUES (1, 1.5), (2, 2.5)")
    dest = str(tmp_path / "bk")
    db.sql(f"BACKUP TABLE bk_t TO '{dest}'")
    db.sql("DROP TABLE bk_t")
    db.sql(f"RESTORE TABLE bk_t FROM '{dest}'")
    rows = db.sql("SELECT id, v FROM bk_t ORDER BY id")
    assert [r["id"] for r in rows] == [1, 2]


def test_explain_respects_settings_overlay(db, rng):
    _mk(db, rng)
    on = "\n".join(
        r["explain"] for r in db.sql(
            "EXPLAIN SELECT id, distance(vec, [0.0]) AS d FROM intro_t "
            "ORDER BY d LIMIT 5"
        )
    )
    off = "\n".join(
        r["explain"] for r in db.sql(
            "EXPLAIN SELECT id, distance(vec, [0.0]) AS d FROM intro_t "
            "ORDER BY d LIMIT 5 SETTINGS cost_based_index_routing=0"
        )
    )
    assert "exact scan (cost route)" in on
    assert "exact scan (cost route)" not in off and "HNSWFLAT search" in off
