"""Regressions for the round-3 second review batch (SQL statement tail,
rename/truncate/backup persistence interactions, EXPLAIN side effects)."""

import os

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import SQLError


def test_insert_select_expr_before_plain_column(db):
    # values must map by STATEMENT order even when a scalar expression
    # precedes a plain column (row dicts put expression aliases last)
    db.sql("CREATE TABLE ro_src (id UInt64, price Float32)")
    db.sql("INSERT INTO ro_src VALUES (7, 3.0)")
    db.sql("CREATE TABLE ro_dst (a Float32, b UInt64)")
    db.sql("INSERT INTO ro_dst SELECT price * 2 AS p, id FROM ro_src")
    rows = db.sql("SELECT a, b FROM ro_dst")
    assert rows == [{"a": 6.0, "b": 7}]


def test_distinct_before_limit(db):
    db.sql("CREATE TABLE dl_t (x UInt64)")
    db.sql("INSERT INTO dl_t VALUES (1), (1), (2)")
    rows = db.sql("SELECT DISTINCT x FROM dl_t ORDER BY x LIMIT 2")
    assert rows == [{"x": 1}, {"x": 2}]


def test_insert_select_distinct(db):
    db.sql("CREATE TABLE dd_s (x UInt64)")
    db.sql("INSERT INTO dd_s VALUES (5), (5), (6)")
    db.sql("CREATE TABLE dd_d (x UInt64)")
    db.sql("INSERT INTO dd_d SELECT DISTINCT x FROM dd_s")
    assert len(db.sql("SELECT x FROM dd_d")) == 2


def test_having_unknown_name_raises(db):
    db.sql("CREATE TABLE hu_t (grp UInt64, x Float32)")
    db.sql("INSERT INTO hu_t VALUES (1, 1.0), (2, 5.0)")
    with pytest.raises(SQLError, match="HAVING references unknown"):
        db.sql(
            "SELECT grp, count() FROM hu_t GROUP BY grp HAVING sum(x) > 4"
        )


def test_rename_persists_under_new_name(tmp_path):
    d = str(tmp_path / "db")
    db = ms.connect(path=d)
    db.sql("CREATE TABLE rn_p (x UInt64)")
    db.sql("INSERT INTO rn_p VALUES (3)")
    db.table("rn_p").persist()
    db.sql("RENAME TABLE rn_p TO rn_q")
    db.table("rn_q").persist()
    db.close()

    db2 = ms.connect(path=d)
    db2.load_table("rn_q")
    assert db2.sql("SELECT x FROM rn_q") == [{"x": 3}]
    assert not os.path.exists(os.path.join(d, "rn_p"))
    db2.close()


def test_truncate_does_not_resurrect_after_persist(tmp_path):
    d = str(tmp_path / "db")
    db = ms.connect(path=d)
    db.sql("CREATE TABLE tp_t (x UInt64)")
    db.sql("INSERT INTO tp_t VALUES (1), (2)")
    db.table("tp_t").persist()
    db.sql("TRUNCATE TABLE tp_t")
    db.sql("INSERT INTO tp_t VALUES (9)")
    db.table("tp_t").persist()
    db.close()

    db2 = ms.connect(path=d)
    db2.load_table("tp_t")
    rows = db2.sql("SELECT x FROM tp_t")
    assert rows == [{"x": 9}]  # truncated rows must not come back
    db2.close()


def test_truncate_replicates(tmp_path, rng):
    from tests.test_data_replication import DIM, _pair, _rows

    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 32))
        assert b.sync() >= 1 and t_b.n_rows == 32
        t_a.truncate()
        assert b.sync() >= 1
        assert t_b.n_rows == 0
        # post-truncate inserts replicate normally
        t_a.insert(_rows(rng, 8, base=100))
        assert b.sync() >= 1 and t_b.n_rows == 8
    finally:
        a.close(); b.close(); db_a.close(); db_b.close()


def test_backup_includes_built_unloaded_indexes(tmp_path, rng):
    d = str(tmp_path / "db")
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    db = ms.connect(path=d)
    t = db.create_table(
        "bk_i", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)}),
        settings=st,
    )
    t.insert({"id": np.arange(500, dtype=np.uint64),
              "vec": rng.standard_normal((500, 16)).astype(np.float32)})
    t.add_vector_index("v", "vec", type="IVFFLAT", ncentroids=8,
                       metric_type="L2")
    assert t.wait_index_built()
    t.persist()
    db.close()

    db2 = ms.connect(path=d)
    t2 = db2.load_table("bk_i")  # indexes BUILT on disk, not loaded
    dest = str(tmp_path / "bk")
    t2.persist(dest)
    idirs = [
        p for p in os.listdir(os.path.join(dest, "segment_0"))
        if p.startswith("index_")
    ]
    assert idirs, "backup must carry BUILT-but-unloaded index files"
    db2.close()
    # restore from the backup: index present (BUILT), search works
    db3 = ms.connect()
    t3 = db3.load_table("bk_i", directory=dest)
    res = t3.search("vec", np.zeros(16, np.float32), k=3)
    assert np.asarray(res.valid).any()
    db3.close()


def test_explain_does_not_load_indexes(db, rng):
    from myscaledb_tpu.index.base import IndexStatus

    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        "ex_t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)}),
        settings=st,
    )
    t.insert({"id": np.arange(300, dtype=np.uint64),
              "vec": rng.standard_normal((300, 16)).astype(np.float32)})
    t.add_vector_index("v", "vec", type="HNSWFLAT", m=16, metric_type="L2")
    assert t.wait_index_built()
    # force the index out of memory: demote to BUILT via persist + reset
    import tempfile

    t.storage_dir = tempfile.mkdtemp()
    t.persist()
    for slot in t._slots.values():
        slot.instance = None
        slot.status = IndexStatus.BUILT
    out = db.sql(
        "EXPLAIN SELECT id, distance(vec, [0.0]) AS d FROM ex_t "
        "ORDER BY d LIMIT 5"
    )
    text = "\n".join(r["explain"] for r in out)
    assert "HNSWFLAT" in text  # modeled from the descriptor
    for slot in t._slots.values():
        assert slot.instance is None, "EXPLAIN must not load indexes"
