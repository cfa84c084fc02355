"""Persistent system logs (SystemLog.cpp:224-225 contract): query_log /
vector_index_event_log flush into backing engine tables under the
database path, survive a restart, and stay SQL-queryable with history."""

import numpy as np
import pytest

import myscaledb_tpu as ms


def _settings():
    st = ms.Settings()
    st.server.system_log_flush_interval_s = 0  # deterministic: flush manually
    st.table.min_rows_to_build_vector_index = 1
    return st


def test_query_log_survives_restart(tmp_path, rng):
    # NOTE: the query_log ring is process-global; a unique table name +
    # LIKE filtering keeps this robust under a full polluted test run
    db = ms.connect(_settings(), path=str(tmp_path))
    t = db.create_table(
        "qlog_r4_t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)})
    )
    t.insert(
        {
            "id": np.arange(32, dtype=np.uint64),
            "vec": rng.standard_normal((32, 8)).astype(np.float32),
        }
    )
    db.sql("SELECT id FROM qlog_r4_t ORDER BY id LIMIT 3")
    t.search("vec", np.zeros(8, np.float32), k=4)
    pre = [
        r for r in db.system_table("query_log")
        if r["table"] == "qlog_r4_t" or "FROM qlog_r4_t" in r.get("query", "")
    ]
    assert pre, "query_log empty before flush"
    db.close()  # close() flushes

    # restart: a fresh process-equivalent database over the same path
    db2 = ms.connect(_settings(), path=str(tmp_path))
    rows = db2.system_table("query_log")
    kinds = {r["kind"] for r in rows}
    assert "sql" in kinds and "vector_search" in kinds
    # pre-restart rows are retroactively visible with their payloads
    sqls = [
        r for r in rows
        if r["kind"] == "sql" and "FROM qlog_r4_t" in r["query"]
    ]
    assert sqls and sqls[0]["duration_ms"] >= 0
    assert isinstance(sqls[0]["settings"], dict)
    # and queryable through SQL, both the system view and the backing
    # engine table (full SQL over log history)
    via_sql = db2.sql(
        "SELECT kind, query FROM system.query_log "
        "WHERE query LIKE '%FROM qlog_r4_t%' LIMIT 100"
    )
    assert any("FROM qlog_r4_t" in r["query"] for r in via_sql)
    agg = db2.sql(
        "SELECT kind, count() AS c FROM system_query_log GROUP BY kind ORDER BY kind"
    )
    assert any(r["kind"] == "sql" and r["c"] >= 1 for r in agg)
    db2.close()


def test_event_log_survives_restart(tmp_path, rng):
    db = ms.connect(_settings(), path=str(tmp_path))
    t = db.create_table(
        "t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)})
    )
    t.insert(
        {
            "id": np.arange(64, dtype=np.uint64),
            "vec": rng.standard_normal((64, 8)).astype(np.float32),
        }
    )
    t.add_vector_index("ix", "vec", type="FLAT")
    t.wait_index_built(timeout=60)
    assert db.system_logs.flush() > 0
    pre_events = {r["event"] for r in db.system_table("vector_index_event_log")}
    assert "BuildSucceed" in pre_events
    db.close()

    db2 = ms.connect(_settings(), path=str(tmp_path))
    rows = db2.system_table("vector_index_event_log")
    events = {r["event"] for r in rows}
    assert "BuildSucceed" in events and "DefinitionCreated" in events
    built = [r for r in rows if r["event"] == "BuildSucceed"]
    assert built[0]["table"] == "t" and built[0]["index_name"] == "ix"
    assert built[0]["segment_id"] is not None  # None-coding round-trips
    db2.close()


def test_unflushed_tail_visible_and_not_duplicated(tmp_path, rng):
    db = ms.connect(_settings(), path=str(tmp_path))
    t = db.create_table(
        "t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)})
    )
    t.insert(
        {
            "id": np.arange(8, dtype=np.uint64),
            "vec": rng.standard_normal((8, 8)).astype(np.float32),
        }
    )
    before = len(db.system_table("query_log"))
    db.sql("SELECT id FROM t LIMIT 1")
    mid = db.system_table("query_log")
    assert len(mid) == before + 1  # ring tail visible pre-flush
    db.system_logs.flush()
    db.system_logs.flush()  # idempotent: second flush adds nothing
    after = db.system_table("query_log")
    target = [r for r in after if r.get("query", "").startswith("SELECT id FROM t")]
    assert len(target) == len(
        [r for r in mid if r.get("query", "").startswith("SELECT id FROM t")]
    )
    db.close()
