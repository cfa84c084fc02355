"""Tracing spans, profile counters, token-filter acceleration, table
functions (reference: OpenTelemetry span log, ProfileEvents, ftsIndex /
full_text_search table functions — SURVEY.md §5, §2.1)."""

import numpy as np

import myscaledb_tpu as ms
from myscaledb_tpu.service.tracing import GLOBAL_SPAN_LOG


def _mk(db, rng):
    t = db.create_table(
        "obs",
        ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(8)}),
    )
    docs = ["alpha beta", "beta gamma", "gamma delta", "delta alpha"] * 5
    t.add_fts_index("ft", "body")
    t.insert(
        {
            "id": np.arange(20, dtype=np.uint64),
            "body": np.array(docs, dtype=object),
            "vec": rng.standard_normal((20, 8)).astype(np.float32),
        }
    )
    return t


def test_spans_recorded(db, rng):
    GLOBAL_SPAN_LOG.clear()
    t = _mk(db, rng)
    t.search("vec", np.zeros(8, np.float32), k=3)
    spans = db.system_table("span_log")
    names = [s["span"] for s in spans]
    assert "vector_search" in names
    row = next(s for s in spans if s["span"] == "vector_search")
    assert row["duration_us"] > 0 and row["table"] == "obs"
    # index builds traced too
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 5
    t2 = db.create_table(
        "obs2", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)}), settings=st
    )
    t2.insert({"id": np.arange(100, dtype=np.uint64),
               "vec": rng.standard_normal((100, 8)).astype(np.float32)})
    t2.add_vector_index("i", "vec", type="FLAT")
    assert t2.wait_index_built()
    assert any(s["span"] == "index_build" for s in db.system_table("span_log"))


def test_has_token_filter_accelerated(db, rng):
    t = _mk(db, rng)
    before = db.counters.get("FTSAcceleratedFilters")
    flt = t.has_token("body", "beta")
    res = t.search("vec", np.zeros(8, np.float32), k=10, filter=flt)
    ids = t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int)
    assert set(i % 4 for i in ids) == {0, 1}  # docs containing 'beta'
    assert db.counters.get("FTSAcceleratedFilters") > before
    # fallback path: column without fts coverage gives identical semantics
    t2 = db.create_table(
        "obs3",
        ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(8)}),
    )
    t2.insert(
        {
            "id": np.arange(4, dtype=np.uint64),
            "body": np.array(["x beta", "no", "beta y", "zz"], dtype=object),
            "vec": rng.standard_normal((4, 8)).astype(np.float32),
        }
    )
    res2 = t2.search("vec", np.zeros(8, np.float32), k=4, filter=t2.has_token("body", "beta"))
    ids2 = sorted(t2.gather(res2, ["id"])["id"][0][res2.valid[0]].astype(int))
    assert ids2 == [0, 2]


def test_table_functions(db, rng):
    _mk(db, rng)
    rows = db.full_text_search("obs", "ft", "beta", k=50)
    assert rows and all("bm25_score" in r for r in rows)
    assert all(r["body"] in ("alpha beta", "beta gamma") for r in rows)
    stats = db.fts_index_stats("obs", "body", "beta gamma")
    assert stats["total_docs"] == 20
    assert stats["doc_freq"]["beta"] == 10 and stats["doc_freq"]["gamma"] == 10
    assert stats["avg_doc_len"] == 2.0


def test_query_log_records_searches(db, rng):
    t = db.create_table(
        "ql",
        ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(8)}),
    )
    n = 50
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.array(["alpha beta"] * n, dtype=object),
            "vec": rng.standard_normal((n, 8)).astype(np.float32),
        }
    )
    t.add_fts_index("ft", "body")
    t.search("vec", rng.standard_normal(8).astype(np.float32), k=5)
    t.text_search("ft", "alpha", k=3)
    db.sql("SELECT id FROM ql LIMIT 2")
    rows = db.system_table("query_log")
    kinds = [r["kind"] for r in rows if r["table"] == "ql"]
    assert "vector_search" in kinds and "text_search" in kinds and "sql" in kinds
    vrow = next(r for r in rows if r["table"] == "ql" and r["kind"] == "vector_search")
    assert vrow["k"] == 5 and vrow["nq"] == 1 and vrow["rows_read"] == n
    assert vrow["duration_ms"] >= 0
    # SQL-queryable (system.query_log surface)
    out = db.sql("SELECT kind, table FROM system.query_log")
    assert any(r.get("kind") == "vector_search" for r in out)


def test_build_progress_column(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        "qp", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)}), settings=st
    )
    n = 4000
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "vec": rng.standard_normal((n, 16)).astype(np.float32),
        }
    )
    t.add_vector_index("v", "vec", type="IVFFLAT", metric_type="L2")
    assert t.wait_index_built()
    rows = [r for r in db.system_table("vector_index_segments") if r["table"] == "qp"]
    assert rows and all(r["progress"] == 1.0 for r in rows)
