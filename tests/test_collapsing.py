"""Collapsing / VersionedCollapsing engine semantics.

Reference: ClickHouse CollapsingMergeTree merge rules (state/cancel sign
pairs collapse per sorting key; FINAL re-reads candidates through the
merging algorithm — performFinal, ReadWithHybridSearch.cpp:692-899) and
VersionedCollapsingMergeTree (pairs collapse per (key, version),
order-independent).
"""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import SchemaError


def _collapsing_table(db, n=200, dim=16, seed=0, name="ct"):
    t = db.create_table(
        name,
        ms.Schema(
            {
                "id": ms.UInt64(),
                "sign": ms.Int32(),
                "vec": ms.FloatVector(dim),
            }
        ),
        engine="CollapsingMergeTree",
        key_column="id",
        sign_column="sign",
    )
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "sign": np.ones(n, np.int32),
            "vec": vecs,
        }
    )
    return t, vecs, rng


def test_collapsing_final_drops_cancelled(db):
    t, vecs, _ = _collapsing_table(db)
    # cancel keys 0..9 (same vectors, sign=-1)
    t.insert(
        {
            "id": np.arange(10, dtype=np.uint64),
            "sign": np.full(10, -1, np.int32),
            "vec": vecs[:10],
        }
    )
    q = vecs[3]
    res = t.search("vec", q, k=4)
    ids = t.gather(res, ["id"])["id"][0]
    assert ids[0] == 3  # without FINAL both rows are visible
    res_f = t.search("vec", q, k=4, final=True)
    got = t.gather(res_f, ["id"])["id"]
    for j in range(4):
        if res_f.valid[0, j]:
            assert got[0, j] >= 10  # cancelled pair fully collapsed


def test_collapsing_final_keeps_last_state(db):
    t, vecs, rng = _collapsing_table(db)
    # key 5: cancel the original, then insert a NEW state row with a
    # different vector -> FINAL sees only the new state row
    newv = rng.standard_normal(16).astype(np.float32)
    t.insert(
        {
            "id": np.array([5, 5], np.uint64),
            "sign": np.array([-1, 1], np.int32),
            "vec": np.stack([vecs[5], newv]),
        }
    )
    res = t.search("vec", newv, k=1, final=True)
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 5
    # the OLD vector of key 5 must no longer surface key 5 in FINAL
    res_old = t.search("vec", vecs[5], k=3, final=True)
    got = t.gather(res_old, ["id", "sign"])
    for j in range(3):
        if res_old.valid[0, j] and got["id"][0, j] == 5:
            assert got["sign"][0, j] == 1


def test_collapsing_merge_collapses_pairs(db):
    t, vecs, _ = _collapsing_table(db, n=100)
    t.insert(
        {
            "id": np.arange(40, dtype=np.uint64),
            "sign": np.full(40, -1, np.int32),
            "vec": vecs[:40],
        }
    )
    assert t.n_rows == 140
    t.merge()
    assert t.n_rows == 60  # 40 collapsed pairs removed
    seg = t.live_segments()[0]
    ids = set(seg.scalar("id")[: seg.n_rows].tolist())
    assert ids == set(range(40, 100))


def test_versioned_collapsing(db):
    t = db.create_table(
        "vct",
        ms.Schema(
            {
                "id": ms.UInt64(),
                "sign": ms.Int32(),
                "ver": ms.UInt64(),
                "vec": ms.FloatVector(8),
            }
        ),
        engine="VersionedCollapsingMergeTree",
        key_column="id",
        sign_column="sign",
        version_column="ver",
    )
    rng = np.random.default_rng(1)
    v = rng.standard_normal((6, 8)).astype(np.float32)
    # key 1: ver1 state+cancel (collapses), ver2 state (survives)
    # key 2: cancel BEFORE state for ver1 (order must not matter)
    t.insert(
        {
            "id": np.array([1, 1, 1, 2, 2], np.uint64),
            "sign": np.array([1, -1, 1, -1, 1], np.int32),
            "ver": np.array([1, 1, 2, 1, 1], np.uint64),
            "vec": v[:5],
        }
    )
    survivors = t._final_survivors()
    assert len(survivors) == 1  # only key 1 ver 2 remains
    res = t.search("vec", v[2], k=1, final=True)
    got = t.gather(res, ["id", "ver"])
    assert int(got["id"][0, 0]) == 1 and int(got["ver"][0, 0]) == 2
    t.merge()
    assert t.n_rows == 1


def test_collapsing_sql_surface(db):
    r = db.sql(
        "CREATE TABLE ct2 (id UInt64, sign Int8, vec Array(Float32), "
        "CONSTRAINT c CHECK length(vec) = 4) "
        "ENGINE = CollapsingMergeTree(sign) ORDER BY id"
    )
    db.sql("INSERT INTO ct2 VALUES (1, 1, [1.0,0.0,0.0,0.0])")
    db.sql("INSERT INTO ct2 VALUES (1, -1, [1.0,0.0,0.0,0.0])")
    db.sql("INSERT INTO ct2 VALUES (2, 1, [0.0,1.0,0.0,0.0])")
    rows = db.sql(
        "SELECT id, distance(vec, [1.0,0.0,0.0,0.0]) AS d "
        "FROM ct2 FINAL ORDER BY d ASC LIMIT 2"
    )
    assert [r["id"] for r in rows] == [2]
    rows = db.sql("SELECT id FROM ct2 FINAL")
    assert [r["id"] for r in rows] == [2]
    rows = db.sql("SELECT id FROM ct2")  # without FINAL all 3 rows
    assert len(rows) == 3


def test_collapsing_requires_sign(db):
    with pytest.raises(SchemaError):
        db.create_table(
            "bad",
            ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(4)}),
            engine="CollapsingMergeTree",
            key_column="id",
        )


def test_collapsing_rule_more_cancels_keeps_first_cancel(db):
    t, vecs, _ = _collapsing_table(db, n=4)
    # key 0 gets two extra cancels (3 rows total: 1 state, 2 cancel)
    t.insert(
        {
            "id": np.zeros(2, np.uint64),
            "sign": np.full(2, -1, np.int32),
            "vec": np.stack([vecs[0], vecs[0]]),
        }
    )
    # rules: #cancel(2) > #state(1) -> first cancel row survives
    survivors = t._final_survivors()
    segs = sorted({s for s, _ in survivors})
    key0 = [
        (s, r)
        for (s, r) in survivors
        if int(
            next(
                seg for seg in t.live_segments() if seg.segment_id == s
            ).scalar("id")[r]
        )
        == 0
    ]
    assert len(key0) == 1
    s, r = key0[0]
    seg = next(x for x in t.live_segments() if x.segment_id == s)
    assert int(seg.scalar("sign")[r]) == -1
    assert (s, r) == (1, 0)  # FIRST cancel (second segment, row 0)


def test_collapsing_persist_roundtrip(tmp_path):
    db = ms.connect(path=str(tmp_path))
    t, vecs, _ = _collapsing_table(db, n=50, name="pct")
    t.insert(
        {
            "id": np.arange(5, dtype=np.uint64),
            "sign": np.full(5, -1, np.int32),
            "vec": vecs[:5],
        }
    )
    t.persist()
    db.close()
    db2 = ms.connect(path=str(tmp_path))
    t2 = db2.load_table("pct")
    assert t2.engine == "Collapsing" and t2.sign_column == "sign"
    res = t2.search("vec", vecs[2], k=2, final=True)
    got = t2.gather(res, ["id"])["id"]
    assert all(
        got[0, j] >= 5 for j in range(2) if res.valid[0, j]
    )
    db2.close()
