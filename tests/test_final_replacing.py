"""FINAL / ReplacingMergeTree semantics (reference tests 00025/00026:
performFinal drops superseded labels before the final top-k cut)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.errors import SchemaError


def _replacing_table(db, version=True, n=500, dim=16, seed=0):
    cols = {"id": ms.UInt64(), "vec": ms.FloatVector(dim), "doc": ms.String()}
    if version:
        cols["ver"] = ms.UInt64()
    t = db.create_table(
        "t",
        ms.Schema(cols),
        engine="ReplacingMergeTree",
        key_column="id",
        version_column="ver" if version else None,
    )
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    data = {
        "id": np.arange(n, dtype=np.uint64),
        "vec": vecs,
        "doc": np.asarray([f"alpha tag{i % 7}" for i in range(n)], dtype=object),
    }
    if version:
        data["ver"] = np.ones(n, np.uint64)
    t.insert(data)
    return t, vecs, rng


def test_final_vector_search_drops_superseded(db):
    t, vecs, rng = _replacing_table(db)
    # re-insert keys 0..49 with ver=2 and DIFFERENT vectors
    new_vecs = rng.standard_normal((50, 16)).astype(np.float32)
    t.insert(
        {
            "id": np.arange(50, dtype=np.uint64),
            "vec": new_vecs,
            "doc": np.asarray(["beta re"] * 50, dtype=object),
            "ver": np.full(50, 2, np.uint64),
        }
    )
    q = vecs[7]  # the OLD vector of key 7
    res = t.search("vec", q, k=3)
    ids = t.gather(res, ["id"])["id"][0]
    assert ids[0] == 7  # stale row still reachable without FINAL
    res_f = t.search("vec", q, k=3, final=True)
    got = t.gather(res_f, ["id", "ver"])
    # key 7's old row is superseded by ver=2: must not appear
    for j in range(3):
        if not res_f.valid[0, j]:
            continue
        if got["id"][0, j] < 50:
            assert got["ver"][0, j] == 2
    # searching for the NEW vector of key 7 returns exactly one row for it
    res_n = t.search("vec", new_vecs[7], k=5, final=True)
    ids_n = t.gather(res_n, ["id"])["id"][0][res_n.valid[0]]
    assert (ids_n == 7).sum() == 1


def test_final_no_version_last_insert_wins(db):
    t, vecs, rng = _replacing_table(db, version=False)
    t.insert(
        {
            "id": np.asarray([3], np.uint64),
            "vec": vecs[3:4] + 100.0,  # far away
            "doc": np.asarray(["new row"], dtype=object),
        }
    )
    res = t.search("vec", vecs[3], k=2, final=True)
    got_ids = t.gather(res, ["id"])["id"][0][res.valid[0]]
    assert 3 not in got_ids  # old row 3 superseded by the later insert


def test_final_respects_deleted_winner(db):
    t, vecs, rng = _replacing_table(db)
    t.insert(
        {
            "id": np.asarray([5], np.uint64),
            "vec": vecs[5:6] + 50.0,
            "doc": np.asarray(["v2"], dtype=object),
            "ver": np.asarray([2], np.uint64),
        }
    )
    # delete the v2 winner: the v1 row becomes the alive winner again
    t.delete((F("id") == 5) & (F("ver") == 2))
    res = t.search("vec", vecs[5], k=1, final=True)
    got = t.gather(res, ["id", "ver"])
    assert got["id"][0, 0] == 5 and got["ver"][0, 0] == 1


def test_final_requires_replacing_engine(db):
    t = db.create_table(
        "plain", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)})
    )
    t.insert(
        {
            "id": np.arange(10, dtype=np.uint64),
            "vec": np.random.default_rng(0).standard_normal((10, 8)).astype(np.float32),
        }
    )
    with pytest.raises(SchemaError):
        t.search("vec", np.zeros(8, np.float32), k=2, final=True)


def test_final_text_and_hybrid(db):
    t, vecs, rng = _replacing_table(db)
    t.add_fts_index("ft", "doc")
    t.insert(
        {
            "id": np.asarray([11], np.uint64),
            "vec": vecs[11:12],
            "doc": np.asarray(["gamma unique"], dtype=object),
            "ver": np.asarray([2], np.uint64),
        }
    )
    res = t.text_search("doc", "alpha", k=500)
    ids = res.rows  # without FINAL both generations of key 11 text-match? old doc has alpha
    res_f = t.text_search("doc", "alpha", k=500, final=True)
    ids_f = t.gather(res_f, ["id"])["id"][res_f.valid]
    assert 11 not in ids_f  # old 'alpha tag4' row for key 11 superseded
    h = t.hybrid_search("vec", "doc", vecs[11], "gamma", k=5, final=True)
    got = t.gather(h, ["id", "ver"])
    sel = got["id"][h.valid] == 11
    assert sel.any() and (got["ver"][h.valid][sel] == 2).all()


def test_replacing_merge_dedups(db):
    t, vecs, rng = _replacing_table(db, n=200)
    t.insert(
        {
            "id": np.arange(100, dtype=np.uint64),
            "vec": vecs[:100] + 10.0,
            "doc": np.asarray(["v2"] * 100, dtype=object),
            "ver": np.full(100, 2, np.uint64),
        }
    )
    assert t.n_rows == 300
    t.merge()
    assert t.n_rows == 200  # superseded generation dropped by the merge
    seg = t.live_segments()[0]
    ids = seg.scalar("id")[: seg.n_rows]
    vers = seg.scalar("ver")[: seg.n_rows]
    assert (np.sort(ids) == np.arange(200)).all()
    assert (vers[ids < 100] == 2).all() and (vers[ids >= 100] == 1).all()


def test_final_sql_surface(db):
    db.sql(
        "CREATE TABLE r (id UInt64, ver UInt64, vec Array(Float32), "
        "CONSTRAINT c CHECK length(vec) = 4) "
        "ENGINE = ReplacingMergeTree(ver) ORDER BY id"
    )
    db.sql("INSERT INTO r VALUES (1, 1, [1.0, 0.0, 0.0, 0.0])")
    db.sql("INSERT INTO r VALUES (1, 2, [0.0, 1.0, 0.0, 0.0])")
    db.sql("INSERT INTO r VALUES (2, 1, [0.0, 0.0, 1.0, 0.0])")
    rows = db.sql("SELECT id, ver FROM r ORDER BY id")
    assert len(rows) == 3
    rows = db.sql("SELECT id, ver FROM r FINAL ORDER BY id")
    assert [(r["id"], r["ver"]) for r in rows] == [(1, 2), (2, 1)]
    rows = db.sql(
        "SELECT id, ver, distance(vec, [1.0, 0.0, 0.0, 0.0]) AS d "
        "FROM r FINAL ORDER BY d LIMIT 2"
    )
    assert [(r["id"], r["ver"]) for r in rows] == [(1, 2), (2, 1)] or (
        rows[0]["id"] == 2  # ties: either order, but never (1, ver=1)
    )
    assert all(not (r["id"] == 1 and r["ver"] == 1) for r in rows)
    # OPTIMIZE merges + dedups
    db.sql("OPTIMIZE TABLE r FINAL")
    rows = db.sql("SELECT id, ver FROM r ORDER BY id")
    assert [(r["id"], r["ver"]) for r in rows] == [(1, 2), (2, 1)]


def test_replacing_persist_roundtrip(tmp_path):
    d = ms.connect(path=str(tmp_path))
    try:
        t, vecs, rng = _replacing_table(d, n=50)
        t.insert(
            {
                "id": np.asarray([1], np.uint64),
                "vec": vecs[1:2] + 5.0,
                "doc": np.asarray(["x"], dtype=object),
                "ver": np.asarray([9], np.uint64),
            }
        )
        t.persist()
    finally:
        d.close()
    d2 = ms.connect(path=str(tmp_path))
    try:
        t2 = d2.load_table("t")
        assert t2.engine == "Replacing"
        assert t2.key_column == "id" and t2.version_column == "ver"
        res = t2.search("vec", vecs[1], k=2, final=True)
        got = t2.gather(res, ["id", "ver"])
        sel = got["id"][res.valid] == 1
        assert (got["ver"][res.valid][sel] == 9).all()
    finally:
        d2.close()


def test_final_at_scale_within_2x(db):
    """performFinal must not degrade to per-row Python: at 1M rows the
    FINAL search (winner bitmaps cached per table generation) stays
    within 2x of the plain search wall time."""
    import time

    n, dim = 1_000_000, 8
    t = db.create_table(
        "big_final",
        ms.Schema({"id": ms.UInt64(), "ver": ms.UInt64(), "vec": ms.FloatVector(dim)}),
        engine="ReplacingMergeTree",
        key_column="id",
        version_column="ver",
    )
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.uint64)
    ids[: n // 2] = ids[n // 2 : ]  # half the keys are duplicated
    t.insert({"id": ids, "ver": np.arange(n, dtype=np.uint64), "vec": vecs})
    q = rng.standard_normal((4, dim)).astype(np.float32)
    # warm both paths (compile + winner-bitmap build)
    t.search("vec", q, 10)
    t.search("vec", q, 10, final=True).rows
    t0 = time.perf_counter()
    base = t.search("vec", q, 10)
    base.rows
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    fin = t.search("vec", q, 10, final=True)
    fin.rows
    t_final = time.perf_counter() - t0
    # every returned row is a winner: its key's max version
    got = t.gather(fin, ["id", "ver"])
    winner_ver = {}
    for i, v in zip(ids.tolist(), range(n)):
        winner_ver[i] = max(winner_ver.get(i, -1), v)
    for qi in range(len(q)):
        for j in range(10):
            if fin.rows[qi, j] < 0:
                continue
            assert int(got["ver"][qi, j]) == winner_ver[int(got["id"][qi, j])]
    assert t_final <= max(2.0 * t_plain, t_plain + 0.25), (t_final, t_plain)
