"""Persistence: save/load round-trips, checksum guard, lazy index reload,
LRU cache eviction + reload (checkpoint/resume capabilities, SURVEY.md §5)."""

import json
import os

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.index.base import IndexStatus


def _mk_db(tmp_path, **kw):
    return ms.connect(path=str(tmp_path), **kw)


def _settings(min_rows=1000, dtype="float32"):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = min_rows
    st.table.storage_dtype = dtype
    return st


def _fill(t, rng, n=4000, d=24):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "tag": np.array([f"t{i%5}" for i in range(n)], dtype=object),
            "vec": vecs,
        }
    )
    return vecs


SCHEMA = lambda d=24: ms.Schema(
    {"id": ms.UInt64(), "tag": ms.String(), "vec": ms.FloatVector(d)}
)


def test_roundtrip_table_with_ivf(tmp_path, rng):
    db = _mk_db(tmp_path)
    t = db.create_table("docs", SCHEMA(), settings=_settings())
    vecs = _fill(t, rng)
    t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=16)
    assert t.wait_index_built()
    t.delete(F("id") == 7)
    t.persist()
    db.close()

    db2 = _mk_db(tmp_path)
    t2 = db2.load_table("docs", settings=_settings())
    assert t2.n_rows == 3999
    # index is on disk, not in memory
    segs = t2.system_vector_index_segments()
    assert all(s["status"] == "Built" for s in segs)
    # first search lazily reloads it
    res = t2.search("vec", vecs[42], k=3, params={"nprobe": 16})
    assert int(t2.gather(res, ["id"])["id"][0, 0]) == 42
    segs = t2.system_vector_index_segments()
    assert any(s["status"] == "Loaded" for s in segs)
    # deleted row stays deleted across restart
    res7 = t2.search("vec", vecs[7], k=1, params={"nprobe": 16})
    assert int(t2.gather(res7, ["id"])["id"][0, 0]) != 7
    ev = {e["event"] for e in db2.system_table("vector_index_event_log")}
    assert "LoadSucceed" in ev
    db2.close()


def test_roundtrip_preserves_strings_and_flat(tmp_path, rng):
    db = _mk_db(tmp_path)
    t = db.create_table("s", SCHEMA(), settings=_settings())
    vecs = _fill(t, rng, n=2000)
    t.add_vector_index("flt", "vec", type="FLAT")
    assert t.wait_index_built()
    t.persist()
    db.close()

    db2 = _mk_db(tmp_path)
    t2 = db2.load_table("s", settings=_settings())
    res = t2.search("vec", vecs[10], k=1)
    g = t2.gather(res, ["tag", "id"])
    assert g["tag"][0, 0] == "t0" and int(g["id"][0, 0]) == 10
    db2.close()


def test_checksum_guard(tmp_path, rng):
    db = _mk_db(tmp_path)
    t = db.create_table("c", SCHEMA(), settings=_settings())
    _fill(t, rng, n=1500)
    t.persist()
    db.close()
    # corrupt a byte of the column file
    seg = os.path.join(tmp_path, "c", "segment_0", "columns.npz")
    with open(seg, "r+b") as f:
        f.seek(100)
        b = f.read(1)
        f.seek(100)
        f.write(bytes([b[0] ^ 0xFF]))
    db2 = _mk_db(tmp_path)
    with pytest.raises(ms.MyScaleTPUError):
        db2.load_table("c", settings=_settings())
    db2.close()


def test_cache_eviction_reload(tmp_path, rng):
    st = _settings()
    st.server.vector_index_cache_size = 1  # evict everything immediately
    db = ms.connect(settings=st, path=str(tmp_path))
    t = db.create_table("e", SCHEMA(), settings=_settings())
    vecs = _fill(t, rng)
    t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=16)
    assert t.wait_index_built()
    t.persist()
    # force another insert+build so the cache (capacity 1 byte) must evict
    t.insert(
        {
            "id": np.arange(4000, 6000, dtype=np.uint64),
            "tag": np.array(["x"] * 2000, dtype=object),
            "vec": rng.standard_normal((2000, 24)).astype(np.float32),
        }
    )
    assert t.wait_index_built()
    t.persist()
    # at least one persisted slot was demoted to Built by eviction
    assert db.index_cache.evictions > 0
    # search still works (lazy reload path)
    res = t.search("vec", vecs[3], k=1, params={"nprobe": 16})
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 3
    db.close()
