"""Decoupled merges: the merged segment serves searches through its
sources' indexes with row-id translation until the rebuild lands
(reference: 00017/00034 decouple tests, MergeTask.cpp row_ids_map)."""

import threading
import time

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.index.base import IndexStatus
from myscaledb_tpu.index.decoupled import DecoupledIndex


class _GatedScheduler:
    """Scheduler that holds jobs until released — lets the test observe the
    decoupled window deterministically."""

    def __init__(self):
        self.jobs = []
        self.released = threading.Event()

    def submit(self, job, slow=False):
        self.jobs.append(job)

    def release(self):
        for j in self.jobs:
            j()
        self.jobs = []


def _make_table(db, rng, scheduler=None):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    st.table.storage_dtype = "float32"
    d = 16
    t = db.create_table(
        "dec", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(d)}), settings=st
    )
    if scheduler is not None:
        t._scheduler = scheduler
    vecs = rng.standard_normal((4000, d)).astype(np.float32)
    t.insert({"id": np.arange(2000, dtype=np.uint64), "vec": vecs[:2000]})
    t.insert({"id": np.arange(2000, 4000, dtype=np.uint64), "vec": vecs[2000:]})
    return t, vecs


def test_decoupled_window_serves_via_sources(db, rng):
    t, vecs = _make_table(db, rng)
    t.add_vector_index("i", "vec", type="IVFFLAT", ncentroids=16)
    assert t.wait_index_built()
    t.delete(F("id") == 1500)  # deleted rows must not resurface post-merge

    gate = _GatedScheduler()
    t._scheduler = gate  # hold the post-merge rebuild
    new_id = t.merge()
    assert new_id is not None
    slot = t._slots[(new_id, "i")]
    assert slot.status == IndexStatus.PENDING
    assert isinstance(slot.instance, DecoupledIndex)

    # searches during the decoupled window go through the index path
    before = db.counters.get("VectorBruteForceSearches")
    res = t.search("vec", vecs[123], k=3, params={"nprobe": 16})
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 123
    assert db.counters.get("VectorBruteForceSearches") == before
    # row-id translation: a source-segment row beyond the first segment
    res2 = t.search("vec", vecs[3000], k=1, params={"nprobe": 16})
    assert int(t.gather(res2, ["id"])["id"][0, 0]) == 3000
    # the deleted row stays gone
    res3 = t.search("vec", vecs[1500], k=1, params={"nprobe": 16})
    assert int(t.gather(res3, ["id"])["id"][0, 0]) != 1500

    # release the rebuild: slot upgrades to a real index
    gate.release()
    assert t.wait_index_built()
    slot = t._slots[(new_id, "i")]
    assert slot.status == IndexStatus.LOADED
    assert not isinstance(slot.instance, DecoupledIndex)
    res4 = t.search("vec", vecs[123], k=3, params={"nprobe": 16})
    assert int(t.gather(res4, ["id"])["id"][0, 0]) == 123


def test_decoupled_filter_translation(db, rng):
    t, vecs = _make_table(db, rng)
    t.add_vector_index("i", "vec", type="IVFFLAT", ncentroids=16)
    assert t.wait_index_built()
    gate = _GatedScheduler()
    t._scheduler = gate
    t.merge()
    res = t.search(
        "vec", vecs[200], k=5, filter=F("id") >= 1000, params={"nprobe": 16}
    )
    ids = t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int)
    assert len(ids) and np.all(ids >= 1000)
    gate.release()


def test_merge_without_decouple_setting(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    st.table.enable_decouple_vector_index = False
    st.table.storage_dtype = "float32"
    t = db.create_table(
        "nodec", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)}), settings=st
    )
    rng2 = np.random.default_rng(5)
    v = rng2.standard_normal((1000, 8)).astype(np.float32)
    t.insert({"id": np.arange(500, dtype=np.uint64), "vec": v[:500]})
    t.insert({"id": np.arange(500, 1000, dtype=np.uint64), "vec": v[500:]})
    t.add_vector_index("i", "vec", type="FLAT")
    assert t.wait_index_built()
    new_id = t.merge()
    assert t.wait_index_built()
    assert t._slots[(new_id, "i")].status == IndexStatus.LOADED
    res = t.search("vec", v[700], k=1)
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 700
