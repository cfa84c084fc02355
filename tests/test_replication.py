"""Replicated builds: the deterministic picker selects one builder; peers
fetch the published files from the shared store, and fall back to local
builds on timeout (reference: ReplicatedMergeTreeBuildVIStrategyPicker +
DataPartsExchange index fetch; test_mqvs_replicated_vector_index)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.index.base import IndexStatus
from myscaledb_tpu.service.replication import pick_build_replica


def _settings():
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    st.table.build_vector_index_on_random_single_replica = True
    st.table.storage_dtype = "float32"
    return st


def test_picker_deterministic_and_spread():
    picks = [pick_build_replica("t", seg, "idx", 3) for seg in range(60)]
    assert picks == [pick_build_replica("t", seg, "idx", 3) for seg in range(60)]
    assert set(picks) == {0, 1, 2}  # spreads over replicas


def test_single_builder_and_fetch(tmp_path, rng):
    """Two replicas over one shared store: exactly one builds per
    (segment, index); the other loads the published files."""
    vecs = rng.standard_normal((3000, 16)).astype(np.float32)
    cols = {"id": np.arange(3000, dtype=np.uint64), "vec": vecs}
    schema = ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)})

    db_a = ms.connect(_settings(), path=str(tmp_path), replica_id=0, n_replicas=2)
    db_b = ms.connect(_settings(), path=str(tmp_path), replica_id=1, n_replicas=2)
    ta = db_a.create_table("r", schema, settings=_settings())
    tb = db_b.create_table("r", schema, settings=_settings())
    ta.insert(cols)
    tb.insert(cols)  # same data on both replicas (replicated part)

    builder = pick_build_replica("r", 0, "ivf", 2)
    before_fetch = db_a.counters.get("ReplicatedPartVectorIndexFetches")
    # the builder must add first so the fetcher has something to find
    order = [ta, tb] if builder == 0 else [tb, ta]
    order[0].add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=8)
    assert order[0].wait_index_built(120)
    order[1].add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=8)
    assert order[1].wait_index_built(120)

    assert db_a.counters.get("ReplicatedPartVectorIndexFetches") > before_fetch
    for t in (ta, tb):
        slot = t._slots[(0, "ivf")]
        assert slot.status == IndexStatus.LOADED
        res = t.search("vec", vecs[42], k=1, params={"nprobe": 8})
        assert int(t.gather(res, ["id"])["id"][0, 0]) == 42
    db_a.close()
    db_b.close()


def test_fetch_timeout_falls_back_to_local_build(tmp_path, rng):
    """A lone non-builder replica times out waiting and builds locally."""
    st = _settings()
    vecs = rng.standard_normal((1000, 8)).astype(np.float32)
    schema = ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)})
    builder = pick_build_replica("solo", 0, "i", 2)
    other = 1 - builder
    db = ms.connect(st, path=str(tmp_path), replica_id=other, n_replicas=2)
    t = db.create_table("solo", schema, settings=st)
    t.replica.fetch_timeout_s = 0.3  # fast test
    t.insert({"id": np.arange(1000, dtype=np.uint64), "vec": vecs})
    before = db.counters.get("ReplicatedPartVectorIndexFailedFetches")
    t.add_vector_index("i", "vec", type="IVFFLAT", ncentroids=8)
    assert t.wait_index_built(60)
    assert db.counters.get("ReplicatedPartVectorIndexFailedFetches") > before
    assert t._slots[(0, "i")].status == IndexStatus.LOADED
    db.close()
