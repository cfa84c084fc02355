"""Beyond-HBM corpus tier: host-RAM payloads with streamed scans and
disk-mode MSTG (SQ8 windows in HBM, raw re-rank rows in host RAM) —
the reference's disk-mode path (Search::DiskIOManager, 00028 disk_mode=1)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F


def _host_table(db, n=6000, dim=32, seed=0):
    st = ms.Settings()
    st.table.vector_storage_tier = "host"
    st.table.min_rows_to_build_vector_index = 1
    t = db.create_table(
        "t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(dim)}), settings=st
    )
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "vec": vecs})
    return t, vecs


def test_host_payload_is_numpy(db):
    t, _ = _host_table(db)
    seg = t.live_segments()[0]
    payload = seg.vector("vec")
    assert payload.is_host
    assert isinstance(payload.data, np.ndarray)


def test_host_stream_scan_matches_hbm(db):
    t, vecs = _host_table(db, n=5000)
    st2 = ms.Settings()
    t2 = db.create_table(
        "t_hbm", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(32)}),
        settings=st2,
    )
    t2.insert({"id": np.arange(5000, dtype=np.uint64), "vec": vecs})
    q = vecs[[3, 700, 4000]] + 0.01
    r_host = t.search("vec", q, k=5, metric="L2")
    r_hbm = t2.search("vec", q, k=5, metric="L2")
    # host tier stores f32 (no bf16 quantization): compare with tolerance
    np.testing.assert_allclose(
        r_host.distances, r_hbm.distances, rtol=5e-3, atol=5e-3
    )
    assert r_host.rows[0, 0] == 3


def test_host_stream_scan_filtered(db):
    t, vecs = _host_table(db, n=4000)
    r = t.search("vec", vecs[10], k=5, filter=F("id") >= 1000)
    ids = t.gather(r, ["id"])["id"][0]
    assert (ids[r.valid[0]] >= 1000).all()
    t.delete(F("id") == 2000)
    r = t.search("vec", vecs[2000], k=1)
    assert t.gather(r, ["id"])["id"][0, 0] != 2000


def test_host_tier_mstg_disk(db):
    t, vecs = _host_table(db, n=6000)
    t.add_vector_index("m", "vec", type="MSTG", ncentroids=32)
    assert t.wait_index_built(120)
    rows = t.system_vector_indices()
    assert rows[0]["status"] == "Built"
    # the index's HBM footprint is the SQ8 windows (~1 byte/el), far below
    # the raw payload
    slot = t._slots[(0, "m")]
    idx = slot.instance
    assert idx.raw_host is not None
    seg = t.live_segments()[0]
    raw_f32_bytes = seg.capacity * seg.vector("vec").data.shape[1] * 4
    assert idx.memory_bytes < raw_f32_bytes / 2
    # recall vs exact scan over the host payload (tie-tolerant, distances)
    q = (vecs[:64] + 0.05 * np.random.default_rng(1).standard_normal((64, 32))).astype(np.float32)
    gt = t.search("vec", q, k=10, settings=_bf_settings())  # stream scan
    got = t.search("vec", q, k=10)
    kth = gt.distances[:, 9:10]
    hits = (got.distances <= kth * (1 + 1e-4) + 1e-3).sum()
    assert hits / (64 * 10) >= 0.9
    # exact re-rank means reported distances are exact (f64 host math)
    d_direct = ((q[0].astype(np.float64) - vecs[got.rows[0, 0]]) ** 2).sum()
    assert got.distances[0, 0] == pytest.approx(d_direct, rel=1e-4)


def _bf_settings():
    st = ms.Settings()
    st.query.enable_brute_force_vector_search = True
    # force the scan even when an index exists by searching via settings
    return st


def test_host_tier_ivfflat_degrades_to_disk_mode(db):
    """Raw IVFFLAT would mirror the whole host payload into HBM; on a
    host-tier (or HBM-spilled) segment the build degrades to the disk-mode
    shape — SQ8 windows on device + exact host re-rank — instead of
    failing (round-5: the engine absorbs memory pressure, it never dies)."""
    t, vecs = _host_table(db, n=3000)
    t.add_vector_index("i", "vec", type="IVFFLAT", ncentroids=16)
    assert t.wait_index_built(120)
    idx = t._slots[(0, "i")].instance
    assert idx.codec == "sq8"
    assert idx.requires_two_stage()
    assert idx.raw_host is not None and idx.raw_data is None
    r = t.search("vec", vecs[42], k=3)
    assert t.gather(r, ["id"])["id"][0, 0] == 42


def test_hbm_disk_mode_param(db):
    """disk_mode=1 on an ordinary HBM table moves the raw re-rank tier to
    host RAM (only SQ8 windows stay on device)."""
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 1
    t = db.create_table(
        "t2", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)}), settings=st
    )
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((3000, 16)).astype(np.float32)
    t.insert({"id": np.arange(3000, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("m", "vec", type="MSTG", disk_mode=1, ncentroids=16)
    assert t.wait_index_built(120)
    idx = t._slots[(0, "m")].instance
    assert idx.raw_host is not None and idx.raw_data is None
    assert idx.requires_two_stage()
    r = t.search("vec", vecs[42], k=3)
    assert t.gather(r, ["id"])["id"][0, 0] == 42
