"""Window-layout mask path: numeric predicates over an IVF index are
evaluated against the index's cluster-major column mirrors (WindowMask),
not gathered per-row from a row-space bitmap. Correctness contract: same
results as the host-evaluated pre-filter."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.search.filters import DeviceMask, Lambda, WindowMask


@pytest.fixture()
def ivf_table(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        "wm",
        ms.Schema(
            {"id": ms.UInt64(), "score": ms.Float32(), "vec": ms.FloatVector(24)}
        ),
        settings=st,
    )
    n = 6000
    vecs = rng.standard_normal((n, 24)).astype(np.float32)
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "score": rng.random(n).astype(np.float32),
            "vec": vecs,
        }
    )
    t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=32, metric_type="L2")
    assert t.wait_index_built()
    return t, vecs


def test_window_mask_constructed(ivf_table):
    t, vecs = ivf_table
    seg = t.live_segments()[0]
    idx = t.loaded_index(seg.segment_id, "vec", ms.Metric.L2)
    assert idx is not None and hasattr(idx, "to_window_mask")
    from myscaledb_tpu.search.executor import segment_mask

    dm = segment_mask(seg, (F("id") < 300) & (F("score") > 0.25))
    assert isinstance(dm, DeviceMask)
    wm = idx.to_window_mask(dm, seg)
    assert isinstance(wm, WindowMask)
    # window mask in perm order == row mask permuted
    row = np.asarray(dm.build())
    perm = np.asarray(idx.perm_rows)
    want = np.where(perm >= 0, row[np.maximum(perm, 0)], False)
    got = np.asarray(wm.build())
    live = perm >= 0
    assert np.array_equal(got[live], want[live])


def test_window_mask_results_match_host_path(ivf_table, rng):
    t, vecs = ivf_table
    q = vecs[17] + 0.05 * rng.standard_normal(24).astype(np.float32)
    flt_dev = (F("id") < 3000) | (F("score") > 0.9)
    flt_host = Lambda(
        ["id", "score"], lambda i, s: (i < 3000) | (s > 0.9)
    )
    r_dev = t.search("vec", q, k=10, params={"nprobe": 32})
    r_w = t.search("vec", q, k=10, params={"nprobe": 32}, filter=flt_dev)
    r_h = t.search("vec", q, k=10, params={"nprobe": 32}, filter=flt_host)
    np.testing.assert_allclose(r_w.scores, r_h.scores, rtol=1e-6)
    got = t.gather(r_w, ["id", "score"])
    ok = (got["id"][0] < 3000) | (got["score"][0] > 0.9)
    assert ok[r_w.valid[0]].all()
    assert r_dev.valid[0].any()


def test_window_mask_respects_delete_and_mutation(ivf_table, rng):
    t, vecs = ivf_table
    q = vecs[42]
    r = t.search("vec", q, k=3, params={"nprobe": 32}, filter=F("id") < 100)
    assert int(t.gather(r, ["id"])["id"][0, 0]) == 42
    t.delete(F("id") == 42)  # bumps the generation -> alive mirror refresh
    r2 = t.search("vec", q, k=3, params={"nprobe": 32}, filter=F("id") < 100)
    ids2 = t.gather(r2, ["id"])["id"][0]
    assert 42 not in ids2[r2.valid[0]].tolist()
    # mutate the filter column: mirror must refresh (generation key)
    t.update(F("id") == 43, {"score": np.float32(5.0)})
    r3 = t.search(
        "vec", vecs[43], k=3, params={"nprobe": 32}, filter=F("score") > 4.0
    )
    ids3 = t.gather(r3, ["id"])["id"][0]
    assert 43 in ids3[r3.valid[0]].tolist()


def test_window_mask_mstg_two_stage(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        "wm2",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)}),
        settings=st,
    )
    n = 4000
    vecs = rng.standard_normal((n, 16)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("m", "vec", type="MSTG", metric_type="L2")
    assert t.wait_index_built()
    r = t.search("vec", vecs[5], k=5, filter=F("id") < 1000)
    ids = t.gather(r, ["id"])["id"][0]
    assert ids[0] == 5
    assert (ids[r.valid[0]] < 1000).all()
