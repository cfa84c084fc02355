"""Over-selective pre-filter fallback (fallbackToFlat analogue,
reference src/VectorIndex/Common/VICommon.h:173 / VIWithDataPart.cpp:912):
when a filter passes < filter_fallback_selectivity of a segment's rows,
the indexed search path (graph routing / IVF probes) is replaced by the
exact masked scan. Contract: at 0.1% selectivity the results EQUAL the
masked exact ground truth for IVF and HNSW segments."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.service.event_log import GLOBAL_COUNTERS


def _mk_table(db, rng, name, index_type, **params):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    t = db.create_table(
        name,
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(32)}),
        settings=st,
    )
    n = 8000
    vecs = rng.standard_normal((n, 32)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("v", "vec", type=index_type, metric_type="L2", **params)
    assert t.wait_index_built()
    return t, vecs


def _ground_truth(vecs, mask_rows, q, k):
    sub = vecs[mask_rows]
    d = ((sub[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, :k]
    return mask_rows[order], np.take_along_axis(d, order, axis=1)


@pytest.mark.parametrize(
    "kind,params",
    [
        ("IVFFLAT", {"ncentroids": 64}),
        ("HNSWFLAT", {"m": 16}),
    ],
)
def test_sub_percent_selectivity_exact(db, rng, kind, params):
    t, vecs = _mk_table(db, rng, f"fb_{kind.lower()}", kind, **params)
    n = len(vecs)
    # 0.1% selectivity: 8 of 8000 rows pass
    hi = 8
    mask_rows = np.arange(hi)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    k = 5
    before = GLOBAL_COUNTERS.snapshot().get("VectorIndexFallbackToFlat", 0)
    res = t.search("vec", q, k, filter=F("id") < hi)
    after = GLOBAL_COUNTERS.snapshot().get("VectorIndexFallbackToFlat", 0)
    assert after > before, "fallback did not trigger at 0.1% selectivity"
    gt_rows, gt_d = _ground_truth(vecs, mask_rows, q, k)
    got = res.rows
    assert res.valid.all()
    # tie-tolerant containment: bf16 payload storage (~1e-2 relative on
    # squared distances) can flip near-equal candidates, so compare by
    # TRUE distance against the k-th ground-truth cut, not by id set
    for i in range(len(q)):
        assert set(got[i].tolist()) <= set(mask_rows.tolist())
        true_d = ((vecs[got[i]] - q[i]) ** 2).sum(-1)
        assert (true_d <= gt_d[i, -1] * 1.02 + 1e-4).all(), (
            true_d, gt_d[i]
        )
    # bf16 payload storage: ~1e-2 relative error on squared distances
    np.testing.assert_allclose(np.sort(res.distances, 1), np.sort(gt_d, 1), rtol=2e-2)


def test_above_threshold_keeps_index(db, rng):
    t, vecs = _mk_table(db, rng, "fb_keep", "IVFFLAT", ncentroids=64)
    q = rng.standard_normal((3, 32)).astype(np.float32)
    before = GLOBAL_COUNTERS.snapshot().get("VectorIndexFallbackToFlat", 0)
    # 50% selectivity: stays on the index
    t.search("vec", q, 5, filter=F("id") < 4000)
    after = GLOBAL_COUNTERS.snapshot().get("VectorIndexFallbackToFlat", 0)
    assert after == before


def test_fallback_disabled_by_setting(db, rng):
    t, vecs = _mk_table(db, rng, "fb_off", "IVFFLAT", ncentroids=64)
    st = t.settings.override({"filter_fallback_selectivity": 0})
    q = rng.standard_normal((3, 32)).astype(np.float32)
    before = GLOBAL_COUNTERS.snapshot().get("VectorIndexFallbackToFlat", 0)
    t.search("vec", q, 5, filter=F("id") < 8, settings=st)
    after = GLOBAL_COUNTERS.snapshot().get("VectorIndexFallbackToFlat", 0)
    assert after == before
