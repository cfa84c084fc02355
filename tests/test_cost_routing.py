"""Cost-based graph-vs-scan routing.

A LOADED HNSW index is bypassed in favor of the exact MXU scan when the
modeled scan time beats the modeled traversal time for the query's
(batch, ef, corpus-bytes) shape — the reference's fallbackToFlat
(src/VectorIndex/Common/VICommon.h:173) generalized from a correctness
rescue to a cost-based plan choice. Contract: the routed search is
EXACT (equals brute-force ground truth), honors filters, and can be
disabled per query via settings.
"""

import numpy as np

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.service.event_log import GLOBAL_COUNTERS


def _mk_table(db, rng, name, *, routing=True):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    st.query.cost_based_index_routing = routing
    t = db.create_table(
        name,
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(32)}),
        settings=st,
    )
    n = 4000
    vecs = rng.standard_normal((n, 32)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("v", "vec", type="HNSWFLAT", m=16, metric_type="L2")
    assert t.wait_index_built()
    return t, vecs


def _gt_d(vecs, rows, q, k):
    """Ground-truth L2^2 distances (ascending) over `rows`."""
    sub = vecs[rows].astype(np.float64)
    d = ((sub[None, :, :] - q[:, None, :].astype(np.float64)) ** 2).sum(-1)
    return np.sort(d, axis=1)[:, :k]


def test_route_to_scan_is_exact(db, rng):
    t, vecs = _mk_table(db, rng, "route_on")
    q = rng.standard_normal((16, 32)).astype(np.float32)
    before = GLOBAL_COUNTERS.snapshot().get("VectorIndexCostRouteToScan", 0)
    res = t.search("vec", q, 10)
    after = GLOBAL_COUNTERS.snapshot().get("VectorIndexCostRouteToScan", 0)
    assert after > before, "small corpus + batch should route to the scan"
    gt = _gt_d(vecs, np.arange(len(vecs)), q, 10)
    np.testing.assert_allclose(np.asarray(res.distances), gt, rtol=5e-3)


def test_routing_off_uses_graph(db, rng):
    t, _ = _mk_table(db, rng, "route_off", routing=False)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    snap = GLOBAL_COUNTERS.snapshot()
    before_scan = snap.get("VectorIndexCostRouteToScan", 0)
    before_idx = snap.get("VectorIndexSearches", 0)
    t.search("vec", q, 10)
    snap = GLOBAL_COUNTERS.snapshot()
    assert snap.get("VectorIndexCostRouteToScan", 0) == before_scan
    assert snap.get("VectorIndexSearches", 0) > before_idx


def test_route_honors_filter(db, rng):
    # ~50% selectivity: above the over-selectivity fallback threshold, so
    # only the cost route applies — results must satisfy the predicate
    # exactly and match the masked ground truth
    t, vecs = _mk_table(db, rng, "route_filter")
    hi = len(vecs) // 2
    q = rng.standard_normal((8, 32)).astype(np.float32)
    res = t.search("vec", q, 10, filter=F("id") < hi)
    rows = np.asarray(res.rows)
    assert res.valid.all() and (rows < hi).all()
    gt = _gt_d(vecs, np.arange(hi), q, 10)
    np.testing.assert_allclose(np.asarray(res.distances), gt, rtol=5e-3)


def test_cost_model_crossover(db, rng):
    """Graph wins only where it should: multi-GB corpus at tiny batch."""
    t, _ = _mk_table(db, rng, "route_model")
    seg = t.live_segments()[0]
    idx = t.loaded_index(seg.segment_id, "vec", Metric.L2)
    assert idx is not None
    # small corpus, any batch: scan
    assert idx.prefer_exact_scan(1, 10, {"ef_s": 100}, 1 << 20)
    assert idx.prefer_exact_scan(256, 10, {"ef_s": 100}, 1 << 20)
    # 8 GiB corpus, single query: graph traversal wins
    assert not idx.prefer_exact_scan(1, 10, {"ef_s": 100}, 8 << 30)
    # 8 GiB corpus, big batch: traversal cost scales with nq, scan does
    # not — the scan wins again
    assert idx.prefer_exact_scan(4096, 10, {"ef_s": 100}, 8 << 30)
