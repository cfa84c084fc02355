"""Round-2 fixes: batched BM25, device fusion, const-fold prefilter,
merge-vs-DML atomicity, stable shard routing, chunked posting scans."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.search import fusion
from myscaledb_tpu.text import inverted
from myscaledb_tpu.text.inverted import BM25Stats, InvertedIndex


def _mk_table(db, n=2000, dim=32, seed=0, texts=None):
    cols = {"id": ms.UInt64(), "vec": ms.FloatVector(dim)}
    if texts is not None:
        cols["doc"] = ms.String()
    t = db.create_table("t", ms.Schema(cols))
    rng = np.random.default_rng(seed)
    data = {
        "id": np.arange(n, dtype=np.uint64),
        "vec": rng.standard_normal((n, dim)).astype(np.float32),
    }
    if texts is not None:
        data["doc"] = np.asarray(texts[:n], dtype=object)
    t.insert(data)
    return t, data


# ------------------------------------------------------------- batched BM25
def test_bm25_batch_matches_single():
    docs = [
        "quick brown fox",
        "lazy dog sleeps",
        "quick dog runs fast",
        "brown bear eats fish",
        "fox and dog play",
    ]
    idx = InvertedIndex.build([np.asarray(docs, dtype=object)], capacity=8)
    queries = ["quick fox", "dog", "brown bear fish", ""]
    bv, br, _tags, _ = idx.bm25_topk_batch(queries, 3)
    bv, br = np.asarray(bv), np.asarray(br)
    for i, q in enumerate(queries):
        sv, sr, _ = idx.bm25_topk(q, 3)
        np.testing.assert_allclose(bv[i], np.asarray(sv)[0], rtol=1e-6)
        assert np.array_equal(br[i], np.asarray(sr)[0])


def test_bm25_chunked_long_postings(monkeypatch):
    # force a tiny scan budget so common terms split into many chunks
    monkeypatch.setattr(inverted, "BUDGET_CAP", 16)
    docs = [f"common word{i % 7}" for i in range(300)]
    idx = InvertedIndex.build([np.asarray(docs, dtype=object)], capacity=512)
    assert idx.scan_budget <= 16  # 'common' has df=300 >> budget
    vals, rows, _ = idx.bm25_topk("common word3", 300)
    rows = np.asarray(rows)[0]
    matched = set(rows[rows >= 0].tolist())
    # every doc matches 'common' (OR semantics): nothing truncated
    assert matched == set(range(300))
    # AND semantics across chunked + rare term
    vals, rows, _ = idx.bm25_topk("common word3", 300, operator="AND")
    rows = np.asarray(rows)[0]
    matched = set(rows[rows >= 0].tolist())
    assert matched == {i for i in range(300) if i % 7 == 3}


# --------------------------------------------------------- device fusion
def test_device_rrf_matches_host():
    import jax.numpy as jnp

    tags_a = jnp.asarray([[0, 0, 1, -1]])
    rows_a = jnp.asarray([[5, 7, 2, -1]])
    tags_b = jnp.asarray([[1, 0, 0, 2]])
    rows_b = jnp.asarray([[2, 5, 9, 1]])
    fv, ft, fr = fusion.rrf_fuse_t(tags_a, rows_a, tags_b, rows_b, 5, fusion_k=60)
    fv, ft, fr = np.asarray(fv)[0], np.asarray(ft)[0], np.asarray(fr)[0]
    legs = [[(0, 5), (0, 7), (1, 2)], [(1, 2), (0, 5), (0, 9), (2, 1)]]
    want = fusion.rank_fusion(legs, 5, fusion_k=60)
    got = {(int(t), int(r)): float(v) for v, t, r in zip(fv, ft, fr) if r >= 0}
    assert len(got) == len(want)
    for key, score in want:
        assert got[key] == pytest.approx(score, rel=1e-6)


def test_device_rsf_matches_host():
    import jax.numpy as jnp

    # internal scores max-better (e.g. L2: -(dist))
    tags_v = jnp.asarray([[0, 0, 1]])
    rows_v = jnp.asarray([[5, 7, 2]])
    score_v = jnp.asarray([[-1.0, -3.0, -9.0]])
    tags_t = jnp.asarray([[1, 0]])
    rows_t = jnp.asarray([[2, 9]])
    score_t = jnp.asarray([[4.0, 1.0]])
    fv, ft, fr = fusion.rsf_fuse_t(
        tags_v, rows_v, score_v, tags_t, rows_t, score_t, 4,
        fusion_weight=0.3, vec_ascending_better=False,
    )
    fv, ft, fr = np.asarray(fv)[0], np.asarray(ft)[0], np.asarray(fr)[0]
    want = fusion.relative_score_fusion(
        [((0, 5), 1.0), ((0, 7), 3.0), ((1, 2), 9.0)],  # distances = -score
        [((1, 2), 4.0), ((0, 9), 1.0)],
        4,
        fusion_weight=0.3,
        vec_ascending_better=True,
    )
    got = {(int(t), int(r)): float(v) for v, t, r in zip(fv, ft, fr) if r >= 0}
    assert len(got) == len(want)
    for key, score in want:
        assert got[key] == pytest.approx(score, rel=1e-5)


def test_hybrid_batched_queries():
    docs = [f"token{i % 11} filler text about topic{i % 3}" for i in range(1500)]
    db = ms.connect()
    try:
        t, data = _mk_table(db, n=1500, texts=docs)
        t.add_fts_index("ft", "doc")
        q = data["vec"][[10, 20, 30]]
        res = t.hybrid_search(
            "vec", "doc", q, ["token10 topic1", "token9", "topic2"], k=5,
            fusion_type="rrf",
        )
        assert res.nq == 3 and res.k == 5
        assert res.valid[:, 0].all()
        # per-query result equals the batch row
        for i in range(3):
            one = t.hybrid_search(
                "vec", "doc", q[i], ["token10 topic1", "token9", "topic2"][i],
                k=5, fusion_type="rrf",
            )
            np.testing.assert_allclose(one.scores[0], res.scores[i], rtol=1e-6)
    finally:
        db.close()


def test_text_search_batched():
    docs = [f"alpha beta{i % 5} gamma" for i in range(500)]
    db = ms.connect()
    try:
        t, _ = _mk_table(db, n=500, texts=docs)
        t.add_fts_index("ft", "doc")
        res = t.text_search("doc", ["beta3", "beta4 alpha"], k=4)
        assert res.nq == 2
        one = t.text_search("doc", "beta3", k=4)
        # kernels pick per-call posting budgets; f32 summation order may
        # differ between call shapes -> scores match to ~1e-5, not bitwise
        np.testing.assert_allclose(one.scores[0], res.scores[0], rtol=1e-4)
        rows3 = res.rows[0][res.valid[0]]
        assert all(r % 5 == 3 for r in rows3)
    finally:
        db.close()


# ------------------------------------------------------- const-fold filters
def test_prefilter_const_fold():
    db = ms.connect()
    try:
        t, data = _mk_table(db, n=3000)
        q = data["vec"][7]
        # provably TRUE for the whole segment: same result as no filter
        r_all = t.search("vec", q, k=5)
        r_true = t.search("vec", q, k=5, filter=F("id") >= 0)
        np.testing.assert_allclose(r_all.scores, r_true.scores, rtol=1e-6)
        # provably FALSE: empty result, segment skipped
        r_false = t.search("vec", q, k=5, filter=F("id") > 10_000_000)
        assert not r_false.valid.any()
        # fold disabled -> same answers
        t.settings.query.optimize_prefilter_in_search = False
        r2 = t.search("vec", q, k=5, filter=F("id") > 10_000_000)
        assert not r2.valid.any()
    finally:
        db.close()


def test_const_fold_logic():
    from myscaledb_tpu.search.filters import Literal

    db = ms.connect()
    try:
        t, _ = _mk_table(db, n=100)
        seg = t.live_segments()[0]
        assert (F("id") < 1000).const_fold(seg) is True
        assert (F("id") < 0).const_fold(seg) is False
        assert (F("id") < 50).const_fold(seg) is None
        assert ((F("id") < 1000) & (F("id") >= 0)).const_fold(seg) is True
        assert ((F("id") < 50) | (F("id") >= 0)).const_fold(seg) is True
        assert (~(F("id") < 0)).const_fold(seg) is True
        assert F("id").isin([5000, 6000]).const_fold(seg) is False
        assert F("id").notin([5000]).const_fold(seg) is True
        assert Literal(False).const_fold(seg) is False
    finally:
        db.close()


# ------------------------------------------------- device-lowered filters
def test_device_mask_lowering_matches_host():
    from myscaledb_tpu.search.executor import segment_mask
    from myscaledb_tpu.search.filters import DeviceMask, Lambda

    db = ms.connect()
    try:
        t = db.create_table(
            "t",
            ms.Schema(
                {
                    "id": ms.UInt64(),
                    "score": ms.Float32(),
                    "tag": ms.String(),
                    "vec": ms.FloatVector(16),
                }
            ),
        )
        n = 5000
        rng = np.random.default_rng(2)
        t.insert(
            {
                "id": np.arange(n, dtype=np.uint64),
                "score": rng.random(n).astype(np.float32),
                "tag": np.asarray([f"g{i % 3}" for i in range(n)], dtype=object),
                "vec": rng.standard_normal((n, 16)).astype(np.float32),
            }
        )
        seg = t.live_segments()[0]
        t.delete(F("id") == 17)  # make the alive bitmap non-trivial
        lowerable = [
            (F("id") < 100) & (F("score") > 0.5),
            F("id").isin([1, 5, 17, 4999]),
            ~(F("id") >= 2500),
            (F("score") <= 0.25) | (F("id") == 4000),
            F("id").between(10, 20),
        ]
        for expr in lowerable:
            m = segment_mask(seg, expr)
            assert isinstance(m, DeviceMask), expr
            got = np.asarray(m.build())[: seg.n_rows]
            want = expr.evaluate(seg) & ~seg.deleted_host()[: seg.n_rows]
            assert np.array_equal(got, want), expr
        # string / lambda predicates fall back to the host path
        for expr in [F("tag") == "g1", Lambda(["id"], lambda i: i % 2 == 0)]:
            m = segment_mask(seg, expr)
            assert not isinstance(m, DeviceMask)
        # search results agree between lowered and host-evaluated paths
        q = rng.standard_normal((4, 16)).astype(np.float32)
        r_dev = t.search("vec", q, k=5, filter=F("id") < 1000)
        r_host = t.search(
            "vec", q, k=5, filter=Lambda(["id"], lambda i: i < 1000)
        )
        np.testing.assert_allclose(r_dev.scores, r_host.scores, rtol=1e-6)
        # mutation invalidates the mirrored column
        t.update(F("id") == 50, {"score": np.float32(0.99)})
        r = t.search("vec", q[:1], k=n, filter=(F("score") > 0.98) & (F("id") < 100))
        ids = t.gather(r, ["id"])["id"][0][r.valid[0]]
        assert 50 in ids.tolist()
    finally:
        db.close()


# --------------------------------------------------- merge vs concurrent DML
def test_merge_preserves_concurrent_delete(monkeypatch):
    """A DELETE landing between the merge's row copy and the swap must
    survive into the merged segment (the merge-epoch re-apply)."""
    from myscaledb_tpu.storage import table as table_mod
    from myscaledb_tpu.storage.segment import Segment

    db = ms.connect()
    try:
        t, data = _mk_table(db, n=1000)
        t.insert(
            {
                "id": np.arange(1000, 2000, dtype=np.uint64),
                "vec": np.random.default_rng(1)
                .standard_normal((1000, 32))
                .astype(np.float32),
            }
        )
        orig = Segment.from_columns.__func__

        state = {"fired": False}

        def hooked(cls, *a, **kw):
            seg = orig(cls, *a, **kw)
            if not state["fired"]:
                state["fired"] = True
                # fires while merge() holds the copied rows but has not
                # swapped yet: delete rows 0-9 and update a scalar
                t.delete(F("id") < 10)
                t.update(F("id") == 500, {"id": 99_999})
            return seg

        monkeypatch.setattr(
            Segment, "from_columns", classmethod(hooked)
        )
        new_id = t.merge()
        assert state["fired"]
        assert new_id is not None
        # deleted rows stay deleted in the merged segment
        r = t.search("vec", data["vec"][3], k=1)
        ids = t.gather(r, ["id"])["id"]
        assert int(ids[0, 0]) != 3
        # the update survived
        seg = t.live_segments()[0]
        assert (seg.scalar("id")[: seg.n_rows] == 99_999).sum() == 1
        assert (seg.scalar("id")[: seg.n_rows] == 500).sum() == 0
    finally:
        db.close()


# ------------------------------------------------------- build cancellation
def test_build_cancel_callback_raises():
    from myscaledb_tpu.errors import IndexBuildCanceledError
    from myscaledb_tpu.index.ivf import IVFFlatIndex
    from myscaledb_tpu.metrics import Metric
    from myscaledb_tpu.storage.segment import Segment

    db = ms.connect()
    try:
        t, _ = _mk_table(db, n=2000)
        seg = t.live_segments()[0]
        with pytest.raises(IndexBuildCanceledError):
            IVFFlatIndex.build(
                seg.vector("vec"), seg.n_rows, metric=Metric.L2, dim=32,
                params={"ncentroids": 16}, cancel_cb=lambda: True,
            )
    finally:
        db.close()


def test_drop_index_cancels_inflight_build(monkeypatch):
    import threading

    from myscaledb_tpu.index import ivf as ivf_mod
    from myscaledb_tpu.service.event_log import EventType

    started, release = threading.Event(), threading.Event()
    orig = ivf_mod.balanced_kmeans

    def slow_kmeans(*a, **kw):
        started.set()
        release.wait(timeout=30)
        return orig(*a, **kw)

    monkeypatch.setattr(ivf_mod, "balanced_kmeans", slow_kmeans)
    db = ms.connect()
    try:
        t, _ = _mk_table(db, n=2000)
        t.settings.table.min_rows_to_build_vector_index = 1
        t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=16)
        assert started.wait(timeout=30)
        t.drop_vector_index("ivf")  # while the build blocks in kmeans
        release.set()
        t.wait_index_built(timeout=60)
        db.scheduler.wait_idle(timeout=60)
        events = [r["event"] for r in t.event_log.rows()]
        assert EventType.BUILD_CANCELED.value in events
        assert EventType.BUILD_SUCCEED.value not in events
    finally:
        db.close()


def test_build_memory_governor():
    from myscaledb_tpu.service.event_log import EventType
    from myscaledb_tpu.storage.table import MAX_BUILD_RETRIES

    db = ms.connect()
    try:
        t, _ = _mk_table(db, n=2000)
        t.settings.table.min_rows_to_build_vector_index = 1
        t.settings.server.build_memory_limit_bytes = 1  # nothing fits
        # seed the cache so the retry path has something to evict
        db.index_cache.put(("x", "y", 0), object(), 1 << 20)
        t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=16)
        t.wait_index_built(timeout=60)
        db.scheduler.wait_idle(timeout=60)
        rows = t.system_vector_indices()
        assert rows[0]["status"] == "Error"
        assert "MiB" in rows[0]["latest_fail_reason"]
        errors = [
            r for r in t.event_log.rows()
            if r["event"] == EventType.BUILD_ERROR.value
        ]
        assert len(errors) == MAX_BUILD_RETRIES  # the retry loop is alive
        assert len(db.index_cache) == 0  # retries evicted the cache
        # raising the budget lets the rebuild succeed
        t.settings.server.build_memory_limit_bytes = None
        seg = t.live_segments()[0]
        t._build_one(seg, t._index_descs["ivf"])
        assert t.system_vector_indices()[0]["status"] == "Built"
    finally:
        db.close()


# --------------------------------------------------------- stable sharding
def test_stable_shard_routing():
    from myscaledb_tpu.parallel.sharded_table import _stable_shard

    ints = np.arange(1000, dtype=np.int64)
    w1 = _stable_shard(ints, 4)
    w2 = _stable_shard(ints, 4)
    assert np.array_equal(w1, w2)
    assert set(np.unique(w1)) <= {0, 1, 2, 3}
    counts = np.bincount(w1, minlength=4)
    assert counts.min() > 150  # roughly balanced
    strs = np.asarray([f"user-{i}" for i in range(100)], dtype=object)
    s1 = _stable_shard(strs, 4)
    s2 = _stable_shard(strs, 4)
    assert np.array_equal(s1, s2)
    # known-stable digest (process-independent, unlike builtin hash)
    import hashlib

    h = int.from_bytes(
        hashlib.blake2b(b"user-0", digest_size=8).digest(), "little"
    )
    assert s1[0] == h % 4
