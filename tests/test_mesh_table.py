"""MeshTable: one logical corpus sharded across the (virtual 8-device)
mesh; searches are single SPMD programs with ICI merges. Ground truth =
host numpy over the same rows."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.parallel.mesh_table import MeshTable


@pytest.fixture(scope="module")
def corpus(rng_mod):
    n, d = 20_000, 32
    vecs = rng_mod.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 7  # non-trivial id mapping
    price = rng_mod.integers(0, 1000, n).astype(np.int32)
    return ids, vecs, price


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(0xFEED)


def _gt_l2(vecs, q, k):
    d = ((vecs.astype(np.float64) - q) ** 2).sum(1)
    return np.argsort(d)[:k]


def test_exact_scan_matches_numpy(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m", 32)
    t.insert({"id": ids, "vec": vecs})
    q = vecs[123] + 0.01
    out_ids, scores = t.search(q, 10)
    want = ids[_gt_l2(vecs, q, 10)]
    # tie-tolerant: compare the sets of distances via membership of ids
    assert out_ids[0, 0] == ids[123] or set(out_ids[0]) & set(want[:3])
    assert set(out_ids[0]) == set(want) or len(set(out_ids[0]) & set(want)) >= 8


def test_batch_and_id_mapping(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m2", 32)
    t.insert({"id": ids, "vec": vecs})
    qs = vecs[[5, 77, 1234]]
    out_ids, _ = t.search(qs, 3)
    assert out_ids.shape == (3, 3)
    assert out_ids[0, 0] == ids[5]
    assert out_ids[1, 0] == ids[77]
    assert out_ids[2, 0] == ids[1234]


def test_filter_and_delete(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m3", 32, filter_columns=("price",))
    t.insert({"id": ids, "vec": vecs, "price": price})
    q = vecs[500]
    out_ids, _ = t.search(q, 5, filter=lambda price: price < 200)
    sel = {int(i) for i, p in zip(ids, price) if p < 200}
    assert all(int(i) in sel for i in out_ids[0] if i >= 0)
    # delete the top hit and re-search
    out_ids0, _ = t.search(q, 1)
    t.delete(int(out_ids0[0, 0]))
    out_ids1, _ = t.search(q, 1)
    assert out_ids1[0, 0] != out_ids0[0, 0]


def test_cosine(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m4", 32, metric=Metric.COSINE)
    t.insert({"id": ids, "vec": vecs})
    q = vecs[42]
    out_ids, scores = t.search(q, 5)
    assert out_ids[0, 0] == ids[42]
    # descending similarity scores
    s = scores[0]
    assert (np.diff(s[np.isfinite(s)]) <= 1e-6).all()


def test_sharded_ivf(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m5", 32)
    t.insert({"id": ids, "vec": vecs})
    t.build_ivf(ncentroids=64)
    hits = 0
    for i in (3, 900, 7777):
        out_ids, _ = t.search(vecs[i], 5, params={"nprobe": 16})
        hits += int(out_ids[0, 0] == ids[i])
    assert hits >= 2
    # full probe is exhaustive over alive rows
    out_ids, _ = t.search(vecs[11], 3, params={"nprobe": 64})
    assert out_ids[0, 0] == ids[11]


def test_ivf_filters_and_deletes(corpus):
    """Filtered + deleted rows are masked INSIDE the sharded IVF probe
    (the per-part performPrefilter analogue, VIWithDataPart.cpp)."""
    ids, vecs, price = corpus
    t = MeshTable("m6", 32, filter_columns=("price",))
    t.insert({"id": ids, "vec": vecs, "price": price})
    t.build_ivf(ncentroids=32)
    q = vecs[500]
    out_ids, _ = t.search(
        q, 5, params={"nprobe": 32}, filter=lambda price: price < 200
    )
    sel = {int(i) for i, p in zip(ids, price) if p < 200}
    got = [int(i) for i in out_ids[0] if i >= 0]
    assert got and all(i in sel for i in got)
    # full probe + selective filter: exhaustive over the selected rows
    want = [int(ids[j]) for j in _gt_l2(vecs, q, 20_000) if price[j] < 200][:5]
    assert len(set(got) & set(want)) >= 4
    # delete the top hit: masked at probe time, NO rebuild
    top, _ = t.search(q, 1, params={"nprobe": 32})
    t.delete(int(top[0, 0]))
    after, _ = t.search(q, 1, params={"nprobe": 32})
    assert after[0, 0] != top[0, 0]


def test_sharded_mstg_two_stage(corpus):
    """Two-stage MSTG on the mesh: SQ8 first pass + shard-local exact
    re-rank (SURVEY §3.5). Full probe + wide reorder must be exhaustive
    and EXACT (the re-rank scores full precision), and scores must match
    the exact scan's to float tolerance."""
    ids, vecs, price = corpus
    t = MeshTable("m5b", 32)
    t.insert({"id": ids, "vec": vecs})
    t.build_mstg(ncentroids=64)
    # index payload is uint8 codes (the point: ~4x HBM shrink vs IVF)
    assert t._mstg[4].dtype == np.uint8
    hits = 0
    for i in (3, 900, 7777):
        out_ids, _ = t.search(
            vecs[i], 5, params={"nprobe": 16, "num_reorder": 64}
        )
        hits += int(out_ids[0, 0] == ids[i])
    assert hits >= 2
    # full probe, reorder >= k x shards: exact top-k with exact scores
    q = vecs[11]
    got_ids, got_scores = t.search(q, 5, params={"nprobe": 64})
    exact_ids, exact_scores = t.search(q, 5)  # exact scan
    assert got_ids[0, 0] == ids[11]
    assert set(got_ids[0]) == set(exact_ids[0])
    np.testing.assert_allclose(got_scores[0], exact_scores[0], rtol=1e-4)
    # tight num_reorder still returns k valid exact-scored rows
    out_ids, _ = t.search(q, 5, params={"nprobe": 64, "num_reorder": 8})
    assert (out_ids[0] >= 0).all()


def test_mstg_filters_deletes_delta(corpus):
    """The two-stage probe composes with filters, deletes, and the
    delta scan over post-build appends, like the IVF path."""
    ids, vecs, price = corpus
    t = MeshTable("m6b", 32, filter_columns=("price",))
    t.insert(
        {"id": ids[:16_000], "vec": vecs[:16_000], "price": price[:16_000]}
    )
    t.build_mstg(ncentroids=32)
    q = vecs[500]
    out_ids, _ = t.search(
        q, 5, params={"nprobe": 32}, filter=lambda price: price < 200
    )
    sel = {int(i) for i, p in zip(ids[:16_000], price[:16_000]) if p < 200}
    got = [int(i) for i in out_ids[0] if i >= 0]
    assert got and all(i in sel for i in got)
    # delete the top hit: masked at probe time, no rebuild
    top, _ = t.search(q, 1, params={"nprobe": 32})
    t.delete(int(top[0, 0]))
    after, _ = t.search(q, 1, params={"nprobe": 32})
    assert after[0, 0] != top[0, 0]
    # post-build appends served via the delta exact scan
    t.insert(
        {
            "id": ids[16_000:17_000],
            "vec": vecs[16_000:17_000],
            "price": price[16_000:17_000],
        }
    )
    out, _ = t.search(vecs[16_500], 1, params={"nprobe": 4})
    assert out[0, 0] == ids[16_500]


def test_incremental_insert_no_reseal(corpus):
    """Appends scatter into per-shard slack slots — the sealed device
    arrays are UPDATED, not rebuilt (per-part searchability, SURVEY §3.4)."""
    ids, vecs, price = corpus
    t = MeshTable("m7", 32)
    t.insert({"id": ids[:10_000], "vec": vecs[:10_000]})
    a, _ = t.search(vecs[2], 1)
    assert a[0, 0] == ids[2]
    sealed_before = t._s
    t.insert({"id": ids[10_000:12_000], "vec": vecs[10_000:12_000]})
    assert t._s is sealed_before  # no reseal: fits in slack
    b, _ = t.search(vecs[11_000], 1)
    assert b[0, 0] == ids[11_000]
    # overflow forces a reseal and stays correct
    t.insert({"id": ids[12_000:], "vec": vecs[12_000:]})
    c, _ = t.search(vecs[15_000], 1)
    assert c[0, 0] == ids[15_000]
    assert t.n_rows == 20_000


def test_ivf_delta_scan_after_insert(corpus):
    """Rows appended AFTER an IVF build are served by the delta exact
    scan merged with the probe (new parts are brute-force searchable
    until indexed — MergeTreeVSManager semantics)."""
    ids, vecs, price = corpus
    t = MeshTable("m8", 32)
    t.insert({"id": ids[:16_000], "vec": vecs[:16_000]})
    t.build_ivf(ncentroids=32)
    t.insert({"id": ids[16_000:17_000], "vec": vecs[16_000:17_000]})
    out, _ = t.search(vecs[16_500], 1, params={"nprobe": 4})
    assert out[0, 0] == ids[16_500]


def test_text_and_hybrid(corpus):
    ids, vecs, price = corpus
    n = 4000
    docs = np.array(
        [
            f"alpha beta doc{i}" if i % 7 == 0 else f"gamma delta doc{i}"
            for i in range(n)
        ],
        dtype=object,
    )
    t = MeshTable("m9", 32, text_column="body", filter_columns=("price",))
    t.insert(
        {
            "id": ids[:n],
            "vec": vecs[:n],
            "price": price[:n],
            "body": docs,
        }
    )
    # unique token: exact hit
    out_ids, scores = t.text_search("doc91", 3)
    assert out_ids[0, 0] == ids[91]
    # common token restricted to the i%7 subset
    out_ids, _ = t.text_search("alpha", 10)
    got = [int(i) for i in out_ids[0] if i >= 0]
    assert got and all((int(i) // 7) % 7 == 0 for i in got)
    # filtered text search
    out_ids, _ = t.text_search("gamma", 10, filter=lambda price: price < 100)
    sel = {int(i) for i, p in zip(ids[:n], price[:n]) if p < 100}
    assert all(int(i) in sel for i in out_ids[0] if i >= 0)
    # hybrid: RRF puts the doc that wins BOTH legs first
    out_ids, scores = t.hybrid_search(vecs[91], "doc91", 5)
    assert out_ids[0, 0] == ids[91]
    # batch text
    out_ids, _ = t.text_search(["doc91", "doc182"], 1)
    assert out_ids[0, 0] == ids[91] and out_ids[1, 0] == ids[182]


def test_text_follows_incremental_insert(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m10", 32, text_column="body")
    t.insert(
        {
            "id": ids[:1000],
            "vec": vecs[:1000],
            "body": np.array(["common filler"] * 1000, dtype=object),
        }
    )
    a, _ = t.text_search("needle", 1)
    assert a[0, 0] == -1
    t.insert(
        {
            "id": np.array([777_777], np.int64),
            "vec": vecs[1000:1001],
            "body": np.array(["the needle doc"], dtype=object),
        }
    )
    b, _ = t.text_search("needle", 1)
    assert b[0, 0] == 777_777


def test_predicate_skeleton_cache(corpus):
    """Fresh lambdas with the same skeleton must NOT retrace; changed
    numeric closure constants ride a traced argument (VERDICT weak #8)."""
    ids, vecs, price = corpus
    t = MeshTable("m11", 32, filter_columns=("price",))
    t.insert({"id": ids[:2000], "vec": vecs[:2000], "price": price[:2000]})

    def make(lo):
        return lambda price: price < lo

    t.search(vecs[0], 3, filter=make(100))
    assert len(t._pred_cache._cache) == 1
    t.search(vecs[0], 3, filter=make(500))  # fresh lambda, new constant
    assert len(t._pred_cache._cache) == 1
    out, _ = t.search(vecs[1], 5, filter=make(50))
    sel = {int(i) for i, p in zip(ids[:2000], price[:2000]) if p < 50}
    assert all(int(i) in sel for i in out[0] if i >= 0)


def test_save_load(tmp_path, corpus):
    ids, vecs, price = corpus
    t = MeshTable("m12", 32, filter_columns=("price",), text_column="body")
    docs = np.array([f"tok{i}" for i in range(500)], dtype=object)
    t.insert(
        {"id": ids[:500], "vec": vecs[:500], "price": price[:500], "body": docs}
    )
    t.delete(int(ids[3]))
    t.save(str(tmp_path / "mt"))
    t2 = MeshTable.load(str(tmp_path / "mt"))
    assert t2.n_rows == 499
    out, _ = t2.search(vecs[7], 1)
    assert out[0, 0] == ids[7]
    out, _ = t2.search(vecs[3], 1)
    assert out[0, 0] != ids[3]  # delete survived persistence
    out, _ = t2.text_search("tok42", 1)
    assert out[0, 0] == ids[42]
    # round-4 layout: one file per shard, no monolithic npz
    import os

    files = sorted(os.listdir(tmp_path / "mt"))
    assert "meshtable.npz" not in files
    assert sum(f.startswith("shard_") for f in files) == t.n_shards
    # every shard file holds only its shard's rows (sizes sum to 500)
    total = 0
    for f in files:
        if f.startswith("shard_"):
            with np.load(tmp_path / "mt" / f, allow_pickle=False) as z:
                total += len(z["ids"])
    assert total == 500


def test_load_legacy_monolithic(tmp_path, corpus):
    """Round-3 single-npz checkpoints keep loading."""
    import json

    ids, vecs, price = corpus
    root = tmp_path / "legacy"
    root.mkdir()
    np.savez(
        root / "meshtable.npz",
        ids=ids[:100],
        vecs=vecs[:100],
        deleted=np.array([int(ids[5])], np.int64),
        col_price=price[:100],
    )
    with open(root / "meshtable.json", "w") as f:
        json.dump(
            {
                "name": "mleg",
                "dim": 32,
                "metric": "L2",
                "filter_columns": ["price"],
                "text_column": None,
                "analyzer_params": None,
            },
            f,
        )
    t = MeshTable.load(str(root))
    assert t.n_rows == 99
    out, _ = t.search(vecs[7], 1)
    assert out[0, 0] == ids[7]


def test_hybrid_rsf_and_batch_distance(corpus):
    ids, vecs, price = corpus
    t = MeshTable("m13", 32, text_column="body")
    docs = np.array(
        ["alpha beta" if i % 3 else f"needle{i} gamma" for i in range(600)],
        dtype=object,
    )
    t.insert({"id": ids[:600], "vec": vecs[:600], "body": docs})
    h_ids, h_sc = t.hybrid_search(
        vecs[33], "needle33", 3, fusion_type="rsf", fusion_weight=0.5
    )
    assert h_ids[0, 0] == ids[33]
    # RSF scores live in [0, 1] (w*norm_text + (1-w)*norm_vec)
    assert 0.0 <= float(h_sc[0, 0]) <= 1.0 + 1e-6
    # rrf still the default; unknown fusion types rejected
    h_ids, _ = t.hybrid_search(vecs[33], "needle33", 3)
    assert h_ids[0, 0] == ids[33]
    import pytest as _pytest

    from myscaledb_tpu.errors import QueryShapeError

    with _pytest.raises(QueryShapeError):
        t.hybrid_search(vecs[33], "needle33", 3, fusion_type="nope")
    # batch_distance: k triples per query index, rank-ordered
    triples = t.batch_distance(vecs[[10, 20]], 3)
    per_q = {}
    for qi, rid, _s in triples:
        per_q.setdefault(qi, []).append(rid)
    assert set(per_q) == {0, 1}
    assert per_q[0][0] == ids[10] and per_q[1][0] == ids[20]
    assert len(per_q[0]) == 3 and len(per_q[1]) == 3
