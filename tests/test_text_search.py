"""BM25 text search + hybrid fusion: device scoring vs a pure-python BM25
oracle; operator semantics; filters; stats consistency across segments.
Mirrors the reference tests 02887 (fts), 00040/00041 (text/hybrid)."""

import math

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.search.fusion import rank_fusion, relative_score_fusion
from myscaledb_tpu.text.analyzer import Analyzer
from myscaledb_tpu.text.inverted import BM25_B, BM25_K1, BM25Stats, InvertedIndex

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sits on the mat",
    "dogs and cats living together",
    "the lazy dog sleeps all day",
    "quick quick quick brown fox",
    "an unrelated document about tpu kernels",
    "pallas kernels make tpu programs fast",
    "vector search with inverted index",
    "hybrid search fuses text and vectors",
    "the fox and the dog are friends",
]


def bm25_oracle(docs, query, analyzer=None):
    """Independent BM25 implementation (Lucene formula)."""
    an = analyzer or Analyzer()
    toks = [an.tokenize(d) for d in docs]
    n = len(docs)
    avg = sum(len(t) for t in toks) / n
    qterms = list(dict.fromkeys(an.tokenize(query)))
    df = {t: sum(1 for d in toks if t in d) for t in qterms}
    scores = []
    for d in toks:
        s = 0.0
        for t in qterms:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(d) / avg))
        scores.append(s)
    return np.asarray(scores)


def test_inverted_index_matches_oracle():
    docs = np.array(DOCS, dtype=object)
    idx = InvertedIndex.build([docs], capacity=16)
    for query in ["quick brown fox", "lazy dog", "tpu kernels", "fox"]:
        vals, rows, terms = idx.bm25_topk(query, 10)
        vals, rows = np.asarray(vals)[0], np.asarray(rows)[0]
        want = bm25_oracle(DOCS, query)
        got = {int(r): float(v) for r, v in zip(rows, vals) if r >= 0}
        for r, v in got.items():
            assert abs(want[r] - v) < 1e-3, (query, r, v, want[r])
        # every doc with positive oracle score is returned (k=10=ndocs)
        assert set(got) == set(np.nonzero(want > 0)[0].tolist())


def test_operator_and():
    docs = np.array(DOCS, dtype=object)
    idx = InvertedIndex.build([docs], capacity=16)
    vals, rows, _ = idx.bm25_topk("quick fox", 10, operator="AND")
    rows = np.asarray(rows)[0]
    got = {int(r) for r in rows if r >= 0}
    assert got == {0, 4}  # only docs containing both terms


def test_term_bitmap():
    docs = np.array(DOCS, dtype=object)
    idx = InvertedIndex.build([docs], capacity=16)
    bm = idx.term_bitmap("dog")
    assert set(np.nonzero(bm)[0].tolist()) == {0, 3, 9}


def test_stats_merge_consistency():
    """BM25 over 2 segments with merged stats == BM25 over one segment
    holding all docs (the table-consistent stats contract)."""
    half = len(DOCS) // 2
    i1 = InvertedIndex.build([np.array(DOCS[:half], dtype=object)], capacity=8)
    i2 = InvertedIndex.build([np.array(DOCS[half:], dtype=object)], capacity=8)
    stats = BM25Stats.merge([i1.stats, i2.stats])
    whole = InvertedIndex.build([np.array(DOCS, dtype=object)], capacity=16)
    q = "quick dog"
    v1, r1, _ = i1.bm25_topk(q, 5, stats=stats)
    v2, r2, _ = i2.bm25_topk(q, 5, stats=stats)
    vw, rw, _ = whole.bm25_topk(q, 10, stats=whole.stats)
    got = {}
    for v, r, off in [(v1, r1, 0), (v2, r2, half)]:
        for val, row in zip(np.asarray(v)[0], np.asarray(r)[0]):
            if row >= 0:
                got[int(row) + off] = float(val)
    want = {
        int(r): float(v)
        for v, r in zip(np.asarray(vw)[0], np.asarray(rw)[0])
        if r >= 0
    }
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-3


def test_state_roundtrip():
    docs = np.array(DOCS, dtype=object)
    idx = InvertedIndex.build([docs], capacity=16)
    idx2 = InvertedIndex.from_state_dict(idx.state_dict())
    v1, r1, _ = idx.bm25_topk("quick fox", 5)
    v2, r2, _ = idx2.bm25_topk("quick fox", 5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


# ---------------------------------------------------------------- fusion
def test_rank_fusion_formula():
    legs = [[("a"), ("b"), ("c")], [("b"), ("a")]]
    out = rank_fusion(legs, 3, fusion_k=60)
    scores = dict(out)
    assert abs(scores["a"] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(scores["b"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(scores["c"] - 1 / 63) < 1e-12


def test_relative_score_fusion_direction():
    vec = [(("s", 1), 0.0), (("s", 2), 10.0)]  # L2: smaller better -> 1 best
    text = [(("s", 2), 5.0), (("s", 3), 1.0)]  # BM25: bigger better -> 2 best
    out = dict(relative_score_fusion(vec, text, 3, fusion_weight=0.5))
    assert abs(out[("s", 1)] - 0.5) < 1e-9  # best vec, no text
    assert abs(out[("s", 2)] - 0.5) < 1e-9  # worst vec (0) + best text (0.5)
    assert abs(out[("s", 3)] - 0.0) < 1e-9


# ------------------------------------------------------------- table api
def make_table(db, rng, segments=2):
    d = 16
    t = db.create_table(
        "txt",
        ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(d)}),
    )
    n = len(DOCS)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t.add_fts_index("fts", "body")
    for s in range(segments):
        sl = slice(s * n // segments, (s + 1) * n // segments)
        ids = np.arange(sl.start, sl.stop, dtype=np.uint64)
        t.insert(
            {
                "id": ids,
                "body": np.array(DOCS[sl], dtype=object),
                "vec": vecs[sl],
            }
        )
    return t, vecs


def test_table_text_search(db, rng):
    t, vecs = make_table(db, rng)
    res = t.text_search("body", "quick brown fox", k=5)
    ids = t.gather(res, ["id"])["id"][0]
    want = bm25_oracle(DOCS, "quick brown fox")
    order = np.argsort(-want, kind="stable")
    top = [int(i) for i in order[: (want > 0).sum()]][:5]
    assert ids[0] in (0, 4)  # strongest matches
    got = set(int(i) for i, v in zip(ids, res.valid[0]) if v)
    assert got == set(top[: len(got)]) or got <= set(np.nonzero(want > 0)[0].tolist())
    # scores descending
    s = res.scores[0][res.valid[0]]
    assert np.all(np.diff(s) <= 1e-6)


def test_table_text_search_filtered(db, rng):
    t, vecs = make_table(db, rng)
    res = t.text_search("body", "dog", k=5, filter=F("id") >= 3)
    ids = t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int)
    assert set(ids) <= {3, 9}


def test_table_text_search_after_delete(db, rng):
    t, vecs = make_table(db, rng)
    t.delete(F("id") == 0)
    res = t.text_search("body", "quick brown fox", k=5)
    ids = t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int)
    assert 0 not in ids


def test_table_hybrid_search(db, rng):
    t, vecs = make_table(db, rng)
    # query vector near doc 7, text strongly matching doc 0 -> both surface
    res = t.hybrid_search("vec", "body", vecs[7], "quick brown fox", k=5, fusion_type="rrf")
    ids = t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int)
    assert 7 in ids  # vector leg
    assert (0 in ids) or (4 in ids)  # text leg
    res2 = t.hybrid_search(
        "vec", "body", vecs[7], "quick brown fox", k=5, fusion_type="rsf", fusion_weight=0.4
    )
    ids2 = t.gather(res2, ["id"])["id"][0][res2.valid[0]].astype(int)
    assert 7 in ids2
    s = res2.scores[0][res2.valid[0]]
    assert np.all(np.diff(s) <= 1e-6)


def test_fts_index_ddl_errors(db, rng):
    t, vecs = make_table(db, rng)
    with pytest.raises(ms.IndexParameterError):
        t.add_fts_index("fts", "body")  # duplicate
    with pytest.raises(ms.SchemaError):
        t.add_fts_index("f2", "vec")  # not a string column
    with pytest.raises(ms.SchemaError):
        t.text_search("nope", "hello")
    t.drop_fts_index("fts")
    with pytest.raises(ms.SchemaError):
        t.text_search("body", "hello")


def test_sparse_dense_bm25_agree(rng):
    """The candidate-sparse kernel must rank identically to the dense
    scatter kernel (scores to f32 summation tolerance), incl. AND
    semantics and masks."""
    import jax.numpy as jnp

    from myscaledb_tpu.text import inverted as inv

    words = [f"w{i}" for i in range(50)]
    docs = np.array(
        [" ".join(rng.choice(words, 8)) for _ in range(3000)], dtype=object
    )
    idx = inv.InvertedIndex.build([docs], capacity=3072, use_native=False)
    queries = [" ".join(rng.choice(words, 3)) for _ in range(7)] + ["w0", ""]
    mask = np.zeros(3072, bool)
    mask[: 1500] = True
    for op in ("OR", "AND"):
        for m in (None, jnp.asarray(mask)):
            sp, smc = inv.SPARSE_CAP, inv.SPARSE_MIN_CAPACITY
            try:
                inv.SPARSE_CAP, inv.SPARSE_MIN_CAPACITY = 1 << 30, 0  # sparse
                v1, r1, _, _ = idx.bm25_topk_batch(queries, 5, operator=op, mask=m)
                inv.SPARSE_CAP = 0  # force dense
                v2, r2, _, _ = idx.bm25_topk_batch(queries, 5, operator=op, mask=m)
            finally:
                inv.SPARSE_CAP, inv.SPARSE_MIN_CAPACITY = sp, smc
            v1, v2 = np.asarray(v1), np.asarray(v2)
            r1, r2 = np.asarray(r1), np.asarray(r2)
            fin = np.isfinite(v1)
            assert np.array_equal(fin, np.isfinite(v2))
            # identical score ladders (row sets may differ on exact ties)
            np.testing.assert_allclose(v1[fin], v2[fin], rtol=1e-4)
            # every returned row genuinely achieves its reported score
            an = idx.analyzer
            doc_toks = [an.tokenize(str(d)) for d in docs]
            stats = idx.stats
            k1, b = inv.BM25_K1, inv.BM25_B
            for rr, vv in ((r1, v1), (r2, v2)):
                for q, qtext in enumerate(queries):
                    terms = list(dict.fromkeys(an.tokenize(qtext)))
                    for j in range(5):
                        row = int(rr[q, j])
                        if row < 0:
                            continue
                        if m is not None and not mask[row]:
                            raise AssertionError((q, row, "masked row returned"))
                        dl = len(doc_toks[row])
                        want = 0.0
                        nmatch = 0
                        for term in terms:
                            tf = doc_toks[row].count(term)
                            if tf:
                                nmatch += 1
                                want += stats.idf(term) * tf * (k1 + 1) / (
                                    tf + k1 * (1 - b + b * dl / stats.avg_doc_len)
                                )
                        if op == "AND" and nmatch < len(terms):
                            raise AssertionError((q, row, "AND violated"))
                        assert abs(want - vv[q, j]) < 1e-3 * (1 + abs(want)), (
                            q, row, want, vv[q, j],
                        )
