"""FTS query surface: phrase/regex/LIKE/multiSearchAny predicate
acceleration, NLQ, and FROM-clause table functions (TantivyFilter.h:35-41,
MergeTreeIndexTantivy.h:141-180, TableFunctionFullTextSearch.cpp)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F

DOCS = [
    "the quick brown fox jumps over the lazy dog",        # 0
    "a lazy brown dog sleeps all day",                    # 1
    "quick silver fox hunting at night",                  # 2
    "the dog chases the quick fox",                       # 3
    "brown bears eat honey and fish",                     # 4
    "foxhound puppies play in the yard",                  # 5
    "night sky full of quick shooting stars",             # 6
]


@pytest.fixture()
def t(db):
    t = db.create_table(
        "t",
        ms.Schema({"id": ms.UInt64(), "doc": ms.String(), "vec": ms.FloatVector(8)}),
    )
    rng = np.random.default_rng(0)
    t.insert(
        {
            "id": np.arange(len(DOCS), dtype=np.uint64),
            "doc": np.asarray(DOCS, dtype=object),
            "vec": rng.standard_normal((len(DOCS), 8)).astype(np.float32),
        }
    )
    t.add_fts_index("ft", "doc")
    return t


def _match_ids(t, expr):
    seg = t.live_segments()[0]
    return set(np.nonzero(expr.evaluate(seg))[0].tolist())


def test_phrase_filter(t):
    assert _match_ids(t, t.has_phrase("doc", "quick brown fox")) == {0}
    assert _match_ids(t, t.has_phrase("doc", "brown fox")) == {0}
    # both words present but not adjacent -> no match
    assert _match_ids(t, t.has_phrase("doc", "quick dog")) == set()
    assert _match_ids(t, t.has_phrase("doc", "the quick")) == {0, 3}


def test_regex_token_filter(t):
    assert _match_ids(t, t.has_token_matching("doc", "fox.*")) == {0, 2, 3, 5}
    assert _match_ids(t, t.has_token_matching("doc", "bears?")) == {4}


def test_like_acceleration_matches_plain(t):
    seg = t.live_segments()[0]
    for pat in ("%quick brown fox%", "%lazy%", "%the dog chases%", "th%fox"):
        fast = t.like("doc", pat).evaluate(seg)
        slow = F("doc").like(pat).evaluate(seg)
        assert np.array_equal(fast, slow), pat
    # negated
    fast = t.like("doc", "%lazy%", negate=True).evaluate(seg)
    from myscaledb_tpu.search.filters import Like
    slow = Like("doc", "%lazy%", negate=True).evaluate(seg)
    assert np.array_equal(fast, slow)


def test_multi_search_any(t):
    assert _match_ids(t, t.multi_search_any("doc", ["shooting stars", "honey"])) == {4, 6}
    assert _match_ids(t, t.multi_search_any("doc", ["oxhoun"])) == {5}  # substring


def test_filters_compose_with_search(t, rng):
    q = np.asarray(rng.standard_normal(8), np.float32)
    res = t.search("vec", q, k=7, filter=t.has_phrase("doc", "quick fox"))
    ids = t.gather(res, ["id"])["id"][0][res.valid[0]]
    assert set(ids.tolist()) == {3}


def test_nlq(t):
    # phrase + exclusion: quick-scored docs containing "quick" but not dog
    res = t.text_search("doc", 'quick -dog', k=7, enable_nlq=True)
    ids = set(res.rows[0][res.valid[0]].tolist())
    assert ids == {2, 6}
    # quoted phrase must match adjacently
    res = t.text_search("doc", '"quick brown fox"', k=7, enable_nlq=True)
    ids = set(res.rows[0][res.valid[0]].tolist())
    assert ids == {0}
    # without nlq the same string is just tokens (quotes stripped by the
    # analyzer): docs with any of the words match
    res = t.text_search("doc", '"quick brown fox"', k=7, enable_nlq=False)
    assert len(set(res.rows[0][res.valid[0]].tolist())) > 1


def test_sql_haslike_predicates(db, t):
    rows = db.sql(
        "SELECT id FROM t WHERE hasToken(doc, 'lazy') ORDER BY id"
    )
    assert [r["id"] for r in rows] == [0, 1]
    rows = db.sql(
        "SELECT id FROM t WHERE multiSearchAny(doc, ['honey', 'stars']) ORDER BY id"
    )
    assert [r["id"] for r in rows] == [4, 6]
    rows = db.sql("SELECT id FROM t WHERE doc LIKE '%silver fox%'")
    assert [r["id"] for r in rows] == [2]


def test_sql_textsearch_nlq(db, t):
    rows = db.sql(
        "SELECT id, textsearch('enable_nlq=1')(doc, 'quick -dog') AS s "
        "FROM t ORDER BY s DESC LIMIT 7"
    )
    assert {r["id"] for r in rows} == {2, 6}


def test_sql_table_functions(db, t):
    rows = db.sql(
        "SELECT * FROM full_text_search(t, ft, 'quick fox', 1) LIMIT 3"
    )
    assert len(rows) == 3
    assert all("bm25_score" in r and "id" in r for r in rows)
    assert rows[0]["bm25_score"] >= rows[-1]["bm25_score"]
    rows = db.sql("SELECT id FROM full_text_search(t, ft, 'honey')")
    assert [r["id"] for r in rows] == [4]
    stats = db.sql("SELECT * FROM ftsIndex(t, ft, 'quick fox')")
    assert stats[0]["total_docs"] == len(DOCS)
    assert stats[0]["doc_freq"]["quick"] == 4


def test_python_table_function_api(db, t):
    rows = db.full_text_search("t", "ft", "lazy", k=5)
    assert {r["id"] for r in rows} == {0, 1}
