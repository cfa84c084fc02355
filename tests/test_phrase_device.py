"""Device-side phrase verification over the document-ordered token
stream (replaces per-candidate Python re-tokenization). Contract: same
results as the host adjacency verifier for hasPhrase and NLQ phrases."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.service.event_log import GLOBAL_COUNTERS
from myscaledb_tpu.text.inverted import InvertedIndex


DOCS = [
    "the quick brown fox",          # 0: phrase 'quick brown' yes
    "brown quick the fox",          # 1: both terms, wrong order
    "quick and brown",              # 2: both terms, not adjacent
    "a quick brown quick brown b",  # 3: two occurrences
    "quick",                        # 4: ends with first term (boundary)
    "brown day quick",              # 5
    "",                             # 6 empty
    "quick brown",                  # 7 whole doc is the phrase
]
# doc 4 ends with 'quick' and doc 5 starts with 'brown': a cross-doc
# adjacency the kernel must NOT count.


@pytest.mark.parametrize("use_native", [True, False])
def test_phrase_counts_match_host(use_native):
    idx = InvertedIndex.build(
        [np.asarray(DOCS, object)], capacity=16, use_native=use_native
    )
    toks = idx.analyzer.tokenize("quick brown")
    counts = np.asarray(idx.phrase_counts_device(toks))
    assert counts[:8].tolist() == [1, 0, 0, 2, 0, 0, 0, 1]
    assert (counts[8:] == 0).all()
    bm = idx.phrase_bitmap(toks)
    assert bm.tolist() == [True, False, False, True, False, False, False, True]


def test_phrase_three_terms_and_absent():
    idx = InvertedIndex.build([np.asarray(DOCS, object)], capacity=16)
    t3 = idx.analyzer.tokenize("quick brown fox")
    assert idx.phrase_bitmap(t3).tolist() == [
        True, False, False, False, False, False, False, False
    ]
    absent = idx.analyzer.tokenize("quick zebra")
    assert not idx.phrase_bitmap(absent).any()


def test_phrase_single_term():
    idx = InvertedIndex.build([np.asarray(DOCS, object)], capacity=16)
    one = idx.analyzer.tokenize("quick")
    bm = idx.phrase_bitmap(one)
    want = idx.term_bitmap("quick")
    assert np.array_equal(bm, want)


def test_stream_survives_persistence(tmp_path):
    idx = InvertedIndex.build([np.asarray(DOCS, object)], capacity=16)
    st = idx.state_dict()
    assert "token_stream" in st["arrays"]
    idx2 = InvertedIndex.from_state_dict(st)
    toks = idx.analyzer.tokenize("quick brown")
    assert np.array_equal(idx2.phrase_bitmap(toks), idx.phrase_bitmap(toks))
    # pre-stream index: no stream -> graceful None (host fallback)
    st["arrays"].pop("token_stream")
    idx3 = InvertedIndex.from_state_dict(st)
    assert idx3.phrase_bitmap(toks) is None


def test_has_phrase_filter_uses_device_path(db):
    t = db.create_table(
        "phd", ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(4)})
    )
    n = len(DOCS)
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.asarray(DOCS, object),
            "vec": np.zeros((n, 4), np.float32),
        }
    )
    t.add_fts_index("ft", "body")
    before = GLOBAL_COUNTERS.snapshot().get("FTSDevicePhraseChecks", 0)
    res = t.search(
        "vec", np.zeros(4, np.float32), k=n, filter=t.has_phrase("body", "quick brown")
    )
    after = GLOBAL_COUNTERS.snapshot().get("FTSDevicePhraseChecks", 0)
    assert after > before
    ids = sorted(t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int).tolist())
    assert ids == [0, 3, 7]


def test_nlq_phrase_uses_device_path(db):
    t = db.create_table(
        "phn", ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(4)})
    )
    n = len(DOCS)
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "body": np.asarray(DOCS, object),
            "vec": np.zeros((n, 4), np.float32),
        }
    )
    t.add_fts_index("ft", "body")
    res = t.text_search("ft", '"quick brown" -day', k=n, enable_nlq=True)
    ids = sorted(t.gather(res, ["id"])["id"][0][res.valid[0]].astype(int).tolist())
    assert ids == [0, 3, 7]
