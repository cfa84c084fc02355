"""Concurrent serving: request coalescing + HTTP front end (the server /
QPS-vs-connections story, tests/vector_search/benchmark.py:50-80 protocol)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.service.event_log import GLOBAL_COUNTERS
from myscaledb_tpu.service.server import HttpFrontend, SearchServer


@pytest.fixture()
def served(db):
    t = db.create_table(
        "t",
        ms.Schema({"id": ms.UInt64(), "doc": ms.String(), "vec": ms.FloatVector(16)}),
    )
    rng = np.random.default_rng(0)
    n = 2000
    vecs = rng.standard_normal((n, 16)).astype(np.float32)
    t.insert(
        {
            "id": np.arange(n, dtype=np.uint64),
            "doc": np.asarray([f"word{i % 13} text" for i in range(n)], dtype=object),
            "vec": vecs,
        }
    )
    t.add_fts_index("ft", "doc")
    return t, vecs


def test_server_coalesces_concurrent_requests(db, served):
    t, vecs = served
    srv = SearchServer(db, max_batch=64, max_delay_ms=20.0)
    try:
        before = GLOBAL_COUNTERS.get("ServerBatches")
        futs = [
            srv.submit_search("t", "vec", vecs[i], 3) for i in range(32)
        ]
        outs = [f.result(timeout=30) for f in futs]
        for i, o in enumerate(outs):
            assert o["rows"][0] == i  # each caller got ITS query's result
        batches = GLOBAL_COUNTERS.get("ServerBatches") - before
        assert batches < 32  # coalesced, not one program per request
    finally:
        srv.close()


def test_server_concurrent_threads(db, served):
    t, vecs = served
    srv = SearchServer(db, max_batch=128, max_delay_ms=5.0)
    errs = []

    def client(lo, hi):
        try:
            for i in range(lo, hi):
                out = srv.search("t", "vec", vecs[i], 1)
                assert out["rows"][0] == i, (i, out["rows"])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    try:
        threads = [
            threading.Thread(target=client, args=(w * 10, w * 10 + 10))
            for w in range(8)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert not errs, errs
    finally:
        srv.close()


def test_server_text_and_hybrid(db, served):
    t, vecs = served
    srv = SearchServer(db, max_delay_ms=5.0)
    try:
        out = srv.text_search("t", "doc", "word5", 4)
        assert all(r % 13 == 5 for r in out["rows"][out["valid"]])
        out = srv.hybrid_search("t", "vec", "doc", vecs[7], "word7", 5)
        assert out["valid"].any()
    finally:
        srv.close()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_frontend(db, served):
    t, vecs = served
    front = HttpFrontend(db, max_delay_ms=2.0)
    try:
        out = _post(
            front.port,
            "/search",
            {"table": "t", "column": "vec", "vector": vecs[9].tolist(), "k": 3,
             "gather": ["id"]},
        )
        assert out["rows"][0] == 9
        assert out["columns"]["id"][0] == 9
        out = _post(
            front.port,
            "/text_search",
            {"table": "t", "index": "ft", "query": "word3", "k": 5},
        )
        assert all(r % 13 == 3 for r in out["rows"])
        out = _post(front.port, "/sql", {"query": "SELECT count(*) FROM t"})
        assert out["rows"][0]["count()"] == 2000
        # error surface
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            _post(front.port, "/search", {"table": "missing", "column": "x",
                                          "vector": [0.0], "k": 1})
    finally:
        front.close()


def test_http_batched_search_and_keepalive(db, served):
    t, vecs = served
    front = HttpFrontend(db, max_delay_ms=2.0)
    try:
        # batched form: M queries in one request/response (RTT amortized)
        out = _post(
            front.port,
            "/search",
            {"table": "t", "column": "vec",
             "vectors": [vecs[3].tolist(), vecs[11].tolist()], "k": 2},
        )
        assert out["results"][0]["rows"][0] == 3
        assert out["results"][1]["rows"][0] == 11
        # HTTP/1.1 keep-alive: two requests over ONE connection
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", front.port, timeout=30)
        for i in (5, 8):
            body = json.dumps(
                {"table": "t", "column": "vec", "vector": vecs[i].tolist(),
                 "k": 1}
            )
            conn.request("POST", "/search", body,
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.version == 11
            assert json.loads(r.read())["rows"][0] == i
        conn.close()
    finally:
        front.close()


def test_adaptive_flush_tracks_bursts(db, served):
    t, vecs = served
    srv = SearchServer(db, max_batch=64, max_delay_ms=50.0)
    try:
        assert srv.adaptive_flush and srv._expected == 1
        # a lone blocking client must not pay the 50 ms coalescing delay
        import time

        srv.search("t", "vec", vecs[0], 1)  # warm (compile + expected=1)
        t0 = time.time()
        out = srv.search("t", "vec", vecs[1], 1)
        dt = time.time() - t0
        assert out["rows"][0] == 1
        assert dt < 0.05, f"single sync call waited the full delay ({dt:.3f}s)"
        # a burst grows the tracker so later rounds wait for the full burst
        futs = [srv.submit_search("t", "vec", vecs[i], 1) for i in range(16)]
        for i, f in enumerate(futs):
            assert f.result(timeout=30)["rows"][0] == i
        assert srv._expected > 1
    finally:
        srv.close()
