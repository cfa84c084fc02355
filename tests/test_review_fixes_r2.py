"""Regression tests for the round-2 code-review findings."""

import threading
import time

import numpy as np
import pytest

import myscaledb_tpu as ms


def test_multi_distance_offset_alignment(db, rng):
    """Secondary distance() columns must align with OFFSET-sliced rows."""
    d = 8
    db.sql(
        "CREATE TABLE md (id UInt64, v1 Array(Float32), v2 Array(Float32), "
        "CONSTRAINT c1 CHECK length(v1) = 8, CONSTRAINT c2 CHECK length(v2) = 8)"
    )
    t = db.table("md")
    n = 50
    v1 = rng.standard_normal((n, d)).astype(np.float32)
    v2 = rng.standard_normal((n, d)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "v1": v1, "v2": v2})
    q1 = [0.0] * d
    q2l = ", ".join(str(float(x)) for x in v2[3])
    q1l = ", ".join("0.0" for _ in range(d))
    rows = db.sql(
        f"SELECT id, distance(v1, [{q1l}]) AS d1, distance(v2, [{q2l}]) AS d2 "
        "FROM md ORDER BY d1 ASC LIMIT 5 OFFSET 3"
    )
    assert len(rows) == 5
    # d2 must equal the true distance of THAT row's v2 (not the row at
    # position 0..4 of the unsliced result)
    for r in rows:
        i = int(r["id"])
        want = float(((v2[i].astype(np.float64) - v2[3]) ** 2).sum())
        assert abs(r["d2"] - want) < 1e-2 * (1 + want), (i, r["d2"], want)


def test_server_close_resolves_spilled_requests(db, rng):
    """A request spilled from another group's batch must still execute
    (or fail loudly) when close() races it — never hang its caller."""
    from myscaledb_tpu.service.server import SearchServer

    t = db.create_table(
        "s", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)})
    )
    v = rng.standard_normal((500, 8)).astype(np.float32)
    t.insert({"id": np.arange(500, dtype=np.uint64), "vec": v})
    srv = SearchServer(db, max_batch=8, max_delay_ms=30.0)
    f1 = srv.submit_search("s", "vec", v[1], 3)          # group K1
    f2 = srv.submit_search("s", "vec", v[2], 5)          # group K2 (spills)
    srv.close()
    # both futures must resolve (result or exception) promptly
    for f in (f1, f2):
        try:
            out = f.result(timeout=30)
            assert out["valid"].any()
        except RuntimeError as e:
            assert "closed" in str(e)


def test_local_store_rejects_sibling_escape(tmp_path):
    from myscaledb_tpu.errors import PersistenceError
    from myscaledb_tpu.storage.stores import LocalStore

    root = tmp_path / "store"
    root.mkdir()
    (tmp_path / "store-other").mkdir()
    st = LocalStore(str(root))
    st.put("ok/key", b"fine")
    assert st.get("ok/key") == b"fine"
    for bad in ("../store-other/x", "../../etc/passwd", "a/../../b"):
        with pytest.raises(PersistenceError):
            st.put(bad, b"nope")


def test_host_tier_build_memory_estimate_bounded():
    """Host-tier payloads must not count their host-RAM footprint as
    device memory (the beyond-HBM tier exists for exactly that case)."""
    from myscaledb_tpu.index.ivf import MSTGIndex

    class FakeHostPayload:
        is_host = True
        nbytes = 40 * (1 << 30)  # 40 GB host corpus

        class data:
            shape = (100_000_000, 128)

    est = MSTGIndex.estimate_build_bytes(FakeHostPayload(), 100_000_000)
    # sample (256k x 128 f32) + 2 x compressed bytes — far below 40 GB x2
    assert est < 30 * (1 << 30)
