"""HTTP replica index exchange (the DataPartsExchange network path):
builder serves persisted indexes over HTTP; the peer downloads into a
vector_tmp_* staging dir, verifies checksums, and atomically installs."""

import json
import os
import urllib.request

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.index.base import IndexStatus
from myscaledb_tpu.service.exchange import IndexExchangeServer, fetch_index
from myscaledb_tpu.service.replication import pick_build_replica


def _settings():
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    st.table.build_vector_index_on_random_single_replica = True
    st.table.storage_dtype = "float32"
    return st


def test_http_fetch_roundtrip(tmp_path, rng):
    """Two replicas with SEPARATE stores connected only by HTTP."""
    vecs = rng.standard_normal((3000, 16)).astype(np.float32)
    cols = {"id": np.arange(3000, dtype=np.uint64), "vec": vecs}
    schema = ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(16)})

    builder = pick_build_replica("r", 0, "ivf", 2)
    roots = [str(tmp_path / "a"), str(tmp_path / "b")]
    srv = IndexExchangeServer(roots[builder])
    try:
        peers = [None, None]
        peers[builder] = srv.url
        dbs = [
            ms.connect(
                _settings(), path=roots[i], replica_id=i, n_replicas=2,
                replica_peers=peers,
            )
            for i in range(2)
        ]
        ts = [
            db.create_table("r", ms.Schema(dict(schema.columns)), settings=_settings())
            for db in dbs
        ]
        for t in ts:
            t.insert(cols)
        # builder first, so the fetcher has something to download
        ts[builder].add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=8)
        assert ts[builder].wait_index_built(120)
        other = 1 - builder
        before = dbs[other].counters.get("ReplicatedPartVectorIndexFetches")
        ts[other].add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=8)
        assert ts[other].wait_index_built(120)
        assert (
            dbs[other].counters.get("ReplicatedPartVectorIndexFetches")
            == before + 1
        )
        # the fetched index actually serves searches
        r = ts[other].search("vec", vecs[5], k=3, params={"nprobe": 8})
        assert int(ts[other].gather(r, ["id"])["id"][0, 0]) == 5
        # and landed as a verified directory in the fetcher's OWN store
        d = os.path.join(roots[other], "r", "segment_0", "index_ivf")
        assert os.path.exists(os.path.join(d, "checksums.json"))
    finally:
        srv.close()
        for db in dbs:
            db.close()


def test_exchange_status_codes(tmp_path):
    os.makedirs(tmp_path / "t" / "segment_0" / "index_i")
    srv = IndexExchangeServer(str(tmp_path))
    try:
        # dir exists but no checksums.json yet -> "building"
        req = urllib.request.Request(f"{srv.url}/index/t/0/i")
        try:
            urllib.request.urlopen(req)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404 and e.headers["X-Index-Status"] == "building"
        # absent index
        try:
            urllib.request.urlopen(f"{srv.url}/index/t/0/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404 and e.headers["X-Index-Status"] == "absent"
    finally:
        srv.close()


def test_fetch_rejects_corrupt_files(tmp_path):
    d = tmp_path / "t" / "segment_0" / "index_i"
    os.makedirs(d)
    (d / "arrays.npz").write_bytes(b"payload")
    (d / "meta.json").write_text("{}")
    (d / "checksums.json").write_text(
        json.dumps({"arrays.npz": "0" * 64, "meta.json": "0" * 64})
    )
    srv = IndexExchangeServer(str(tmp_path))
    try:
        out = fetch_index(
            srv.url, "t", 0, "i", str(tmp_path / "dest"), timeout_s=5
        )
        assert out is None  # checksum mismatch -> no partial install
        assert not os.path.exists(tmp_path / "dest" / "segment_0" / "index_i")
    finally:
        srv.close()


def test_fetch_timeout_returns_none(tmp_path):
    srv = IndexExchangeServer(str(tmp_path))
    try:
        out = fetch_index(
            srv.url, "t", 0, "i", str(tmp_path / "dest"),
            timeout_s=0.5, poll_interval_s=0.1,
        )
        assert out is None
    finally:
        srv.close()
