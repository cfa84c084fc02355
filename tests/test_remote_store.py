"""Object-store cold tier (the reference's S3/remote-disk storage
policies — 00036_mqvs_vector_index_s3.sh): manifest-last commit, sha
verification, cold-start restore, and the S3 wire protocol against an
injected fake client."""

import json

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import PersistenceError
from myscaledb_tpu.storage.stores import (
    MANIFEST,
    LocalStore,
    MemoryStore,
    S3Store,
    store_from_url,
    sync_dir_from_store,
    sync_dir_to_store,
)


def _remote_settings():
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 1
    st.table.storage_policy = "remote"
    return st


def _make_db(tmp_path, store, sub):
    return ms.connect(path=str(tmp_path / sub), remote_store=store)


def test_persist_and_cold_start_restore(tmp_path):
    store = MemoryStore()
    db = _make_db(tmp_path, store, "warm")
    t = db.create_table(
        "tt",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)}),
        settings=_remote_settings(),
    )
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((64, 8)).astype(np.float32)
    t.insert({"id": np.arange(64, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("iv", "vec", type="IVFFLAT", ncentroids=4, metric_type="L2")
    t.wait_index_built(timeout=120)
    t.persist()
    assert store.exists(f"tables/tt/{MANIFEST}")
    db.close()

    # cold start: brand-new local path, same store
    db2 = _make_db(tmp_path, store, "cold")
    t2 = db2.load_table("tt")
    q = vecs[:3]
    r = t2.search("vec", q, k=1)
    assert list(np.asarray(r.rows)[:, 0]) == [0, 1, 2]
    assert t2.system_vector_indices()[0]["status"] in ("Built", "Loaded")
    db2.close()


def test_no_manifest_means_not_committed(tmp_path):
    store = MemoryStore()
    db = _make_db(tmp_path, store, "warm")
    t = db.create_table(
        "tt",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(4)}),
        settings=_remote_settings(),
    )
    t.insert({"id": np.arange(8, dtype=np.uint64),
              "vec": np.eye(8, 4, dtype=np.float32)})
    t.persist()
    store.delete(f"tables/tt/{MANIFEST}")  # torn upload: no commit point
    db.close()
    db2 = _make_db(tmp_path, store, "cold")
    with pytest.raises(Exception):
        db2.load_table("tt")
    db2.close()


def test_sha_verification_on_download(tmp_path):
    store = MemoryStore()
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "a.bin").write_bytes(b"hello")
    sync_dir_to_store(store, "p", str(tmp_path / "src"))
    store.put("p/a.bin", b"tampered")
    with pytest.raises(PersistenceError, match="sha mismatch"):
        sync_dir_from_store(store, "p", str(tmp_path / "dst"))


def test_sync_skips_unchanged_and_prunes_stale(tmp_path):
    class CountingStore(MemoryStore):
        def __init__(self):
            super().__init__()
            self.puts = 0

        def put(self, key, data):
            self.puts += 1
            super().put(key, data)

    store = CountingStore()
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(b"aaaa")
    (src / "b.bin").write_bytes(b"bbbb")
    sync_dir_to_store(store, "p", str(src))
    first = store.puts  # 2 files + manifest
    (src / "b.bin").unlink()
    (src / "c.bin").write_bytes(b"cccc")
    sync_dir_to_store(store, "p", str(src))
    # second sync: only c.bin + manifest uploaded, b.bin pruned
    assert store.puts == first + 2
    assert not store.exists("p/b.bin")
    assert store.exists("p/c.bin")
    dst = tmp_path / "dst"
    assert sync_dir_from_store(store, "p", str(dst))
    assert sorted(f.name for f in dst.iterdir()) == ["a.bin", "c.bin"]


def test_s3_store_protocol_with_fake_client():
    class FakeBody:
        def __init__(self, b):
            self._b = b

        def read(self):
            return self._b

    class FakeS3Client:
        def __init__(self):
            self.objects = {}

        def put_object(self, Bucket, Key, Body):
            self.objects[(Bucket, Key)] = bytes(Body)

        def get_object(self, Bucket, Key):
            if (Bucket, Key) not in self.objects:
                raise KeyError(Key)
            return {"Body": FakeBody(self.objects[(Bucket, Key)])}

        def head_object(self, Bucket, Key):
            if (Bucket, Key) not in self.objects:
                raise KeyError(Key)
            return {}

        def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
            keys = sorted(
                k for (b, k) in self.objects if b == Bucket and k.startswith(Prefix)
            )
            return {
                "Contents": [{"Key": k} for k in keys],
                "IsTruncated": False,
            }

        def delete_object(self, Bucket, Key):
            self.objects.pop((Bucket, Key), None)

    client = FakeS3Client()
    s = S3Store("bkt", "root", client=client)
    s.put("x/a", b"1")
    s.put("x/b", b"2")
    assert s.exists("x/a") and not s.exists("x/zz")
    assert s.get("x/b") == b"2"
    assert s.list_prefix("x/") == ["x/a", "x/b"]
    assert ("bkt", "root/x/a") in client.objects  # prefixed wire keys
    s.delete("x/a")
    assert s.list_prefix("x/") == ["x/b"]
    with pytest.raises(PersistenceError):
        s.get("x/a")


def test_local_store_and_urls(tmp_path):
    s = store_from_url(f"file://{tmp_path}/store")
    assert isinstance(s, LocalStore)
    s.put("d/e/f.bin", b"xyz")
    assert s.get("d/e/f.bin") == b"xyz"
    assert s.list_prefix("d/") == ["d/e/f.bin"]
    s.delete("d/e/f.bin")
    assert not s.exists("d/e/f.bin")
    with pytest.raises(PersistenceError):
        s.put("../escape", b"no")
    assert isinstance(store_from_url("mem://"), MemoryStore)
    with pytest.raises(PersistenceError):
        store_from_url("gs://nope")
