"""Index format versioning + upgrade (convertIndexFileForUpgrade,
VIWithDataPart.h:456) and interrupted-persist resume
(VIBuilderUpdater.cpp:541-551)."""

import json
import os
import shutil

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import PersistenceError
from myscaledb_tpu.storage import persistence


def _build_ivf_table(db, n=3000, dim=16):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 1
    t = db.create_table(
        "t", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(dim)}), settings=st
    )
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "vec": vecs})
    t.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=16)
    t.wait_index_built(60)
    return t, vecs


def test_v1_dir_upgrades_on_load(tmp_path):
    d = ms.connect(path=str(tmp_path))
    try:
        t, vecs = _build_ivf_table(d)
        t.persist()
    finally:
        d.close()
    idir = str(tmp_path / "t" / "segment_0" / "index_ivf")
    # rewrite the dir as a round-1 (v1) artifact: no format_version field
    with open(os.path.join(idir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["format_version"] == persistence.INDEX_FORMAT_VERSION
    meta.pop("format_version")
    with open(os.path.join(idir, "meta.json"), "w") as f:
        json.dump(meta, f)
    persistence._write_checksums(idir, ["meta.json", "arrays.npz"])
    inst = persistence.load_index(idir)
    assert inst is not None and inst.n_rows == 3000
    # the dir was rewritten in the current format
    with open(os.path.join(idir, "meta.json")) as f:
        assert json.load(f)["format_version"] == persistence.INDEX_FORMAT_VERSION
    # and still searches after a fresh load
    d2 = ms.connect(path=str(tmp_path))
    try:
        t2 = d2.load_table("t")
        r = t2.search("vec", vecs[5], k=1)
        assert r.valid[0, 0]
    finally:
        d2.close()


def test_future_version_rejected(tmp_path):
    d = ms.connect(path=str(tmp_path))
    try:
        t, _ = _build_ivf_table(d)
        t.persist()
    finally:
        d.close()
    idir = str(tmp_path / "t" / "segment_0" / "index_ivf")
    with open(os.path.join(idir, "meta.json")) as f:
        meta = json.load(f)
    meta["format_version"] = persistence.INDEX_FORMAT_VERSION + 1
    with open(os.path.join(idir, "meta.json"), "w") as f:
        json.dump(meta, f)
    persistence._write_checksums(idir, ["meta.json", "arrays.npz"])
    with pytest.raises(PersistenceError, match="newer"):
        persistence.load_index(idir)


def test_interrupted_persist_resumes(tmp_path):
    d = ms.connect(path=str(tmp_path))
    try:
        t, vecs = _build_ivf_table(d)
        t.persist()
    finally:
        d.close()
    sdir = str(tmp_path / "t" / "segment_0")
    idir = os.path.join(sdir, "index_ivf")
    # simulate a crash between serialize and rename: valid tmp, no final
    os.rename(idir, idir + ".tmp")
    assert not os.path.isdir(idir)
    d2 = ms.connect(path=str(tmp_path))
    try:
        t2 = d2.load_table("t")
        assert os.path.isdir(idir)  # resumed, not rebuilt
        rows = t2.system_vector_index_segments()
        assert rows and rows[0]["status"] in ("Built", "Loaded")
        r = t2.search("vec", vecs[9], k=1)
        ids = t2.gather(r, ["id"])["id"]
        assert ids[0, 0] == 9
    finally:
        d2.close()


def test_torn_tmp_discarded(tmp_path):
    d = ms.connect(path=str(tmp_path))
    try:
        t, _ = _build_ivf_table(d)
        t.persist()
    finally:
        d.close()
    sdir = str(tmp_path / "t" / "segment_0")
    idir = os.path.join(sdir, "index_ivf")
    os.rename(idir, idir + ".tmp")
    # corrupt the tmp (torn write)
    with open(os.path.join(idir + ".tmp", "arrays.npz"), "r+b") as f:
        f.seek(100)
        f.write(b"\x00garbage\x00")
    n = persistence.resume_tmp_index_dirs(sdir)
    assert n == 0
    assert not os.path.isdir(idir + ".tmp")  # discarded
    assert not os.path.isdir(idir)


def test_save_is_atomic_over_existing(tmp_path):
    d = ms.connect(path=str(tmp_path))
    try:
        t, vecs = _build_ivf_table(d)
        t.persist()
        t.persist()  # second persist overwrites atomically (tmp+rename)
        idir = str(tmp_path / "t" / "segment_0" / "index_ivf")
        assert os.path.isdir(idir)
        assert not os.path.isdir(idir + ".tmp")
        persistence.load_index(idir)
    finally:
        d.close()
