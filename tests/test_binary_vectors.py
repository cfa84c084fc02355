"""Binary vectors: Hamming/Jaccard kernels vs numpy oracle; BinaryFLAT and
BinaryMSTG end-to-end (reference test 00038_mqvs_binary_vector_feature)."""

import jax.numpy as jnp
import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.ops import binary as binops


def _oracle(qbits, xbits, metric):
    if metric == Metric.HAMMING:
        return (qbits[:, None, :] != xbits[None, :, :]).sum(-1)
    inter = (qbits[:, None, :] & xbits[None, :, :]).sum(-1)
    union = (qbits[:, None, :] | xbits[None, :, :]).sum(-1)
    return 1.0 - np.where(union > 0, inter / np.maximum(union, 1), 1.0)


@pytest.mark.parametrize("metric", [Metric.HAMMING, Metric.JACCARD])
def test_binary_scan_vs_oracle(rng, metric):
    n, d, k, nq = 2048, 128, 10, 5
    xbits = rng.integers(0, 2, (n, d)).astype(bool)
    qbits = rng.integers(0, 2, (nq, d)).astype(bool)
    xp = jnp.asarray(np.packbits(xbits, axis=1))
    qp = jnp.asarray(np.packbits(qbits, axis=1))
    vals, idx = binops.binary_scan_topk(qp, xp, k=k, metric=metric, n_valid=n)
    vals, idx = np.asarray(vals), np.asarray(idx)
    dist = _oracle(qbits, xbits, metric)
    for i in range(nq):
        want_best = dist[i].min()
        got_dist = -vals[i, 0] if metric == Metric.HAMMING else 1.0 - vals[i, 0]
        assert abs(got_dist - want_best) < 1e-5
        # full set check: returned top-k distances == sorted top-k distances
        got = np.sort(
            -vals[i] if metric == Metric.HAMMING else 1.0 - vals[i]
        )
        want = np.sort(dist[i])[:k]
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_binary_table_end_to_end(db, rng):
    d = 256
    schema = ms.Schema({"id": ms.UInt64(), "bv": ms.BinaryVector(d)})
    t = db.create_table("bin", schema)
    bits = rng.integers(0, 2, (3000, d)).astype(bool)
    t.insert({"id": np.arange(3000, dtype=np.uint64), "bv": bits})
    q = bits[77]
    res = t.search("bv", q, k=3)  # default binary metric = Hamming
    assert res.metric == Metric.HAMMING
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 77
    assert res.distances[0, 0] == 0.0
    # distances ascending
    assert np.all(np.diff(res.distances[0]) >= 0)
    # jaccard
    res2 = t.search("bv", q, k=3, metric="Jaccard")
    assert int(t.gather(res2, ["id"])["id"][0, 0]) == 77
    assert res2.distances[0, 0] < 1e-6
    # filtered
    res3 = t.search("bv", q, k=3, filter=F("id") >= 100)
    ids = t.gather(res3, ["id"])["id"][0].astype(int)
    assert np.all(ids >= 100)


def test_binary_mstg_index(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 500
    d = 128
    t = db.create_table(
        "binm", ms.Schema({"id": ms.UInt64(), "bv": ms.BinaryVector(d)}), settings=st
    )
    # clustered binary data: flip a few bits of prototype patterns
    protos = rng.integers(0, 2, (20, d)).astype(bool)
    which = rng.integers(0, 20, 8000)
    bits = protos[which].copy()
    flips = rng.integers(0, d, (8000, 5))
    for i in range(8000):
        bits[i, flips[i]] ^= True
    t.insert({"id": np.arange(8000, dtype=np.uint64), "bv": bits})
    t.add_vector_index("bidx", "bv", type="BinaryMSTG", ncentroids=16)
    assert t.wait_index_built()
    assert t.system_vector_indices()[0]["type"] == "BinaryMSTG"
    res = t.search("bv", bits[123], k=5, params={"nprobe": 8})
    assert int(t.gather(res, ["id"])["id"][0, 0]) == 123
    # binary FLAT shorthand remap (FLAT on binary column -> BinaryFLAT)
    t2 = db.create_table(
        "binf", ms.Schema({"id": ms.UInt64(), "bv": ms.BinaryVector(d)}), settings=st
    )
    t2.insert({"id": np.arange(1000, dtype=np.uint64), "bv": bits[:1000]})
    desc = t2.add_vector_index("f", "bv", type="FLAT")
    assert desc.kind.value == "BinaryFLAT"
    assert t2.wait_index_built()
    res2 = t2.search("bv", bits[5], k=1)
    assert int(t2.gather(res2, ["id"])["id"][0, 0]) == 5


def test_binary_metric_validation(db, rng):
    d = 64
    t = db.create_table("bv2", ms.Schema({"id": ms.UInt64(), "bv": ms.BinaryVector(d)}))
    bits = rng.integers(0, 2, (100, d)).astype(bool)
    t.insert({"id": np.arange(100, dtype=np.uint64), "bv": bits})
    with pytest.raises(ms.IndexParameterError):
        t.search("bv", bits[0], k=3, metric="L2")  # float metric on binary
    with pytest.raises(ms.IndexParameterError):
        t.add_vector_index("x", "bv", type="IVFFLAT")  # float index on binary
    with pytest.raises(ms.QueryShapeError):
        t.search("bv", bits[0][:32], k=3)
