"""IVFSQ / IVFPQ / MSTG: codec round-trips, recall vs exact scan, two-stage
re-rank semantics (reference tests 00013/00028 family)."""

import jax.numpy as jnp
import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.index.ivf import IVFPQIndex, IVFSQIndex, MSTGIndex
from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.ops import quantize
from myscaledb_tpu.storage.segment import Segment
from myscaledb_tpu.storage.schema import FloatVector, Schema, UInt64


def _make(rng, n, d, clustered=True):
    if clustered:
        centers = 8.0 * rng.standard_normal((40, d)).astype(np.float32)
        which = rng.integers(0, 40, n)
        vecs = (centers[which] + rng.standard_normal((n, d))).astype(np.float32)
    else:
        vecs = rng.standard_normal((n, d)).astype(np.float32)
    schema = Schema({"id": UInt64(), "vec": FloatVector(d)})
    seg = Segment.from_columns(
        0,
        schema,
        {"id": np.arange(n, dtype=np.uint64), "vec": vecs},
        storage_dtype=jnp.float32,
    )
    return seg, vecs


def _recall(rows, want):
    rows = np.asarray(rows)
    h = sum(len(set(g.tolist()) & set(w.tolist())) for g, w in zip(rows, want))
    return h / want.size


# ------------------------------------------------------------- codecs
def test_sq8_roundtrip(rng):
    x = rng.standard_normal((500, 32)).astype(np.float32) * 3
    p = quantize.sq8_train(x)
    codes = quantize.sq8_encode(x, p)
    dec = np.asarray(
        quantize.sq8_decode_dev(jnp.asarray(codes), jnp.asarray(p.lo), jnp.asarray(p.scale))
    ).astype(np.float32)
    err = np.abs(dec - x).max()
    rng_span = (x.max(0) - x.min(0)).max()
    assert err <= rng_span / 255.0 * 1.1


def test_pq_roundtrip(rng):
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    p = quantize.pq_train(x, m=8, bits=8, n_iters=8)
    codes = quantize.pq_encode(x, p)
    dec = np.asarray(quantize.pq_decode_dev(jnp.asarray(codes), jnp.asarray(p.codebooks))).astype(np.float32)
    # PQ reconstruction error should be much smaller than data norm
    rel = np.linalg.norm(dec - x) / np.linalg.norm(x)
    assert rel < 0.6


# ------------------------------------------------------------ indexes
@pytest.mark.parametrize(
    "cls,params",
    [
        (IVFSQIndex, {"ncentroids": 64}),
        (IVFPQIndex, {"ncentroids": 64, "M": 16}),
        (MSTGIndex, {"ncentroids": 64}),
    ],
)
def test_quantized_recall(rng, cls, params):
    n, d, k, nq = 20_000, 32, 10, 16
    seg, vecs = _make(rng, n, d)
    idx = cls.build(seg.vector("vec"), n, metric=Metric.L2, dim=d, params=params)
    q = (vecs[rng.choice(n, nq, replace=False)] + 0.1 * rng.standard_normal((nq, d))).astype(np.float32)
    dpad = seg.vector("vec").data.shape[1]
    qdev = jnp.asarray(np.pad(q, ((0, 0), (0, dpad - d))))
    s = -((q[:, None] - vecs[None]) ** 2).sum(-1)
    want = np.argsort(-s, 1)[:, :k]
    v, r = idx.search(qdev, k, params={"nprobe": 32})
    rec = _recall(r, want)
    if cls is IVFPQIndex:
        # PQ recall is quantization-limited (no re-rank, like FAISS IVFPQ):
        # the implementation must reach the ideal-ADC oracle, not 1.0
        dec = np.asarray(
            quantize.pq_decode_dev(
                quantize_codes_for(idx, vecs), jnp.asarray(np.asarray(idx.codec_a))
            )
        ).astype(np.float32)
        s2 = 2 * q @ dec.T - (dec**2).sum(1)[None]
        ideal = _recall(np.argsort(-s2, 1)[:, :k], want)
        assert rec >= ideal - 0.05, f"PQ recall {rec} below ADC oracle {ideal}"
    else:
        floor = 0.95 if cls is MSTGIndex else 0.85
        assert rec >= floor, f"{cls.__name__} recall {rec}"


def quantize_codes_for(idx, vecs):
    """Re-encode raw vectors with the index's codebooks (test helper)."""
    import jax.numpy as jnp

    from myscaledb_tpu.ops.quantize import PQParams, pq_encode

    books = np.asarray(idx.codec_a)
    p = PQParams(codebooks=books, m=books.shape[0], bits=8)
    return jnp.asarray(pq_encode(vecs, p))


def test_mstg_two_stage_scores_are_exact(rng):
    n, d, k = 8_000, 16, 5
    seg, vecs = _make(rng, n, d)
    idx = MSTGIndex.build(
        seg.vector("vec"), n, metric=Metric.L2, dim=d, params={"ncentroids": 32}
    )
    assert idx.supports_two_stage()
    q = vecs[:4]
    dpad = seg.vector("vec").data.shape[1]
    qdev = jnp.asarray(np.pad(q, ((0, 0), (0, dpad - d))))
    v, r = idx.search(qdev, k, params={"nprobe": 32})
    v, r = np.asarray(v), np.asarray(r)
    # scores come from the exact re-rank: must match f32 recompute
    # (internal score = 2 q·x - |x|^2 = -(|q-x|^2) + |q|^2)
    for i in range(4):
        qsq = (q[i] ** 2).sum()
        for j in range(k):
            if r[i, j] >= 0:
                true = -((q[i] - vecs[r[i, j]]) ** 2).sum() + qsq
                assert abs(v[i, j] - true) < 0.05 * max(1.0, abs(true))
    assert all(r[i, 0] == i for i in range(4))  # self-match wins stage 2


def test_mstg_first_stage_api(rng):
    n, d = 5_000, 16
    seg, vecs = _make(rng, n, d)
    idx = MSTGIndex.build(
        seg.vector("vec"), n, metric=Metric.L2, dim=d, params={"ncentroids": 16}
    )
    dpad = seg.vector("vec").data.shape[1]
    qdev = jnp.asarray(np.pad(vecs[:2], ((0, 0), (0, dpad - d))))
    v, r = idx.search_first_stage(qdev, 40, params={"nprobe": 16})
    assert v.shape == (2, 40)
    ex = idx.compute_scores_subset(qdev, r)
    assert ex.shape == (2, 40)


def test_quantized_end_to_end_with_two_stage_executor(db, rng):
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 100
    st.query.two_stage_search = True  # global candidate merge + re-rank path
    d = 16
    t = db.create_table(
        "mstg", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(d)}), settings=st
    )
    rng2 = np.random.default_rng(11)
    for s in range(2):  # two segments -> cross-segment candidate cut
        vecs = rng2.standard_normal((3000, d)).astype(np.float32)
        t.insert(
            {"id": np.arange(s * 3000, (s + 1) * 3000, dtype=np.uint64), "vec": vecs}
        )
    t.add_vector_index("m", "vec", type="MSTG", ncentroids=16)
    assert t.wait_index_built()
    # exact oracle across both segments
    allv = []
    for seg in sorted(t.live_segments(), key=lambda s: s.segment_id):
        allv.append(np.asarray(seg.vector("vec").data[: seg.n_rows].astype(jnp.float32))[:, :d])
    allv = np.concatenate(allv)
    q = allv[123]
    res = t.search("vec", q, k=5, params={"alpha": 3})
    got = int(t.gather(res, ["id"])["id"][0, 0])
    assert got == 123
    assert res.distances[0, 0] < 0.1  # bf16 payload quantization


def test_state_roundtrip_quantized(rng):
    n, d = 4000, 16
    seg, vecs = _make(rng, n, d)
    for cls, params in [
        (IVFSQIndex, {"ncentroids": 16}),
        (IVFPQIndex, {"ncentroids": 16, "M": 8}),
    ]:
        idx = cls.build(seg.vector("vec"), n, metric=Metric.L2, dim=d, params=params)
        idx2 = cls.from_state_dict(idx.state_dict())
        # the serialized state deliberately omits the segment-owned raw
        # payload refs (exact re-rank tier); the table re-attaches them on
        # load — mirror that here
        idx2.reattach_payload(seg.vector("vec"))
        dpad = seg.vector("vec").data.shape[1]
        qdev = jnp.asarray(np.pad(vecs[:3], ((0, 0), (0, dpad - d))))
        v1, r1 = idx.search(qdev, 5, params={"nprobe": 16})
        v2, r2 = idx2.search(qdev, 5, params={"nprobe": 16})
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
