"""Benchmark: SIFT1M-scale vector search on one TPU chip.

Protocol follows the reference's harness (tests/vector_search/benchmark.py
of MyScaleDB: recall/QPS grids over index params; BASELINE.json configs):
a 1M x 128 corpus (SIFT-like clustered synthetic — the repo ships no
dataset files), exact ground truth computed on device, then

  1. exact brute-force scan QPS (k=10, batch=100)
  2. IVFFLAT: nprobe sweep -> smallest nprobe with recall@10 >= 0.95,
     QPS at that operating point  <- the headline metric

Prints ONE JSON line. vs_baseline is null: the reference repo publishes no
absolute numbers (BASELINE.md) — its protocol is reproduced instead.

Tunnel-aware methodology (see .claude/skills/verify/SKILL.md): the axon
TPU link has ~30ms host<->device round-trips and unreliable
block_until_ready, so QPS is measured device-side: pre-uploaded query
batches, bounded in-flight pipelining, and device_get of every result.
"""

import json
import sys
import time

import numpy as np

_T0 = time.time()


def _progress(msg):
    print(f"[bench {time.time()-_T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def make_corpus(n, d, seed=0):
    """Clustered synthetic (mixture of Gaussians) — the structure ANN
    benchmarks (SIFT/GIST) actually have."""
    rng = np.random.default_rng(seed)
    n_blobs = 1000
    centers = 6.0 * rng.standard_normal((n_blobs, d)).astype(np.float32)
    out = np.empty((n, d), np.float32)
    bs = 100_000
    for i in range(0, n, bs):
        m = min(bs, n - i)
        which = rng.integers(0, n_blobs, m)
        out[i : i + m] = centers[which] + rng.standard_normal((m, d)).astype(np.float32)
    return out


def measure_qps(search_fn, query_batches, nq_per_batch, *, rounds=5, repeats=3):
    """Device-side QPS. The tunnel adds ~30ms per host sync, so per-repeat
    we dispatch `rounds` passes over all batches, fold every result into
    one tiny device-side sink, and do a single device_get — execution of
    every search is forced through the data dependency."""
    import jax
    import jax.numpy as jnp

    sink_fn = jax.jit(lambda vs: sum(jnp.sum(v) for v in vs))
    # warmup / compile
    jax.device_get(search_fn(query_batches[0]).device_arrays())
    best = 0.0
    for _ in range(repeats):
        t0 = time.time()
        sinks = []
        for _ in range(rounds):
            for qb in query_batches:
                r = search_fn(qb)
                sinks.append(r.device_arrays()[0])
        float(jax.device_get(sink_fn(sinks)))
        dt = time.time() - t0
        best = max(best, rounds * len(query_batches) * nq_per_batch / dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import myscaledb_tpu as ms

    N, D, K, NQ, BATCH = 1_000_000, 128, 10, 1_000, 100
    t0 = time.time()
    corpus = make_corpus(N, D)
    rng = np.random.default_rng(1)
    qidx = rng.choice(N, NQ, replace=False)
    queries = (corpus[qidx] + 0.3 * rng.standard_normal((NQ, D))).astype(np.float32)

    db = ms.connect()
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 1  # force index builds
    table = db.create_table(
        "bench", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(D)}), settings=st
    )
    table.insert({"id": np.arange(N, dtype=np.uint64), "vec": corpus})
    ingest_s = time.time() - t0
    _progress(f"ingest done ({ingest_s:.1f}s)")

    # Pre-upload query batches (device-resident serving path).
    batches = [
        jnp.asarray(queries[i : i + BATCH]) for i in range(0, NQ, BATCH)
    ]
    jax.block_until_ready(batches)
    _progress("queries uploaded")

    # --- exact ground truth + brute-force QPS (settings without index) ---
    st_bf = ms.Settings()
    st_bf.query.use_approx_topk = False
    gt_dist = np.concatenate(
        [
            table.search("vec", qb, k=K, settings=st_bf, metric="L2").distances
            for qb in batches
        ]
    )
    # k-th exact distance per query; a result counts as a hit when its true
    # distance is within epsilon of it (tie-tolerant recall — blob corpora
    # and bf16 payloads produce exact ties that id-matching miscounts)
    gt_kth = gt_dist[:, K - 1]
    _progress("ground truth done")
    bf_qps = measure_qps(
        lambda qb: table.search("vec", qb, k=K, settings=st_bf, metric="L2"),
        batches,
        BATCH,
    )

    _progress(f"bruteforce qps={bf_qps:.0f}")

    # --- IVFFLAT ---
    t1 = time.time()
    table.add_vector_index("ivf", "vec", type="IVFFLAT", ncentroids=1024, metric_type="L2")
    table.wait_index_built(timeout=1800)
    build_s = time.time() - t1
    _progress(f"ivf built ({build_s:.1f}s)")
    status = table.system_vector_indices()[0]["status"]
    assert status == "Built", f"index status {status}"

    def recall_at(nprobe):
        hits = 0
        for bi, qb in enumerate(batches):
            d = table.search("vec", qb, k=K, params={"nprobe": nprobe}).distances
            kth = gt_kth[bi * BATCH : bi * BATCH + d.shape[0], None]
            hits += int((d <= kth * (1 + 1e-4) + 1e-3).sum())
        return hits / (NQ * K)

    op_nprobe, op_recall = None, 0.0
    for nprobe in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        r = recall_at(nprobe)
        _progress(f"nprobe={nprobe} recall={r:.4f}")
        if r >= 0.95:
            op_nprobe, op_recall = nprobe, r
            break
    if op_nprobe is None:
        op_nprobe, op_recall = 256, recall_at(256)

    _progress(f"operating point nprobe={op_nprobe}")
    ivf_qps = measure_qps(
        lambda qb: table.search("vec", qb, k=K, params={"nprobe": op_nprobe}),
        batches,
        BATCH,
    )
    _progress(f"ivf qps={ivf_qps:.0f}")

    # --- config 4: filtered ANN (1% selectivity pre-filter, exact scan) ---
    from myscaledb_tpu import F

    flt = F("id") < N // 100  # 1% of rows survive the pre-filter
    fres = table.search("vec", batches[0], k=K, settings=st_bf, filter=flt)
    assert int(fres.rows.max()) < N // 100  # pre-filter semantics hold
    filtered_qps = measure_qps(
        lambda qb: table.search("vec", qb, k=K, settings=st_bf, filter=flt),
        batches[:3],
        BATCH,
        rounds=3,
    )
    _progress(f"filtered qps={filtered_qps:.0f}")

    # --- config 3: HNSW cosine on a GIST-like 960-d corpus (200k) ---
    N2, D2 = 100_000, 960  # keep total bench under ~25 min
    corpus2 = make_corpus(N2, D2, seed=7)
    t2 = db.create_table(
        "bench_gist", ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(D2)}),
        settings=st,
    )
    t2.insert({"id": np.arange(N2, dtype=np.uint64), "vec": corpus2})
    q2 = (corpus2[rng.choice(N2, 200, replace=False)]
          + 0.1 * rng.standard_normal((200, D2))).astype(np.float32)
    b2 = [jnp.asarray(q2[:100]), jnp.asarray(q2[100:])]
    gt2 = np.concatenate(
        [t2.search("vec", qb, k=K, settings=st_bf, metric="Cosine").distances for qb in b2]
    )
    t3 = time.time()
    t2.add_vector_index("h", "vec", type="HNSWFLAT", m=32, ef_c=100, metric_type="Cosine")
    t2.wait_index_built(timeout=3600)
    hnsw_build_s = time.time() - t3
    hnsw_recall = hnsw_qps = 0.0
    hnsw_ef = None
    for ef in (50, 100, 200, 400):
        d2s = np.concatenate(
            [t2.search("vec", qb, k=K, params={"ef_s": ef}).distances for qb in b2]
        )
        r = float((d2s <= gt2[:, K - 1 : K] * (1 + 1e-4) + 1e-4).mean())
        _progress(f"hnsw ef_s={ef} recall={r:.4f}")
        if r >= 0.95:
            hnsw_ef, hnsw_recall = ef, r
            break
    if hnsw_ef is None:
        hnsw_ef, hnsw_recall = 400, r
    hnsw_qps = measure_qps(
        lambda qb: t2.search("vec", qb, k=K, params={"ef_s": hnsw_ef}), b2, 100,
        rounds=10,
    )
    _progress(f"hnsw qps={hnsw_qps:.0f} (ef_s={hnsw_ef})")

    # --- config 5: hybrid BM25+RRF on 100k docs ---
    N3 = 100_000
    words = [f"term{i}" for i in range(5000)]
    rng3 = np.random.default_rng(3)
    docs = np.array(
        [" ".join(rng3.choice(words, 12)) for _ in range(N3)], dtype=object
    )
    t4 = db.create_table(
        "bench_hybrid",
        ms.Schema({"id": ms.UInt64(), "body": ms.String(), "vec": ms.FloatVector(D)}),
        settings=st,
    )
    t4.add_fts_index("ft", "body")
    t4.insert(
        {"id": np.arange(N3, dtype=np.uint64), "body": docs, "vec": corpus[:N3]}
    )
    hq = corpus[rng3.choice(N3, 64)] + 0.3 * rng3.standard_normal((64, D)).astype(np.float32)
    hq = hq.astype(np.float32)
    texts = [" ".join(rng3.choice(words, 3)) for _ in range(64)]
    t5 = time.time()
    reps = 3
    for _ in range(reps):
        for i in range(64):
            t4.hybrid_search("vec", "body", hq[i], texts[i], k=K, fusion_type="rrf")
    hybrid_qps = 64 * reps / (time.time() - t5)
    _progress(f"hybrid qps={hybrid_qps:.0f}")
    db.close()

    extra = {
        "bruteforce_exact_qps": round(bf_qps),
        "ivf_nprobe": op_nprobe,
        "ivf_recall_at_10": round(op_recall, 4),
        "ivf_build_s": round(build_s, 1),
        "filtered_exact_qps_1pct": round(filtered_qps),
        "hnsw_cosine_960d_qps": round(hnsw_qps),
        "hnsw_recall_at_10": round(hnsw_recall, 4),
        "hnsw_ef_s": hnsw_ef,
        "hnsw_build_s_100k_960d": round(hnsw_build_s, 1),
        "hybrid_bm25_rrf_qps": round(hybrid_qps),
        "ingest_s": round(ingest_s, 1),
        "n": N,
        "dim": D,
        "k": K,
        "batch": BATCH,
        "backend": jax.default_backend(),
    }
    print(
        json.dumps(
            {
                "metric": "SIFT1M-like IVFFLAT QPS @ recall@10>=0.95 (k=10, batch=100, 1 chip)",
                "value": round(ivf_qps),
                "unit": "qps",
                "vs_baseline": None,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
