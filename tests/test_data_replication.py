"""Replicated DATA path: rows inserted on replica A are searchable on
replica B after sync; deletes/mutations/merges converge; a restarted
replica resumes from its persisted state (the vidx_info/autoload
analogue). Mirrors DataPartsExchange part fetch + the ZK op log."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu import F
from myscaledb_tpu.service.data_replication import ReplicatedNode

DIM = 16


def _mk_node(tmp_path, name):
    db = ms.connect()
    t = db.create_table(
        f"rt", ms.Schema({"id": ms.UInt64(), "score": ms.Float32(), "vec": ms.FloatVector(DIM)})
    )
    node = ReplicatedNode(db, name, str(tmp_path / name))
    node.attach(t)
    return db, t, node


def _pair(tmp_path):
    db_a, t_a, a = _mk_node(tmp_path, "a")
    db_b, t_b, b = _mk_node(tmp_path, "b")
    a.peers = [b.url]
    b.peers = [a.url]
    return (db_a, t_a, a), (db_b, t_b, b)


def _rows(rng, n, base=0):
    return {
        "id": np.arange(base, base + n, dtype=np.uint64),
        "score": rng.random(n).astype(np.float32),
        "vec": rng.standard_normal((n, DIM)).astype(np.float32),
    }


def test_insert_replicates(tmp_path, rng):
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        data = _rows(rng, 200)
        t_a.insert(data)
        assert t_b.n_rows == 0
        assert b.sync() >= 1
        assert t_b.n_rows == 200
        # replica B answers a search for rows inserted only on replica A
        q = data["vec"][17]
        res = t_b.search("vec", q, k=1)
        assert int(t_b.gather(res, ["id"])["id"][0, 0]) == 17
        # no duplicate on re-sync (idempotent by uid)
        assert b.sync() == 0
        assert t_b.n_rows == 200
        # and A does not re-ingest its own rows when pulling from B
        a.sync()
        assert t_a.n_rows == 200
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_bidirectional_and_deletes_converge(tmp_path, rng):
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 100))
        t_b.insert(_rows(rng, 50, base=1000))
        a.sync(), b.sync()
        assert t_a.n_rows == 150 and t_b.n_rows == 150
        # delete on A (rows that originated on B!) converges to B
        t_a.delete(F("id") >= 1030)
        assert t_a.n_rows == 130
        b.sync()
        assert t_b.n_rows == 130
        res = t_b.search("vec", np.zeros(DIM, np.float32), k=150)
        ids = t_b.gather(res, ["id"])["id"][res.valid]
        assert (ids < 1030).all()
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_mutation_replicates(tmp_path, rng):
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 60))
        b.sync()
        t_a.update(F("id") < 10, {"score": 9.5})
        b.sync()
        res = t_b.search("vec", np.zeros(DIM, np.float32), k=60)
        g = t_b.gather(res, ["id", "score"])
        sel = g["id"][res.valid] < 10
        assert np.allclose(g["score"][res.valid][sel], 9.5)
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_merge_replicates(tmp_path, rng):
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        # leadership is deterministic: exactly one of the two may merge
        if a.is_merge_leader("rt"):
            (lt, ln), (ft, fn) = (t_a, a), (t_b, b)
        else:
            (lt, ln), (ft, fn) = (t_b, b), (t_a, a)
        lt.insert(_rows(rng, 40))
        lt.insert(_rows(rng, 40, base=40))
        fn.sync()
        assert len(ft.live_segments()) == 2
        lt.delete(F("id") == 7)
        lt.merge()
        assert len(lt.live_segments()) == 1
        fn.sync()
        assert len(ft.live_segments()) == 1
        assert ft.n_rows == 79
        q = np.zeros(DIM, np.float32)
        ids = ft.gather(ft.search("vec", q, k=100), ["id"])["id"]
        assert 7 not in ids.astype(int)
        # the non-leader's merge() is gated off (leader-assigned merges
        # are ENFORCED, not a docstring convention)
        assert ft.merge() is None
        assert len(ft.live_segments()) == 1
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_restart_resumes_from_state(tmp_path, rng):
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    data2 = _rows(rng, 30, base=500)
    try:
        t_a.insert(_rows(rng, 30))
        b.sync()
        assert t_b.n_rows == 30
    finally:
        b.close(), db_b.close()
    # restart B: new db process, same replica root; catch-up applies ONLY
    # the ops it has not seen (autoload state), then the new insert
    db_b2 = ms.connect()
    t_b2 = db_b2.create_table(
        "rt", ms.Schema({"id": ms.UInt64(), "score": ms.Float32(), "vec": ms.FloatVector(DIM)})
    )
    b2 = ReplicatedNode(db_b2, "b", str(tmp_path / "b"))
    try:
        b2.attach(t_b2)
        b2.peers = [a.url]
        b2.sync()
        # state said 30 rows were applied; the restarted db is empty, so
        # the segment map must be consulted against live segments — the
        # simplest correct behavior is refetch-on-miss; what must NOT
        # happen is a duplicate application of the same uid
        t_a.insert(data2)
        b2.sync()
        res = t_b2.search("vec", data2["vec"][3], k=1)
        assert int(t_b2.gather(res, ["id"])["id"][0, 0]) == 503
    finally:
        b2.close(), db_b2.close(), a.close(), db_a.close()


def test_concurrent_merges_delete_converges(tmp_path, rng):
    """The round-3 delete-loss hole: A and B merge the SAME sources
    concurrently (divergent merge uids), then a delete on A must still
    reach B's copy of those rows — deletes are addressed by ORIGIN
    segment + origin rows and resolve through each replica's own merge
    history."""
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 40))
        t_a.insert(_rows(rng, 40, base=40))
        b.sync()
        # both replicas merge without seeing each other's merge
        assert t_a.merge(force=True) is not None
        assert t_b.merge(force=True) is not None
        a.sync(), b.sync()  # each skips the other's merge (sources gone)
        assert len(t_a.live_segments()) == 1
        assert len(t_b.live_segments()) == 1
        assert t_a.n_rows == 80 and t_b.n_rows == 80
        # delete on A converges on B despite divergent merged uids
        t_a.delete(F("id") < 12)
        assert t_a.n_rows == 68
        b.sync()
        assert t_b.n_rows == 68
        res = t_b.search("vec", np.zeros(DIM, np.float32), k=100)
        ids = t_b.gather(res, ["id"])["id"]
        valid = np.asarray(res.valid)
        assert valid.sum() == 68 and (ids[valid].astype(int) >= 12).all()
        # and the reverse direction
        t_b.delete(F("id") >= 70)
        a.sync()
        assert t_a.n_rows == 58
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_delete_survives_merge_then_converges(tmp_path, rng):
    """Deletes on rows that were later merged into a new segment on the
    PUBLISHER (provenance composed through the publisher's merge) and on
    rows merged on the APPLIER (resolved through the applier's history)."""
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 30))
        t_a.insert(_rows(rng, 30, base=30))
        b.sync()
        # B merges locally first (its own history diverges)
        t_b.merge(force=True)
        # A deletes AFTER B's merge, addressed by origin rows
        t_a.delete(F("id").isin([3, 33]))
        b.sync()
        assert t_b.n_rows == 58
        # then A merges; its delete provenance composes through the merge
        t_a.merge(force=True)
        t_a.delete(F("id") == 55)
        b.sync()
        assert t_b.n_rows == 57
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_applier_local_deletes_survive_remote_merge(tmp_path, rng):
    """B deletes rows locally; before B's delete reaches A, A merges and
    B applies A's merge. B's local deletes must be re-applied to the
    ingested merged segment (not resurrected)."""
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        if a.is_merge_leader("rt"):
            (lt, ln, lo), (ft, fn, fo) = (t_a, a, db_a), (t_b, b, db_b)
        else:
            (lt, ln, lo), (ft, fn, fo) = (t_b, b, db_b), (t_a, a, db_a)
        lt.insert(_rows(rng, 30))
        lt.insert(_rows(rng, 30, base=30))
        fn.sync()
        # follower deletes locally; leader has NOT seen the delete
        ft.delete(F("id") < 5)
        assert ft.n_rows == 55
        # leader merges (still 60 rows there) and follower applies it
        lt.merge()
        fn.sync()
        assert len(ft.live_segments()) == 1
        assert ft.n_rows == 55  # local deletes re-applied, not resurrected
        # leader eventually converges too
        ln.sync()
        assert lt.n_rows == 55
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_three_replica_pending_deletes(tmp_path, rng):
    """C hears about a delete (from B) before the origin insert (from A):
    the delete buffers as pending and drains when the insert lands."""
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    db_c, t_c, c = _mk_node(tmp_path, "c")
    try:
        t_a.insert(_rows(rng, 20))
        b.sync()
        t_b.delete(F("id") < 4)
        # C syncs from B only: sees B's delete op but cannot know the
        # origin segment yet (the insert is in A's log, not B's)
        c.peers = [b.url]
        c.sync()
        assert t_c.n_rows == 0
        # now C reaches A too: insert lands, pending delete drains
        c.peers = [b.url, a.url]
        c.sync()
        assert t_c.n_rows == 16
    finally:
        a.close(), b.close(), c.close()
        db_a.close(), db_b.close(), db_c.close()


def test_background_sync_thread(tmp_path, rng):
    """Continuous replication: a node with sync_interval_s drains peers
    without manual sync() calls (the replication-queue thread)."""
    import time as _time

    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        b.start_sync(0.05)
        t_a.insert(_rows(rng, 25))
        deadline = _time.time() + 5.0
        while _time.time() < deadline and t_b.n_rows != 25:
            _time.sleep(0.05)
        assert t_b.n_rows == 25
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_leader_failover(tmp_path, rng):
    """Failure detection: when the leader replica dies, the survivor
    (after peer_down_after_s) takes over merges."""
    import time as _time

    db_a, t_a, a = None, None, None
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        a.peer_down_after_s = b.peer_down_after_s = 0.2
        a.sync(), b.sync()  # learn each other's node ids
        leaders = [n for n, t in ((a, t_a), (b, t_b)) if n.is_merge_leader("rt")]
        assert len(leaders) == 1
        survivor, st = ((a, t_a) if leaders[0] is b else (b, t_b))
        dead = leaders[0]
        assert not survivor.is_merge_leader("rt")
        dead.close()
        (db_a if dead is a else db_b).close()
        _time.sleep(0.3)  # past peer_down_after_s with no successful pull
        survivor.sync()  # a failed pull does not refresh last_ok
        assert survivor.is_merge_leader("rt")
        st.insert(_rows(rng, 10))
        st.insert(_rows(rng, 10, base=10))
        assert st.merge() is not None  # gate now open on the survivor
    finally:
        survivor.close()
        (db_b if dead is a else db_a).close()


def test_transient_fetch_failure_retries(tmp_path, rng, monkeypatch):
    """A failed segment fetch must NOT advance the watermark: the entry
    retries on the next sync instead of being skipped forever (review
    finding: one transient failure silently diverged the replica)."""
    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 64))
        real = type(b)._fetch_segment_columns
        fails = {"n": 1}

        def flaky(self, *args, **kw):
            if fails["n"]:
                fails["n"] -= 1
                return None  # simulated download/checksum failure
            return real(self, *args, **kw)

        monkeypatch.setattr(type(b), "_fetch_segment_columns", flaky)
        assert b.sync() == 0  # transient failure: nothing applied
        assert t_b.n_rows == 0
        assert b.sync() >= 1  # retried from the same watermark
        assert t_b.n_rows == 64
        # subsequent ops on the same uid still apply (no divergence)
        t_a.delete(F("id") < 8)
        assert b.sync() >= 1
        res = t_b.search("vec", np.zeros(DIM, np.float32), k=64)
        ids = np.asarray(t_b.gather(res, ["id"])["id"])
        valid = np.asarray(res.valid)
        assert valid.sum() == 56 and (ids[valid] >= 8).all()
    finally:
        a.close(); b.close(); db_a.close(); db_b.close()


def test_fenced_mutation_survives_partition(tmp_path, rng):
    """Fencing epochs (round-4 verdict next-step #6): an UPDATE committed
    on the minority side of a partition is FENCED — applied locally,
    queued for rebase — and re-emits at a fresh epoch when quorum
    returns, so it is NOT silently lost (the old LWW hole)."""
    from myscaledb_tpu.service.event_log import GLOBAL_COUNTERS

    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 60))
        b.sync(), a.sync()
        # partition from A's point of view: every peer ages out instantly
        a.peer_down_after_s = 0.0
        assert not a._has_majority()
        before = GLOBAL_COUNTERS.snapshot().get("ReplicatedFencedMutations", 0)
        t_a.update(F("id") < 10, {"score": 7.25})  # minority-side UPDATE
        assert (
            GLOBAL_COUNTERS.snapshot()["ReplicatedFencedMutations"] == before + 1
        )
        assert a._fenced_pending, "minority mutation must queue for rebase"
        # heal: liveness window back, a pull refreshes last_ok -> quorum
        a.peer_down_after_s = 60.0
        a.sync()  # regains majority -> rebase re-emits at a fresh epoch
        assert not a._fenced_pending
        assert b.sync() >= 1  # B pulls the rebased mutation
        res = t_b.search("vec", np.zeros(DIM, np.float32), k=60)
        g = t_b.gather(res, ["id", "score"])
        sel = g["id"][res.valid] < 10
        assert np.allclose(g["score"][res.valid][sel], 7.25), (
            "minority-side UPDATE was lost across the partition"
        )
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()


def test_fenced_mutation_superseded_is_loud(tmp_path, rng):
    """Write-write conflict across the partition: the majority-side
    UPDATE wins and the fenced one is dropped LOUDLY (counter), never
    applied over the newer epoch."""
    from myscaledb_tpu.service.event_log import GLOBAL_COUNTERS

    (db_a, t_a, a), (db_b, t_b, b) = _pair(tmp_path)
    try:
        t_a.insert(_rows(rng, 40))
        b.sync(), a.sync()
        a.peer_down_after_s = 0.0
        t_a.update(F("id") < 5, {"score": 1.0})  # fenced (epoch stays)
        # B still has quorum (it reaches A's server): majority write
        assert b._has_majority()
        t_b.update(F("id") < 5, {"score": 2.0})  # epoch bumps
        a.peer_down_after_s = 60.0
        a.sync()  # pulls B's majority write (newer epoch) + rebases
        sup = GLOBAL_COUNTERS.snapshot().get(
            "ReplicatedFencedMutationsSuperseded", 0
        )
        assert sup >= 1, "conflict must be surfaced, not silent"
        res = t_a.search("vec", np.zeros(DIM, np.float32), k=40)
        g = t_a.gather(res, ["id", "score"])
        sel = g["id"][res.valid] < 5
        assert np.allclose(g["score"][res.valid][sel], 2.0), (
            "majority-side UPDATE must win the conflict"
        )
    finally:
        a.close(), b.close(), db_a.close(), db_b.close()
