"""HBM admission control: payload uploads are budgeted and degrade to the
host tier instead of dying on device OOM (reference analogue: startup
memory sizing, programs/server/Server.cpp:1312-1335 — the server never
dies on memory pressure; disk tier: Search::DiskIOManager, VICommon.h:132)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.storage.hbm import GOVERNOR, HbmGovernor, is_device_oom


def test_is_device_oom_classifier():
    assert is_device_oom(RuntimeError("RESOURCE_EXHAUSTED: Out of memory"))
    assert is_device_oom(RuntimeError("jaxlib...: ResourceExhausted while"))
    assert not is_device_oom(ValueError("shape mismatch (40,) vs (41,)"))
    assert not is_device_oom(KeyError("vec"))


def test_guarded_put_retries_once_then_degrades(monkeypatch):
    import jax.numpy as jnp

    g = HbmGovernor()
    calls = {"n": 0}

    def fake_asarray(arr, dtype=None):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: hbm full")

    monkeypatch.setattr(jnp, "asarray", fake_asarray)
    assert g.guarded_put([(np.zeros(4, np.float32), None)]) is None
    assert calls["n"] == 2  # one retry after gc, then give up -> host tier


def test_guarded_put_retry_recovers(monkeypatch):
    import jax.numpy as jnp

    g = HbmGovernor()
    real = jnp.asarray
    calls = {"n": 0}

    def flaky(arr, dtype=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: transient co-tenant")
        return real(arr, dtype=dtype)

    monkeypatch.setattr(jnp, "asarray", flaky)
    out = g.guarded_put([(np.arange(4, dtype=np.float32), None)])
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out[0]), np.arange(4, dtype=np.float32))


def test_guarded_put_reraises_non_oom(monkeypatch):
    import jax.numpy as jnp

    g = HbmGovernor()

    def bad(arr, dtype=None):
        raise ValueError("not a memory problem")

    monkeypatch.setattr(jnp, "asarray", bad)
    with pytest.raises(ValueError):
        g.guarded_put([(np.zeros(2, np.float32), None)])


def test_register_releases_on_gc():
    g = HbmGovernor()

    class Owner:
        pass

    o = Owner()
    g.register(o, 1000)
    assert g.tracked_bytes == 1000
    del o
    import gc

    gc.collect()
    assert g.tracked_bytes == 0


def test_insert_past_device_budget_spills_and_serves(db):
    """VERDICT r4 #2 'done' criterion: insert past a configured device
    budget -> payload lands in the host tier (TIER_SPILL event, no crash)
    and both exact and IVF searches still answer correctly."""
    dim = 32
    n = 2000
    st = ms.Settings()
    st.table.min_rows_to_build_vector_index = 1
    # generous budget: first insert is admitted to HBM
    st.server.device_payload_budget_bytes = 10**15
    t = db.create_table(
        "t_budget",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(dim)}),
        settings=st,
    )
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((2 * n, dim)).astype(np.float32)
    t.insert({"id": np.arange(n, dtype=np.uint64), "vec": vecs[:n]})
    seg0 = t.live_segments()[0]
    assert not seg0.vector("vec").is_host
    assert not seg0.spilled_columns
    # exhaust the budget: the next upload must be denied and spill to host
    st.server.device_payload_budget_bytes = GOVERNOR.tracked_bytes
    t.insert({"id": np.arange(n, 2 * n, dtype=np.uint64), "vec": vecs[n:]})
    seg1 = t.live_segments()[1]
    assert seg1.vector("vec").is_host
    assert "vec" in seg1.spilled_columns
    events = [r["event"] for r in t.event_log.rows()]
    assert "TierSpill" in events

    # exact search across the HBM segment + the spilled segment
    q = vecs[[5, n + 7]]
    r = t.search("vec", q, k=3, metric="L2")
    ids = t.gather(r, ["id"])["id"]
    assert ids[0, 0] == 5
    assert ids[1, 0] == n + 7

    # IVF still builds: raw on the HBM segment, disk-mode on the spilled one
    t.add_vector_index("i", "vec", type="IVFFLAT", ncentroids=16)
    assert t.wait_index_built(120)
    idx0 = t._slots[(0, "i")].instance
    idx1 = t._slots[(1, "i")].instance
    assert idx0.codec == "raw"
    assert idx1.codec == "sq8" and idx1.requires_two_stage()
    r = t.search("vec", q, k=3, metric="L2")
    ids = t.gather(r, ["id"])["id"]
    assert ids[0, 0] == 5
    assert ids[1, 0] == n + 7
