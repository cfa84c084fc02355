"""Multi-chip sharding on the virtual 8-device CPU mesh: sharded exact
scan + ICI merge must equal the single-device result; sharded k-means must
match single-device k-means stats."""

import jax
import jax.numpy as jnp
import numpy as np

from myscaledb_tpu.metrics import Metric
from myscaledb_tpu.ops import bruteforce, kmeans
from myscaledb_tpu.parallel import distributed as dist


def test_mesh_shapes():
    mesh = dist.make_mesh(8, query_axis=2)
    assert mesh.shape == {"query": 2, "data": 4}


def test_distributed_scan_matches_single(rng):
    n, d, k, nq = 4096, 128, 10, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    mesh = dist.make_mesh(8, query_axis=2)
    xs = dist.shard_rows(mesh, x)
    aux = np.sum(x.astype(np.float64) ** 2, axis=1).astype(np.float32)
    auxs = dist.shard_rows(mesh, aux)
    qs = jax.device_put(
        q, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("query", None))
    )
    v, r = dist.distributed_scan_topk(
        mesh, qs, xs, auxs, k=k, metric=Metric.L2, rows_per_shard=n // 4
    )
    sv, sr = bruteforce.scan_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(aux), k=k, metric=Metric.L2, n_valid=n
    )
    np.testing.assert_array_equal(np.sort(np.asarray(r), 1), np.sort(np.asarray(sr), 1))
    np.testing.assert_allclose(np.asarray(v), np.asarray(sv), rtol=1e-5)


def test_sharded_kmeans_matches_reference_step(rng):
    n, d, c = 2048, 16, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    mesh = dist.make_mesh(8, query_axis=1)
    xs = dist.shard_rows(mesh, x)
    cents0 = x[:c].astype(np.float32)
    out = np.asarray(dist.sharded_lloyd_step(mesh, xs, dist.replicate(mesh, cents0)))
    # single-device reference step
    sums, counts = kmeans.lloyd_stats(jnp.asarray(x), jnp.asarray(cents0))
    want = np.asarray(kmeans.lloyd_update(jnp.asarray(cents0), sums, counts))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_fused_train_and_search_step(rng):
    n, d, c, k, nq = 1024, 128, 16, 8, 16
    mesh = dist.make_mesh(8, query_axis=2)
    x = rng.standard_normal((n, d)).astype(np.float32)
    aux = np.sum(x**2, 1).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    step = dist.make_train_and_search_step(
        mesh, k=k, metric=Metric.L2, rows_per_shard=n // 4
    )
    qs = jax.device_put(
        q, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("query", None))
    )
    vals, rows, cents = step(
        qs, dist.shard_rows(mesh, x), dist.shard_rows(mesh, aux),
        dist.replicate(mesh, x[:c]),
    )
    assert vals.shape == (nq, k) and rows.shape == (nq, k)
    assert cents.shape == (c, d)
    assert np.all(np.isfinite(np.asarray(vals)))
    assert np.all(np.asarray(rows) >= 0)
