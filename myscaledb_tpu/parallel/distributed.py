"""Multi-chip execution: corpus sharding, ICI top-k merge, sharded k-means.

The reference scales out two ways (SURVEY.md §5 'distributed communication
backend'): (a) shards via the Distributed engine — each shard searches its
parts and the initiator fuses top-k; (b) replicas exchange built index
files. The TPU-native equivalents here:

  * corpus rows sharded over a mesh "data" axis (a chip's HBM slice is the
    'shard'); per-chip top-k then an all_gather over ICI + local merge
    replaces the initiator's k-way fusion (getTotalTopSearchResultImpl);
  * query batches sharded over a "query" axis (connection-level
    parallelism);
  * k-means training is data-parallel Lloyd's: per-chip (sums, counts)
    psum'd over the "data" axis (the ICI allreduce replaces the build
    library's thread pool).

All functions work on any jax.sharding.Mesh, including the CPU
host-platform virtual mesh used in tests and the driver dry run.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..metrics import Metric
from ..ops import kmeans
from ..ops.bruteforce import scan_topk_t
from ..ops.topk import NEG_INF


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    query_axis: int = 1,
    axis_names: Tuple[str, str] = ("query", "data"),
) -> Mesh:
    """1xN (or QxD) mesh over the first n devices. The "data" axis shards
    the corpus; the "query" axis shards the request batch."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % query_axis:
        raise ValueError(f"n_devices={n} not divisible by query_axis={query_axis}")
    arr = np.array(devs[:n]).reshape(query_axis, n // query_axis)
    return Mesh(arr, axis_names)


def shard_rows(mesh: Mesh, host_array: np.ndarray, axis: str = "data"):
    """Place [N, ...] rows sharded over the mesh's data axis (replicated on
    the query axis). N must divide evenly (pad first)."""
    spec = P(axis) if host_array.ndim == 1 else P(axis, *([None] * (host_array.ndim - 1)))
    return jax.device_put(host_array, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, host_array: np.ndarray):
    return jax.device_put(host_array, NamedSharding(mesh, P()))


# --------------------------------------------------------------- search
def distributed_scan_topk(
    mesh: Mesh,
    queries: jax.Array,
    data: jax.Array,
    aux: Optional[jax.Array],
    *,
    k: int,
    metric: Metric,
    rows_per_shard: int,
    approx: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact scan over a corpus sharded on the "data" axis; queries sharded
    on the "query" axis. Returns globally-merged (scores, row_ids) sharded
    over "query" — row ids are global.

    Per chip: local fused scan (Pallas/XLA) -> [Qs, k]. ICI: all_gather the
    per-chip top-k over "data" (k·S tiny rows) and merge locally — the
    bandwidth-optimal analogue of the reference's per-part merge.
    """
    n_data = mesh.shape["data"]
    aux_in = aux if aux is not None else jnp.zeros((data.shape[0],), jnp.float32)

    def local(q, x, a):
        my = jax.lax.axis_index("data")
        v, r = scan_topk_t(
            q,
            x,
            a,
            k=k,
            metric=metric,
            n_valid=rows_per_shard,
            approx=approx,
        )
        r = jnp.where(r >= 0, r + my * rows_per_shard, -1)
        # [S, Q, k] on every chip of the data axis (ICI all-gather)
        gv = jax.lax.all_gather(v, "data")
        gr = jax.lax.all_gather(r, "data")
        gv = jnp.transpose(gv, (1, 0, 2)).reshape(v.shape[0], -1)
        gr = jnp.transpose(gr, (1, 0, 2)).reshape(v.shape[0], -1)
        mv, pos = jax.lax.top_k(gv, k)
        mr = jnp.take_along_axis(gr, pos, axis=-1)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        return mv, mr

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("query", None), P("data", None), P("data")),
        out_specs=(P("query", None), P("query", None)),
        check_vma=False,
    )
    return fn(queries, data, aux_in)


# --------------------------------------------------------------- k-means
def sharded_lloyd_step(mesh: Mesh, data: jax.Array, centroids: jax.Array):
    """One Lloyd's iteration with the corpus sharded on "data": local
    (sums, counts) + psum over ICI, replicated centroid update."""

    def local(x, c):
        sums, counts = kmeans.lloyd_stats(x, c)
        sums = jax.lax.psum(sums, "data")
        counts = jax.lax.psum(counts, "data")
        return kmeans.lloyd_update(c, sums, counts)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(data, centroids)


def sharded_kmeans_fit(
    mesh: Mesh,
    data: jax.Array,
    *,
    n_clusters: int,
    n_iters: int = 10,
    seed: int = 0,
) -> jax.Array:
    """Multi-chip k-means over a row-sharded corpus. Init from the first
    rows of the corpus (deterministic; callers pre-shuffle)."""
    cents = jax.device_put(
        data[:n_clusters].astype(jnp.float32), NamedSharding(mesh, P())
    )
    step = jax.jit(functools.partial(sharded_lloyd_step, mesh))
    for _ in range(n_iters):
        cents = step(data, cents)
    return cents


# ----------------------------------------------------------- fused step
def make_train_and_search_step(mesh: Mesh, *, k: int, metric: Metric, rows_per_shard: int):
    """One jitted 'full step' over the mesh: a Lloyd's training iteration
    (psum over "data") + a sharded exact search with ICI top-k merge.
    This is the step the driver dry-runs multi-chip (see __graft_entry__).
    """

    def step(queries, data, aux, centroids):
        new_cents = sharded_lloyd_step(mesh, data, centroids)
        vals, rows = distributed_scan_topk(
            mesh,
            queries,
            data,
            aux,
            k=k,
            metric=metric,
            rows_per_shard=rows_per_shard,
        )
        return vals, rows, new_cents

    return jax.jit(step)
