"""Vector index interfaces and descriptors.

Re-expresses the consumed API of the reference's proprietary
`Search::VectorIndex` library (SURVEY.md §2.3) in TPU terms:

  * `VectorIndex.build(payload, ...)`   ~ index->build(reader, threads, cb)
  * `VectorIndex.search(q, k, params, mask)` ~ index->search(dataset, k,
      params, first_stage_only, bitmap*)  (VIWithDataPart.cpp:930)
  * `compute_scores_subset(q, ids)`     ~ computeTopDistanceSubset
      (two-stage exact re-rank, MergeTreeVSManager.cpp:597)
  * serialize/load                      ~ the .vidx3 stream API

plus the per-(segment, column) lifecycle state machine of VIWithColumnInPart
(src/Storages/MergeTree/VIInfo.h:41-49).

Search results use max-is-better scores (metrics.py); `mask` is the
pre-filter ∩ delete bitmap (bool[capacity], True = searchable) applied
INSIDE the search, never after.
"""

from __future__ import annotations

import abc
import dataclasses
import enum
from typing import Any, Dict, Optional, Tuple

import jax

from ..metrics import Metric

# Search-time parameters are passed through jit as a hashable tuple of
# sorted (name, value) pairs.
ParamsKey = Tuple[Tuple[str, Any], ...]


def params_key(params: Optional[Dict[str, Any]]) -> ParamsKey:
    return tuple(sorted((params or {}).items()))


def split_dyn_nprobe(pkey: ParamsKey) -> Tuple[ParamsKey, Optional[int]]:
    """Bucket the `nprobe` entry of a params key to the next power of two.

    Returns (bucketed_pkey, actual_nprobe_or_None). The fused search
    program compiles against the BUCKET (its static jit key) while the
    actual value rides through the trace as a dynamic int32 scalar that
    masks probes past it, so an nprobe sweep — the reference benchmark
    sweeps nprobe over {1,8,16,32,64} (tests/vector_search/benchmark.py:24)
    — compiles one program per pow2 bucket instead of one per value."""
    out = []
    actual = None
    for name, val in pkey:
        if name == "nprobe":
            try:
                actual = max(1, int(val))
            except (TypeError, ValueError):
                out.append((name, val))
                continue
            out.append((name, 1 << (actual - 1).bit_length()))
        else:
            out.append((name, val))
    return tuple(out), actual


def check_cancel(cancel_cb) -> None:
    """Raise IndexBuildCanceledError when the build's cancel callback
    fires. Builders call this at chunk boundaries — the index->build(...,
    cancel_cb) contract of the reference library (VIWithDataPart.h:338)."""
    if cancel_cb is not None and cancel_cb():
        from ..errors import IndexBuildCanceledError

        raise IndexBuildCanceledError("index build canceled")


def register_index_pytree(cls):
    """Register an index class as a JAX pytree so instances pass straight
    into jitted search plans: device arrays are children (no transfer —
    they already live in HBM), static config is aux data (part of the jit
    cache key)."""

    def flatten(obj):
        children = tuple(getattr(obj, f) for f in cls._array_fields)
        aux = tuple(getattr(obj, f) for f in cls._static_fields)
        return children, aux

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for f, v in zip(cls._array_fields, children):
            setattr(obj, f, v)
        for f, v in zip(cls._static_fields, aux):
            setattr(obj, f, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


class IndexKind(enum.Enum):
    # Index types exercised by the reference tests (SURVEY.md §2.3).
    FLAT = "FLAT"
    IVFFLAT = "IVFFLAT"
    IVFPQ = "IVFPQ"
    IVFSQ = "IVFSQ"
    HNSWFLAT = "HNSWFLAT"
    HNSWPQ = "HNSWPQ"
    HNSWSQ = "HNSWSQ"
    MSTG = "MSTG"
    BINARYFLAT = "BinaryFLAT"
    BINARYMSTG = "BinaryMSTG"

    @classmethod
    def parse(cls, s: str) -> "IndexKind":
        key = s.strip().upper()
        aliases = {
            "DEFAULT": "MSTG",  # Search::getDefaultIndexType (VIDescriptions.cpp:41)
            "BINARYFLAT": "BinaryFLAT",
            "BINARYMSTG": "BinaryMSTG",
        }
        key = aliases.get(key, key)
        for k in cls:
            if k.value.upper() == key.upper():
                return k
        from ..errors import IndexParameterError

        raise IndexParameterError(f"unknown vector index type: {s!r}")


BINARY_KINDS = {IndexKind.BINARYFLAT, IndexKind.BINARYMSTG}


class IndexStatus(enum.Enum):
    """Per-(segment, column) index state machine (VIInfo.h:41-49)."""

    SMALL_PART = "Small"
    PENDING = "Pending"
    BUILDING = "InProgress"
    BUILT = "Built"
    LOADED = "Loaded"
    ERROR = "Error"


@dataclasses.dataclass
class IndexDescription:
    """DDL-level descriptor (the VIDescription analogue,
    src/VectorIndex/Storages/VIDescriptions.cpp:108-212)."""

    name: str
    column: str
    kind: IndexKind
    metric: Metric
    dim: int
    params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # verbatim DDL tail ("v1 vector TYPE IVFFLAT('ncentroids = 1')") —
    # surfaced as system.vector_indices.expr like the reference's
    # formatted VIDescription expression
    definition: str = ""
    # the user's TYPE spelling ("IVFFlat") — system.vector_indices.type
    # echoes it verbatim like the reference (00018_mqvs_drop_index)
    declared_type: str = ""

    def is_binary(self) -> bool:
        return self.kind in BINARY_KINDS


class VectorIndex(abc.ABC):
    """A built, device-resident ANN index over one segment's vector column."""

    kind: IndexKind
    metric: Metric
    dim: int
    n_rows: int

    @abc.abstractmethod
    def search_t(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
    ) -> Tuple[jax.Array, jax.Array]:
        """Traceable top-k (scores f32[Q,k], row_ids int32[Q,k]); -inf/-1
        padding. Called inside the executor's fused jit; `params` is the
        hashable search-params key (static under jit).

        mask: bool[capacity] True = searchable (pre-filter ∩ deletes),
        applied inside selection.
        """

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        params: Optional[Dict[str, Any]] = None,
        mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Standalone (jitted) entry point for tests/tools."""
        return _jitted_index_search(self, queries, k, mask, params_key(params))

    @classmethod
    def estimate_build_bytes(cls, payload, n_rows: int, params=None) -> int:
        """Conservative DEVICE-memory estimate for building this index
        over `payload` — checked against the build budget BEFORE any
        allocation (VIBuildMemoryUsageHelper::checkBuildMemory analogue).
        Default: an f32 scan-representation copy plus ~index-sized output
        and transient buffers (~2 payload copies). Host-tier payloads
        (beyond-HBM corpora) never materialize on device in full: only a
        bounded training sample + the compressed index live in HBM, so
        the estimate must not count the host-RAM footprint (that would
        reject exactly the builds the host tier exists for)."""
        dpad = payload.data.shape[1]
        if getattr(payload, "is_host", False):
            # kmeans.training_sample* bound: ~centroids x 128 rows; 256k
            # covers the largest default ncentroids comfortably
            sample = min(n_rows, 256 * 1024)
            # training sample (f32) + compressed windows (~1 byte/dim) x2
            return 4 * sample * dpad + 2 * n_rows * dpad
        rep_f32 = 4 * n_rows * dpad
        return rep_f32 + 2 * int(payload.nbytes)

    def prefer_exact_scan(
        self, nq: int, k: int, params, scan_bytes: int
    ) -> bool:
        """Cost-based routing hook: return True when the exact payload
        scan of `scan_bytes` bytes is modeled cheaper than searching this
        index for an nq-query batch. Consulted by the executor BEFORE the
        fused program is built (everything is static at trace time).
        Default: never — only indexes whose search is sequential on TPU
        (graph traversals) override this."""
        del nq, k, params, scan_bytes
        return False

    def supports_two_stage(self) -> bool:
        """Whether search(first_stage=True) returns approximate candidates
        to be exactly re-ranked (supportTwoStageSearch,
        VIWithDataPart.cpp:128-133)."""
        return False

    def search_first_stage(
        self,
        queries: jax.Array,
        num_candidates: int,
        *,
        params: Optional[Dict[str, Any]] = None,
        mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError(f"{self.kind} has no first-stage search")

    def compute_scores_subset(
        self, queries: jax.Array, row_ids: jax.Array
    ) -> jax.Array:
        """Exact scores for given candidate rows (computeTopDistanceSubset)."""
        raise NotImplementedError(f"{self.kind} has no exact re-rank")

    @property
    @abc.abstractmethod
    def memory_bytes(self) -> int:
        """Device memory footprint — the LRU cache weight
        (getResourceUsage().build_memory_usage_bytes analogue)."""

    # ------------------------------------------------------------ persist
    @abc.abstractmethod
    def state_dict(self) -> Dict[str, Any]:
        """Arrays + metadata for serialization (persistence.py writes the
        .vidx3-analogue files + checksums)."""

    @classmethod
    @abc.abstractmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "VectorIndex":
        ...


import functools as _functools


@_functools.partial(jax.jit, static_argnames=("k", "pkey"))
def _jitted_index_search(index, queries, k, mask, pkey):
    return index.search_t(queries, k, mask=mask, params=pkey)
