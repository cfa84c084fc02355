"""Engine configuration: query settings, table settings, server settings.

The reference exposes three layers of settings (SURVEY.md §5):
  * per-query   Settings            (src/Core/Settings.h:918-926)
  * per-table   MergeTreeSettings   (src/Storages/MergeTree/MergeTreeSettings.h:178-202)
  * per-server  ServerSettings      (src/Core/ServerSettings.h:72-75)

We mirror that split with three frozen-ish dataclasses. Defaults match the
reference where a reference default exists (citations inline).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class QuerySettings:
    """Per-query knobs. Reference: src/Core/Settings.h."""

    # Allow brute-force scan on segments without a built index.
    # Reference default: false for large parts (Settings.h:918); small parts
    # always allow brute force (MergeTreeVSManager.cpp:1681-1688). We default
    # to True because the TPU scan is fast enough to be the baseline path.
    enable_brute_force_vector_search: bool = True

    # Hybrid fusion parameters (Settings.h:919-921).
    hybrid_search_fusion_weight: float = 0.5
    hybrid_search_fusion_k: int = 60
    hybrid_search_top_k_multiple_base: int = 3

    # Skip the prefilter when a partition-level predicate is provably true
    # for a whole segment (optimize_prefilter_in_search, Settings.h:922;
    # canSkipPrewhereForPart, MergeTreeSelectWithHybridSearchProcessor.cpp:224).
    optimize_prefilter_in_search: bool = True

    # Pagination window cap: LIMIT n OFFSET m requires n+m <= this
    # (Settings.h:923).
    max_search_result_window: int = 10_000

    # Default top-k when the caller gives none (VICommon.h:170).
    default_topk: int = 30

    # Use TPU hardware approximate top-k (jax.lax.approx_max_k) inside
    # scans — OPT-IN: the default brute-force/FLAT path must be exact
    # ground truth (the reference's FAISS knn is exact), and measured on
    # v5e exact lax.top_k is no slower at kilowide rows anyway.
    # recall_target applies to the approx path only.
    use_approx_topk: bool = False
    approx_topk_recall_target: float = 0.99

    # Accelerate plain string predicates (LIKE, multiSearchAny) over
    # fts-indexed columns with term bitmaps (Settings.h:121; candidates
    # from the index, exact verify on candidates only).
    enable_fts_index_for_string_functions: bool = True

    # FINAL queries fetch k × this many candidates before Replacing-engine
    # dedup drops superseded rows (performFinal candidate head-room).
    final_topk_multiple: int = 4

    # Over-selective pre-filters fall back from the ANN index to the exact
    # masked scan: when the filter passes fewer than this fraction of a
    # segment's rows, index traversal (graph routing through filtered-out
    # nodes, IVF probes missing the survivors' clusters) loses recall while
    # the masked exact scan is both correct and cheap. The flat-fallback
    # idea mirrors the reference's fallbackToFlat
    # (src/VectorIndex/Common/VICommon.h:173, VIWithDataPart.cpp:168-175 /
    # params cleared at :912); the selectivity trigger is ours — the
    # reference's bitmap-into-index behavior silently degrades here.
    # 0 disables the fallback.
    filter_fallback_selectivity: float = 0.01

    # Cost-based plan routing: a LOADED graph index is bypassed in favor
    # of the exact MXU scan when the modeled scan time beats the modeled
    # traversal time for this (batch, ef, corpus-bytes) shape. TPU
    # crossovers are far from CPU intuition: a 256-query batch over
    # 100k x 960-d is ~1-3 ms as one bf16 tile-scan matmul but ~75 ms as
    # 19 sequential frontier expansions (measured on v5e, round 3); the
    # graph only wins for multi-GB corpora at tiny batch sizes. This
    # generalizes the reference's fallbackToFlat (VICommon.h:173) from a
    # correctness rescue to a cost-based plan choice.
    cost_based_index_routing: bool = True

    # Two-stage search (approximate first pass + exact re-rank). The
    # reference ships the machinery gated off (SURVEY.md §3.5); here it is a
    # real setting.
    two_stage_search: bool = False
    two_stage_num_reorder_multiple: int = 4  # candidates = k * this

    # Index build chunking (Settings.h:117-119: train 100MiB / add 10MiB).
    # train: bounds the k-means training sample (ops/kmeans.training_sample).
    # add: N/A by design (adds are single fused device programs over the
    # HBM-resident payload); retained for settings parity.
    max_build_index_train_block_bytes: int = 100 * 1024 * 1024
    max_build_index_add_block_bytes: int = 10 * 1024 * 1024


@dataclasses.dataclass
class TableSettings:
    """Per-table knobs. Reference: src/Storages/MergeTree/MergeTreeSettings.h."""

    # Segments smaller than this never get an ANN index; they are scanned
    # exactly (MergeTreeSettings.h:181, IMergeTreeDataPart.cpp:1454-1458).
    min_rows_to_build_vector_index: int = 65_536
    # Byte-denominated twin of the row gate (MergeTreeSettings.h:182):
    # segments whose vector payload is smaller than this are scanned
    # exactly. 0 = rows gate only.
    min_bytes_to_build_vector_index: int = 0

    # Default disk_mode for MSTG indexes created without an explicit
    # disk_mode param (MergeTreeSettings default_mstg_disk_mode;
    # 00044_mqvs_mstg_disk_mode).
    default_mstg_disk_mode: int = 0

    # Default metrics when DDL omits metric_type
    # (MergeTreeSettings.h:183-184).
    float_vector_search_metric_type: str = "L2"
    binary_vector_search_metric_type: str = "Hamming"

    # CHECK length(vector)=D at insert (MergeTreeSettings.h:186). Always
    # enforced here BY DESIGN: segment payloads are fixed-shape device
    # buffers, so a wrong-length vector cannot be stored. Retained for
    # DDL/settings parity; toggling it has no effect.
    enforce_fixed_vector_length_constraint: bool = True

    # Validate index parameters at DDL time (MergeTreeSettings.h:187).
    vector_index_parameter_check: bool = True

    # Segments above this row count go to the slow build queue
    # (MergeTreeSettings.h:185).
    max_rows_for_slow_mode_single_vector_index_build: int = 1_000_000

    # One replica builds each (segment, index); others fetch the built
    # files from the shared store (MergeTreeSettings.h:189).
    build_vector_index_on_random_single_replica: bool = False

    # Keep old per-source index segments alive after a merge until the new
    # index is rebuilt, with row-id remapping (decoupled parts,
    # MergeTreeSettings.h:179; MergeTask.cpp:319-405).
    enable_decouple_vector_index: bool = True

    # Segment row capacities are padded up to a multiple of this so XLA
    # sees a small set of static shapes (TPU-specific; no reference
    # analogue — replaces MergeTree granularity).
    segment_row_alignment: int = 1_024

    # Vector payload dtype on device. bfloat16 halves HBM traffic on the
    # scan path; accumulation stays float32.
    storage_dtype: str = "bfloat16"

    # Payload residency: "hbm" (default) or "host" — the beyond-HBM tier
    # (disk-mode analogue, Search::DiskIOManager / VICommon.h:132): raw
    # rows live in host RAM; HBM holds only index structures (disk-mode
    # MSTG keeps SQ8 windows on chip and re-ranks against host rows);
    # index-less segments scan by streaming chunks through the device.
    vector_storage_tier: str = "hbm"

    # Durable-storage policy (the reference's storage policies / S3 disks,
    # 00036_mqvs_vector_index_s3.sh): 'default' persists to the local
    # directory only; 'remote' ALSO syncs the persisted tree to the
    # Database's object store (storage/stores.py) and can cold-start from
    # it when the local cache is gone.
    storage_policy: str = "default"


@dataclasses.dataclass
class ServerSettings:
    """Process-wide knobs. Reference: src/Core/ServerSettings.h."""

    # Fraction of device/host memory for the index cache
    # (ServerSettings.h:75, clamped 0.1-0.9 in Server.cpp:1312-1323).
    vector_index_cache_size_ratio_of_memory: float = 0.3

    # Absolute cache cap in bytes; None = derive from ratio.
    vector_index_cache_size: Optional[int] = None

    # Background index build concurrency (ServerSettings.h:72 default 1).
    background_vector_pool_size: int = 1
    background_slow_mode_vector_pool_size: int = 1

    # Build memory budget (VIBuildMemoryUsageHelper; Server.cpp:1326-1335):
    # a build whose estimated device bytes exceed
    # ratio × device-memory-capacity raises IndexBuildMemoryError; the
    # retry path evicts index-cache entries first. build_memory_limit_bytes
    # overrides the derived budget (None = use live device stats).
    vector_index_build_size_ratio_of_memory: float = 0.4
    build_memory_limit_bytes: Optional[int] = None

    # Primary-key cache (Server.cpp:1601-1610; MergeTreeSettings.h:178).
    # Satisfied BY DESIGN: scalar/PK columns are host-RAM-resident numpy
    # arrays, so top-k row lookup never touches disk. Retained for
    # settings parity; toggling has no effect.
    enable_primary_key_cache: bool = True
    primary_key_cache_size: int = 256 * 1024 * 1024

    # HBM payload admission (storage/hbm.py; reference analogue: startup
    # memory sizing, Server.cpp:1312-1335 — the server never dies on
    # memory pressure). A segment payload upload is admitted only while
    # projected HBM use stays under ratio x device capacity; denied — or
    # RESOURCE_EXHAUSTED after one retry — it degrades to the host tier.
    # The explicit byte budget overrides the ratio and also works on
    # backends without memory stats (the CPU test mesh).
    vector_storage_budget_ratio: float = 0.92
    device_payload_budget_bytes: Optional[int] = None

    # SystemLog flush cadence (SystemLog.cpp flush_interval_milliseconds,
    # default 7500): with a database storage path, query_log /
    # vector_index_event_log rings flush into backing engine tables this
    # often. 0 disables the thread (flush still runs on close()).
    system_log_flush_interval_s: float = 7.5


# ClickHouse-inherited setting names accepted-and-ignored for script
# compatibility (no analogue in this engine: row granules, async
# mutations, wide/compact part thresholds, PREWHERE movement are all
# N/A by design — reference tests set them constantly).
_COMPAT_IGNORED = frozenset({
    "index_granularity",
    "mutations_sync",            # mutations are synchronous here
    "enable_rebuild_for_decouple",
    "min_bytes_for_wide_part", "min_rows_for_wide_part",
    "min_bytes_for_compact_part", "min_rows_for_compact_part",
    "optimize_move_to_prewhere_for_vector_search",
    "optimize_move_to_prewhere",
    "max_threads", "max_memory_usage", "log_queries",
    "index_granularity_bytes",
})
_COMPAT_PREFIXES = ("allow_experimental_", "allow_suspicious_")
_COMPAT_ALIASES = {}


@dataclasses.dataclass
class Settings:
    """Bundle of all three layers, as passed around the engine."""

    query: QuerySettings = dataclasses.field(default_factory=QuerySettings)
    table: TableSettings = dataclasses.field(default_factory=TableSettings)
    server: ServerSettings = dataclasses.field(default_factory=ServerSettings)

    def override(self, kv) -> "Settings":
        """Copy with flat name=value overrides resolved across the three
        layers — the per-query `SETTINGS k=v` clause. Unknown names raise
        (the reference rejects unknown settings), EXCEPT ClickHouse-
        inherited names with no analogue in this engine, which are
        accepted and ignored so reference SQL scripts run unmodified
        (index_granularity appears in 51 reference vector-search tests;
        mutations here are synchronous so mutations_sync is a no-op)."""
        out = Settings(
            query=dataclasses.replace(self.query),
            table=dataclasses.replace(self.table),
            server=dataclasses.replace(self.server),
        )
        for name, value in dict(kv).items():
            if name == "two_stage_search_option":
                # reference values 0/1/2 (off/on/auto) -> our boolean gate
                name, value = "two_stage_search", 0 if str(value) in ("0", "false") else 1
            name = _COMPAT_ALIASES.get(name, name)
            if name in _COMPAT_IGNORED or name.startswith(_COMPAT_PREFIXES):
                continue
            for layer in (out.query, out.table, out.server):
                if hasattr(layer, name):
                    cur = getattr(layer, name)
                    if isinstance(cur, bool):
                        if isinstance(value, str):
                            low = value.lower()
                            if low in ("1", "true"):
                                value = True
                            elif low in ("0", "false"):
                                value = False
                            else:
                                raise ValueError(
                                    f"setting {name!r} expects a boolean, got {value!r}"
                                )
                        else:
                            value = bool(int(value))
                    elif isinstance(cur, int):
                        value = int(value)
                    elif isinstance(cur, float):
                        value = float(value)
                    elif cur is None and isinstance(value, str):
                        # Optional numeric fields: digits coerce, rest stays
                        try:
                            value = int(value)
                        except ValueError:
                            pass
                    setattr(layer, name, value)
                    break
            else:
                raise ValueError(f"unknown setting {name!r}")
        return out


DEFAULT_SETTINGS = Settings()


def enable_compile_cache(root_dir: str) -> None:
    """Persistent XLA compile cache under `root_dir`, keyed by host
    platform+machine: AOT artifacts are NOT portable across CPU feature
    sets (XLA warns of SIGILL), so a checkout shared between hosts must
    not share cache entries. One helper for tests/bench/driver entry."""
    import hashlib
    import os
    import platform

    import jax

    # hostname is NOT a sufficient key: identically-named VMs migrate
    # across physical hosts with different CPU feature sets, and XLA:CPU
    # AOT artifacts from a host with (say) avx512/amx load here with a
    # machine-mismatch warning — at best different FP reduction order
    # (observed: the same HNSW build producing a different graph
    # depending on which cache entries hit), at worst SIGILL. Fold the
    # actual CPU feature flags into the tag.
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat = hashlib.sha256(
                        " ".join(sorted(line.split(":", 1)[1].split())).encode()
                    ).hexdigest()[:10]
                    break
    except OSError:
        pass
    tag = f"{platform.machine()}-{platform.node()}-{feat}"
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(root_dir, ".jax_cache", tag),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — best-effort on older jax
        pass
