"""Database: top-level handle owning tables, build pools, cache, logs.

The programs/server analogue: owns process-wide services (the two build
executors, the index LRU cache sized from memory ratio, the event log) and
the table registry. `connect()` is the entry point.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

from ..config import Settings
from ..errors import SchemaError
from ..cache.lru import LRUCache
from ..service.background import BuildScheduler
from ..service.event_log import EventLog, GLOBAL_COUNTERS
from ..storage.schema import Schema
from ..storage.table import Table

# Without a measured device-memory budget we default the cache to 4 GiB;
# real deployments size it from vector_index_cache_size_ratio_of_memory
# (Server.cpp:1312-1323).
_FALLBACK_CACHE_BYTES = 4 << 30


def _device_memory_bytes() -> Optional[int]:
    try:
        import jax

        d = jax.devices()[0]
        stats = d.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return None


class Database:
    def __init__(
        self,
        settings: Optional[Settings] = None,
        *,
        path: Optional[str] = None,
        event_log_path=None,
        replica_id: Optional[int] = None,
        n_replicas: int = 1,
        replica_peers=None,
        remote_store=None,
    ):
        self.settings = settings or Settings()
        self.path = path
        # cold tier (S3/remote disks analogue): ObjectStore instance or URL
        if isinstance(remote_store, str):
            from ..storage.stores import store_from_url

            remote_store = store_from_url(remote_store)
        self.remote_store = remote_store
        self.replica = None
        if replica_id is not None and n_replicas > 1:
            from ..service.replication import ReplicaContext

            # replica_peers: list of peer IndexExchangeServer URLs by
            # replica id -> index fetch over HTTP instead of a shared dir
            self.replica = ReplicaContext(
                replica_id, n_replicas, peers=replica_peers
            )
        self.event_log = EventLog(path=event_log_path)
        self._tables: Dict[str, Table] = {}
        # DETACH TABLE registry: name -> Table (in-memory db) or None
        # (persisted: ATTACH reloads from disk)
        self._detached: Dict[str, Optional[Table]] = {}
        self._lock = threading.RLock()
        self.scheduler = BuildScheduler(
            n_fast=self.settings.server.background_vector_pool_size,
            n_slow=self.settings.server.background_slow_mode_vector_pool_size,
        )
        cache_bytes = self.settings.server.vector_index_cache_size
        if cache_bytes is None:
            mem = _device_memory_bytes() or _FALLBACK_CACHE_BYTES
            ratio = min(
                max(self.settings.server.vector_index_cache_size_ratio_of_memory, 0.1),
                0.9,
            )
            cache_bytes = int(mem * ratio)
        self.index_cache = LRUCache(cache_bytes, on_evict=self._on_cache_evict)
        self.counters = GLOBAL_COUNTERS
        # Persistent system logs (SystemLog.cpp contract): with a storage
        # path, query_log / vector_index_event_log flush into backing
        # engine tables and survive restarts. In-memory databases keep
        # ring-only logs.
        self.system_logs = None
        if self.path:
            from ..service.system_log import SystemLogs

            self.system_logs = SystemLogs(
                self,
                flush_interval_s=self.settings.server.system_log_flush_interval_s,
            )

    def _on_cache_evict(self, key, _value) -> None:
        """Route LRU evictions back to the owning table (CACHE_EXPIRE)."""
        try:
            table_name, index_name, segment_id = key
        except (TypeError, ValueError):
            return
        with self._lock:
            t = self._tables.get(table_name)
        if t is not None:
            t.on_cache_evict(index_name, segment_id)

    # -------------------------------------------------------------- tables
    def create_table(
        self,
        name: str,
        schema: Schema,
        settings: Optional[Settings] = None,
        *,
        engine: str = "MergeTree",
        key_column: Optional[str] = None,
        version_column: Optional[str] = None,
        sign_column: Optional[str] = None,
    ) -> Table:
        import os

        with self._lock:
            if name in self._tables:
                raise SchemaError(f"table {name!r} already exists")
            t = Table(
                name,
                schema,
                settings or self.settings,
                event_log=self.event_log,
                scheduler=self.scheduler,
                index_cache=self.index_cache,
                storage_dir=os.path.join(self.path, name) if self.path else None,
                replica=self.replica,
                engine=engine,
                key_column=key_column,
                version_column=version_column,
                sign_column=sign_column,
                remote_store=self.remote_store,
            )
            self._tables[name] = t
            return t

    def load_table(
        self,
        name: str,
        settings: Optional[Settings] = None,
        *,
        directory: Optional[str] = None,
    ) -> Table:
        """Restart path: reload a persisted table. Segments load eagerly
        (they are the data); built ANN indexes stay on disk (status BUILT)
        and reload lazily into the cache on first search. `directory`
        overrides the source (RESTORE TABLE ... FROM <dir>)."""
        import json
        import os

        import numpy as np

        from ..index.base import IndexStatus
        from ..storage import persistence
        from ..storage.table import IndexSlot

        if not directory and not self.path:
            raise SchemaError("database has no storage path")
        root = directory or os.path.join(self.path, name)
        if not os.path.isfile(os.path.join(root, "schema.json")):
            # cold start: materialize the table from the object store
            # (the reference's restart-with-S3-parts path, 00036)
            pulled = False
            if self.remote_store is not None:
                from ..storage.stores import sync_dir_from_store

                os.makedirs(root, exist_ok=True)
                pulled = sync_dir_from_store(
                    self.remote_store, f"tables/{name}", root
                )
            if not pulled:
                raise SchemaError(f"no persisted table at {root}")
        with open(os.path.join(root, "schema.json")) as f:
            sj = json.load(f)
        # pre-engine format stored the bare column map
        eng = sj.get("engine", {}) if "columns" in sj else {}
        schema = persistence.schema_from_json(sj.get("columns", sj))
        t = self.create_table(
            name,
            schema,
            settings,
            engine=eng.get("name", "MergeTree"),
            key_column=eng.get("key_column"),
            version_column=eng.get("version_column"),
            sign_column=eng.get("sign_column"),
        )
        # fts indexes first: segment inserts below then build their stores
        fts_file = os.path.join(root, "fts_indexes.json")
        if os.path.exists(fts_file):
            with open(fts_file) as f:
                for iname, d in json.load(f).items():
                    t.add_fts_index(iname, d["columns"], d.get("params"))
        # index definitions (no builds scheduled yet — segments come first)
        idx_file = os.path.join(root, "indexes.json")
        descs = {}
        if os.path.exists(idx_file):
            with open(idx_file) as f:
                descs = json.load(f)
        seg_dirs = [d for d in os.listdir(root) if d.startswith("segment_")]
        # numeric order (lexicographic would put segment_10 before segment_2,
        # breaking insertion-order semantics for Replacing winners)
        for segdir in sorted(seg_dirs, key=lambda d: int(d.split("_", 1)[1])):
            sdir = os.path.join(root, segdir)
            persistence.resume_tmp_index_dirs(sdir)  # interrupted persists
            seg_id, cols, deleted = persistence.load_segment_columns(sdir, schema)
            new_id = t.insert(cols)
            seg = next(s for s in t.live_segments() if s.segment_id == new_id)
            if deleted is not None:
                seg.delete_rows(np.nonzero(deleted)[0])
            # attach persisted index dirs to the new segment's slots
            for iname in descs:
                idir = os.path.join(sdir, f"index_{iname}")
                if os.path.isdir(idir):
                    with t._lock:
                        t._slots[(new_id, iname)] = IndexSlot(
                            IndexStatus.BUILT, path=idir
                        )
        for iname, d in descs.items():
            with t._lock:
                already = iname in t._index_descs
            if not already:
                # register the description without rescheduling builds for
                # segments that already carry a persisted index
                from ..index import registry as _registry

                vtype = schema.require_vector(d["column"])
                from ..storage.schema import BinaryVector as _BV

                desc = _registry.make_description(
                    iname,
                    d["column"],
                    d["type"],
                    vtype.dim,
                    is_binary_column=isinstance(vtype, _BV),
                    default_metric=d["metric"],
                    params=dict(d["params"], metric_type=d["metric"]),
                    strict=False,
                )
                desc.declared_type = d.get("declared_type", "") or desc.declared_type
                desc.definition = d.get("definition", "")
                with t._lock:
                    t._index_descs[iname] = desc
                    for seg in t.live_segments():
                        key = (seg.segment_id, iname)
                        if key not in t._slots:
                            t._slots[key] = IndexSlot(IndexStatus.PENDING)
                for seg in t.live_segments():
                    with t._lock:
                        pending = (
                            t._slots[(seg.segment_id, iname)].status
                            == IndexStatus.PENDING
                        )
                    if pending:
                        t._schedule_build(seg, desc)
        return t

    def create_sharded_table(
        self,
        name: str,
        schema: Schema,
        *,
        n_shards: int,
        settings: Optional[Settings] = None,
        shard_key: Optional[str] = None,
    ):
        """Distributed-engine analogue: a logical table over n shards with
        initiator-side fusion (see parallel/sharded_table.py)."""
        from ..parallel.sharded_table import ShardedTable

        return ShardedTable(
            self, name, schema, n_shards=n_shards, settings=settings,
            shard_key=shard_key,
        )

    def table(self, name: str) -> Table:
        with self._lock:
            if name not in self._tables:
                raise SchemaError(f"no such table: {name}")
            return self._tables[name]

    def drop_table(self, name: str) -> None:
        with self._lock:
            t = self._tables.pop(name, None)
        if t is not None:
            self.index_cache.expire_prefix((name,))

    def detach_table(self, name: str) -> None:
        """DETACH TABLE: remove from the registry without dropping data.
        With a storage path the table is checkpointed first, so the
        matching ATTACH exercises the full deserialization path — the
        reference's DETACH/ATTACH round-trip in
        00004_mqvs_filter_by_distance.sh. Pathless databases park the
        live object in a detached registry instead."""
        with self._lock:
            # pop + park under ONE hold (ADVICE r4: a concurrent
            # create_table/attach could interleave into the gap and
            # clobber or lose the table)
            if name not in self._tables:
                raise SchemaError(f"no such table: {name}")
            t = self._tables.pop(name)
            # None = reload from disk on ATTACH; live object otherwise
            self._detached[name] = None if t.storage_dir else t
        if t.storage_dir:
            t.persist()
        self.index_cache.expire_prefix((name,))

    def attach_table(self, name: str) -> Table:
        """ATTACH TABLE: re-register a detached table, reloading it from
        its checkpoint when one exists (deserializes segments; built ANN
        indexes stay BUILT on disk and reload lazily on first search)."""
        with self._lock:
            # collision check + pop + reinsert under ONE hold (ADVICE r4)
            if name in self._tables:
                raise SchemaError(f"table {name!r} already exists")
            missing = name not in self._detached
            t = self._detached.pop(name, None)
            if t is not None:
                self._tables[name] = t
        if t is not None:
            return t
        if missing and not self.path:
            raise SchemaError(f"no detached table: {name}")
        return self.load_table(name)

    def rename_table(self, name: str, new_name: str) -> None:
        """RENAME TABLE: registry + Table.name swap, and the on-disk
        checkpoint directory moves with it (otherwise a persisted rename
        would be unloadable under the new name after a restart).
        Index-cache entries are keyed by table name, so they are expired
        — indexes lazily reload under the new name."""
        import os

        with self._lock:
            if name not in self._tables:
                raise SchemaError(f"no such table: {name}")
            if new_name in self._tables:
                raise SchemaError(f"table {new_name!r} already exists")
            t = self._tables[name]
            old_dir = t.storage_dir
            new_dir = (
                os.path.join(self.path, new_name) if self.path else None
            )
            if new_dir and os.path.exists(new_dir):
                raise SchemaError(
                    f"storage dir for {new_name!r} already exists"
                )
            if old_dir and new_dir and os.path.isdir(old_dir):
                os.replace(old_dir, new_dir)
                with t._lock:
                    for slot in t._slots.values():
                        if slot.path.startswith(old_dir):
                            slot.path = new_dir + slot.path[len(old_dir):]
            del self._tables[name]
            t.name = new_name
            if new_dir:
                t.storage_dir = new_dir
            self._tables[new_name] = t
        self.index_cache.expire_prefix((name,))

    def tables(self) -> List[str]:
        with self._lock:
            return sorted(self._tables)

    # ------------------------------------------------------------- system
    def system_table(self, which: str) -> List[dict]:
        """system.vector_indices / vector_index_segments /
        vector_index_event_log (attachSystemTables.cpp:144-145,
        SystemLog.cpp:224-225)."""
        if which == "vector_indices":
            rows = []
            for t in list(self._tables.values()):
                rows.extend(t.system_vector_indices())
            return rows
        if which == "vector_index_segments":
            rows = []
            for t in list(self._tables.values()):
                rows.extend(t.system_vector_index_segments())
            return rows
        if which == "vector_index_event_log":
            if self.system_logs is not None:
                return self.system_logs.rows("vector_index_event_log")
            return self.event_log.rows()
        if which in ("span_log", "opentelemetry_span_log"):
            from ..service.tracing import GLOBAL_SPAN_LOG

            return GLOBAL_SPAN_LOG.rows()
        if which == "query_log":
            if self.system_logs is not None:
                return self.system_logs.rows("query_log")
            from ..service.event_log import GLOBAL_QUERY_LOG

            return GLOBAL_QUERY_LOG.rows()
        if which == "profile_events":
            return [
                {"event": k, "value": v} for k, v in sorted(self.counters.snapshot().items())
            ]
        if which == "tables":
            # system.tables analogue (StorageSystemTables)
            return [
                {"database": "default", "name": t.name,
                 "engine": getattr(t, "engine", "MergeTree") or "MergeTree",
                 "total_rows": t.n_rows}
                for t in list(self._tables.values())
            ]
        if which == "parts":
            # system.parts analogue: one row per live segment
            # (StorageSystemParts; reference tests count parts to check
            # merge behavior, e.g. 00002_mqvs_batch_distance.sh)
            rows = []
            for t in list(self._tables.values()):
                for s in t.live_segments():
                    rows.append({
                        "database": "default",
                        "table": t.name,
                        "name": f"seg_{s.segment_id}",
                        "partition": "tuple()",
                        "rows": int(s.num_live),
                        "active": 1,
                        "marks": 1,
                        "bytes_on_disk": int(getattr(s, "device_bytes", 0) or 0),
                    })
            return rows
        raise SchemaError(f"unknown system table: {which}")

    # ------------------------------------------------------ table functions
    def full_text_search(
        self,
        table: str,
        index_name: str,
        query: str,
        *,
        k: Optional[int] = None,
        columns: Optional[List[str]] = None,
        with_score: bool = True,
        operator: str = "OR",
    ) -> List[dict]:
        """full_text_search(db_table, index, query) table function
        (StorageFullTextSearch, default limit 10000 —
        TableFunctionFullTextSearch.cpp)."""
        t = self.table(table)
        res = t.text_search(index_name, query, k or 10_000, operator=operator)
        cols = columns or list(t.schema.scalar_columns())
        gathered = t.gather(res, cols)
        out = []
        for j in range(res.k):
            if not res.valid[0, j]:
                continue
            row = {c: gathered[c][0, j] for c in cols}
            if with_score:
                row["bm25_score"] = float(res.scores[0, j])
            out.append(row)
        return out

    def fts_index_stats(self, table: str, column_or_index: str, query: str = "") -> dict:
        """ftsIndex(db, table, col, query) analogue: table-level BM25 corpus
        statistics (total docs/tokens, per-query-term doc freq) — the
        payload a distributed initiator aggregates
        (TableFunctionFtsIndex.cpp:112-116)."""
        from ..search.text_executor import TextSearchExecutor

        t = self.table(table)
        tdef = TextSearchExecutor(t)._resolve(column_or_index)
        seg_ids = [s.segment_id for s in t.live_segments()]
        stats = tdef.merged_stats(seg_ids)
        terms = tdef.analyzer.tokenize(query) if query else []
        return {
            "total_docs": stats.total_docs,
            "total_tokens": stats.total_tokens,
            "avg_doc_len": stats.avg_doc_len,
            "doc_freq": {tm: stats.doc_freq.get(tm, 0) for tm in terms},
        }

    # ----------------------------------------------------------------- sql
    def sql(self, statement: str):
        """Execute one SQL statement (the reference's dialect subset —
        SURVEY.md §2.7). Returns a list of row dicts for SELECT, [] for
        DDL/INSERT. The runner persists across calls so `SET k = v`
        session settings stick."""
        from ..sql.runner import SQLRunner

        with self._lock:
            if not hasattr(self, "_sql_runner"):
                self._sql_runner = SQLRunner(self)
            runner = self._sql_runner
        return runner.execute(statement)

    def close(self):
        if self.system_logs is not None:
            self.system_logs.close()
        self.scheduler.shutdown()


def connect(settings: Optional[Settings] = None, **kw) -> Database:
    return Database(settings, **kw)
