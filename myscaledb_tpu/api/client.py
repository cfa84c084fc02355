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
    def __init__(self, settings: Optional[Settings] = None, *, event_log_path=None):
        self.settings = settings or Settings()
        self.event_log = EventLog(path=event_log_path)
        self._tables: Dict[str, Table] = {}
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
        self.index_cache = LRUCache(cache_bytes)
        self.counters = GLOBAL_COUNTERS

    # -------------------------------------------------------------- tables
    def create_table(
        self, name: str, schema: Schema, settings: Optional[Settings] = None
    ) -> Table:
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
            )
            self._tables[name] = t
            return t

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
            return self.event_log.rows()
        if which == "profile_events":
            return [
                {"event": k, "value": v} for k, v in sorted(self.counters.snapshot().items())
            ]
        raise SchemaError(f"unknown system table: {which}")

    def close(self):
        self.scheduler.shutdown()


def connect(settings: Optional[Settings] = None, **kw) -> Database:
    return Database(settings, **kw)
