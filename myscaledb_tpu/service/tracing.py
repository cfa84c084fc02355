"""Lightweight span tracing for the search/build paths.

The reference wraps every stage in OpenTelemetry spans flowing into
system.opentelemetry_span_log (SURVEY.md §5: MergeTreeVSManager.cpp:261,
ReadWithHybridSearch.cpp:262, VIWithDataPart.h:306). Here: a contextvar
span stack recording (name, attrs, start, duration) into a bounded ring,
queryable as Database.system_table('span_log'). Zero overhead when
disabled (module-level flag).
"""

from __future__ import annotations

import collections
import contextlib
import contextvars
import threading
import time
import uuid
from typing import Any, Dict, List, Optional

enabled = True

_current_trace: contextvars.ContextVar = contextvars.ContextVar(
    "msql_trace", default=None
)


class SpanLog:
    def __init__(self, max_spans: int = 100_000):
        self._spans: collections.deque = collections.deque(maxlen=max_spans)
        self._lock = threading.Lock()

    def record(self, row: Dict[str, Any]) -> None:
        with self._lock:
            self._spans.append(row)

    def rows(self) -> List[Dict[str, Any]]:
        with self._lock:
            return list(self._spans)

    def clear(self) -> None:
        with self._lock:
            self._spans.clear()


GLOBAL_SPAN_LOG = SpanLog()


@contextlib.contextmanager
def span(name: str, **attrs):
    """Context manager: records a span row on exit. Nested spans share the
    trace id of the outermost span."""
    if not enabled:
        yield None
        return
    parent = _current_trace.get()
    if parent is None:
        trace_id = uuid.uuid4().hex[:16]
        depth = 0
    else:
        trace_id, depth = parent
    token = _current_trace.set((trace_id, depth + 1))
    t0 = time.perf_counter()
    err = ""
    try:
        yield trace_id
    except Exception as e:  # noqa: BLE001
        err = f"{type(e).__name__}: {e}"
        raise
    finally:
        _current_trace.reset(token)
        GLOBAL_SPAN_LOG.record(
            {
                "trace_id": trace_id,
                "span": name,
                "depth": depth,
                "start_ts": time.time(),
                "duration_us": int((time.perf_counter() - t0) * 1e6),
                "error": err,
                **{k: v for k, v in attrs.items() if v is not None},
            }
        )
