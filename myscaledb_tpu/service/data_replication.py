"""Replicated DATA path: segment-level replication + a per-table log.

The reference replicates parts themselves plus a coordination log in
ZooKeeper: inserts/merges become log entries
(`StorageReplicatedMergeTree.cpp:3183` schedules ReplicatedVITask through
the log), parts AND their indexes are fetched replica-to-replica
(`DataPartsExchange.cpp:127-217`), and autoload/catch-up state lives in
ZK `vidx_info` (tests 00032_mqvs_vector_index_autoload.sql).

TPU-native mapping (no ZK in this image — the coordination log is an
append-only per-(node, table) op log served over HTTP, exactly the role
the ZK log plays):

  ReplicatedNode      one replica process: wraps a Database; a commit
                      listener persists every committed local op (insert /
                      deletes / mutate / merge) and appends a log entry;
                      an HTTP endpoint serves the log + segment files;
                      `sync()` pulls peers' logs, fetches their segments,
                      and applies ops locally (pull-based; run it on a
                      timer for continuous replication — the reference's
                      replication queue thread).

  Ops carry a globally unique segment uid `<origin>:<local id>`; appliers
  keep a uid -> local-segment map (persisted with the applied high-water
  marks in replica_state.json — the `vidx_info` autoload analogue, so a
  restarted replica resumes where it left off instead of re-fetching).

  Convergence rules:
    insert   idempotent by uid (applied-once).
    deletes  bitmaps merge by OR (ships row indices; re-apply is a no-op).
    mutate   ships the full scalar columns of the mutated segment
             (vector columns cannot be UPDATEd — storage/table.py:update),
             applied by overwrite; last-writer-wins per segment.
    merge    the ORIGIN's merge replicates: appliers ingest the merged
             segment and drop their local sources. A merge whose sources
             are already gone (a concurrent merge elsewhere won) is
             skipped — initiate merges from one replica at a time, the
             reference's leader-assigned-merge convention.

Index replication composes: with build_vector_index_on_random_single_
replica, the deterministic picker (service/replication.py) chooses the
builder for each replicated segment and peers fetch the built files via
service/exchange.py.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from .event_log import GLOBAL_COUNTERS

_SAFE_SEG = ("columns.npz", "meta.json", "deletes.npy", "checksums.json")


def _uid_dir(root: str, table: str, uid: str) -> str:
    return os.path.join(root, "repdata", table, uid.replace(":", "_"))


class ReplicatedNode:
    """One data replica. See module docstring."""

    def __init__(
        self, db, node_id: str, root_dir: str, *, host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.db = db
        self.node_id = str(node_id)
        self.root = os.path.abspath(root_dir)
        os.makedirs(self.root, exist_ok=True)
        self._lock = threading.RLock()
        self._applying = threading.local()  # re-entrancy guard per thread
        # per-table op log: list of dict entries; seq is per (node, table)
        self._log: Dict[str, List[Dict[str, Any]]] = {}
        # uid -> local segment id (applied remote segments + local ones)
        self._seg_map: Dict[str, int] = {}
        # peer base url -> {table: applied_seq}
        self._applied: Dict[str, Dict[str, int]] = {}
        self.peers: List[str] = []
        self._load_state()
        self._httpd = self._serve(host, port)
        self.url = f"http://{host}:{self.port}"

    # ------------------------------------------------------------ publish
    def attach(self, table) -> None:
        """Register the commit listener on a table (call once per table,
        after create_table, on every replica)."""
        table.add_commit_listener(self._on_commit)
        self._log.setdefault(table.name, [])
        # restart reconciliation (autoload): mappings whose local segment
        # no longer exists (fresh process, lost checkpoint) are dropped and
        # the peer watermarks reset so sync() re-applies from the log —
        # idempotent by uid, and fetches hit the local repdata mirror first
        live = {s.segment_id for s in table.live_segments()}
        with self._lock:
            stale = [
                u for u, sid in self._seg_map.items()
                if u.split(":")[1] == table.name and sid not in live
            ]
            for u in stale:
                del self._seg_map[u]
            if stale:
                for peer_map in self._applied.values():
                    peer_map[table.name] = 0
        # pre-existing local segments become publishable uids — but NOT
        # segments that are already mapped (applied from a peer or
        # published before a restart): republishing those would duplicate
        # rows across the replica set
        with self._lock:
            mapped_local = {
                sid for u, sid in self._seg_map.items()
                if u.split(":")[1] == table.name
            }
        for seg in table.live_segments():
            if seg.segment_id in mapped_local:
                continue
            uid = f"{self.node_id}:{table.name}:{seg.segment_id}"
            self._persist_segment(table, seg, uid)
            self._append(table.name, {"op": "insert", "uid": uid})
            with self._lock:
                self._seg_map[uid] = seg.segment_id

    def _on_commit(self, table, op: str, segment=None, dropped_ids=None) -> None:
        if getattr(self._applying, "on", False):
            return  # applying a peer's op: never re-publish
        tname = table.name
        if op == "insert":
            uid = f"{self.node_id}:{tname}:{segment.segment_id}"
            self._persist_segment(table, segment, uid)
            with self._lock:
                self._seg_map[uid] = segment.segment_id
            self._append(tname, {"op": "insert", "uid": uid})
        elif op in ("deletes", "mutate"):
            uid = self._uid_of(tname, segment.segment_id)
            if uid is None:
                return
            if op == "deletes":
                rows = np.nonzero(segment.deleted_host()[: segment.n_rows])[0]
                path = _uid_dir(self.root, tname, uid)
                os.makedirs(path, exist_ok=True)
                fn = f"deleted_rows_g{segment.mutation_generation}.npy"
                np.save(os.path.join(path, fn), rows.astype(np.int64))
                self._append(tname, {"op": "deletes", "uid": uid, "file": fn})
            else:
                # re-persist the whole segment; appliers overwrite scalars
                self._persist_segment(table, segment, uid, suffix="_mut")
                self._append(
                    tname,
                    {"op": "mutate", "uid": uid,
                     "generation": segment.mutation_generation},
                )
        elif op == "truncate":
            with self._lock:
                stale = [
                    u for u in self._seg_map if u.split(":")[1] == tname
                ]
                for u in stale:
                    self._seg_map.pop(u, None)
            self._append(tname, {"op": "truncate"})
        elif op == "merge":
            new_uid = f"{self.node_id}:{tname}:{segment.segment_id}"
            src_uids = [
                u for i in (dropped_ids or [])
                if (u := self._uid_of(tname, i)) is not None
            ]
            self._persist_segment(table, segment, new_uid)
            with self._lock:
                self._seg_map[new_uid] = segment.segment_id
                for u in src_uids:
                    self._seg_map.pop(u, None)
            self._append(
                tname, {"op": "merge", "uid": new_uid, "sources": src_uids}
            )

    def _uid_of(self, tname: str, seg_id: int) -> Optional[str]:
        with self._lock:
            for u, sid in self._seg_map.items():
                if sid == seg_id and u.split(":")[1] == tname:
                    return u
        return None

    def _persist_segment(self, table, segment, uid: str, suffix: str = "") -> None:
        from ..storage.persistence import save_segment

        d = _uid_dir(self.root, table.name, uid) + suffix
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        save_segment(segment, tmp)
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)
        if suffix:  # mutation snapshot replaces the base dir too
            # stage + rename-rename: never leave the base dir missing for
            # the duration of a copytree — a peer fetching mid-window
            # would 404 (it retries next sync, but the window should be
            # two renames, not a full tree copy)
            base = _uid_dir(self.root, table.name, uid)
            staged = base + ".stage"
            old = base + ".old"
            shutil.rmtree(staged, ignore_errors=True)
            shutil.copytree(d, staged)
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(base):
                os.replace(base, old)
            os.replace(staged, base)
            shutil.rmtree(old, ignore_errors=True)

    def _append(self, tname: str, entry: Dict[str, Any]) -> None:
        with self._lock:
            log = self._log.setdefault(tname, [])
            entry = dict(entry, seq=len(log))
            log.append(entry)
            with open(
                os.path.join(self.root, f"replog_{tname}.jsonl"), "a"
            ) as f:
                f.write(json.dumps(entry) + "\n")
        GLOBAL_COUNTERS.bump("ReplicationLogEntries")

    # -------------------------------------------------------------- serve
    def _serve(self, host: str, port: int):
        node = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, payload):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urllib.parse.urlparse(self.path)
                parts = [p for p in u.path.split("/") if p]
                if any(os.sep in p or p in ("..", ".") for p in parts):
                    self.send_error(400)
                    return
                if len(parts) == 2 and parts[0] == "replog":
                    q = urllib.parse.parse_qs(u.query)
                    since = int(q.get("since", ["0"])[0])
                    with node._lock:
                        entries = list(node._log.get(parts[1], []))[since:]
                    self._json(200, {"entries": entries})
                    return
                if len(parts) >= 3 and parts[0] == "segdata":
                    d = os.path.join(node.root, "repdata", parts[1], parts[2])
                    if len(parts) == 3:
                        if not os.path.exists(
                            os.path.join(d, "checksums.json")
                        ):
                            self.send_error(404)
                            return
                        files = sorted(
                            f for f in os.listdir(d)
                            if os.path.isfile(os.path.join(d, f))
                        )
                        self._json(200, {"files": files})
                        return
                    fp = os.path.join(d, parts[3])
                    if not os.path.isfile(fp):
                        self.send_error(404)
                        return
                    with open(fp, "rb") as f:
                        data = f.read()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                self.send_error(404)

        httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = httpd.server_address[1]
        t = threading.Thread(
            target=httpd.serve_forever, name=f"repl-{self.node_id}", daemon=True
        )
        t.start()
        return httpd

    # --------------------------------------------------------------- sync
    def sync(self) -> int:
        """Pull every peer's log and apply new entries. Returns the number
        of ops applied (the replication-queue drain)."""
        applied = 0
        for peer in list(self.peers):
            for tname in self.db.tables():
                applied += self._sync_table(peer, tname)
        if applied:
            self._save_state()
        return applied

    def _sync_table(self, peer: str, tname: str) -> int:
        key = self._applied.setdefault(peer, {})
        since = key.get(tname, 0)
        try:
            with urllib.request.urlopen(
                f"{peer}/replog/{tname}?since={since}", timeout=10
            ) as r:
                entries = json.loads(r.read())["entries"]
        except Exception:  # noqa: BLE001 — peer down: retry next sync
            return 0
        n = 0
        for e in entries:
            if not self._apply(peer, tname, e):
                # transient failure (fetch/checksum): do NOT advance the
                # watermark — advancing would permanently skip this entry
                # and silently diverge the replica (every later op on the
                # same uid would no-op on the missing seg_map entry).
                # Retry from here on the next sync round.
                break
            key[tname] = e["seq"] + 1
            n += 1
        return n

    def _apply(self, peer: str, tname: str, e: Dict[str, Any]) -> bool:
        """Apply one log entry. Returns True when the entry is SETTLED —
        applied, already applied, or permanently inapplicable by design
        (sources merged away) — and False on transient failures that
        must be retried without advancing the watermark."""
        t = self.db.table(tname)
        op, uid = e["op"], e.get("uid")
        self._applying.on = True
        try:
            if op == "insert":
                with self._lock:
                    if uid in self._seg_map:
                        return True  # already applied (or our own)
                local = self._ingest(peer, t, uid)
                if local is None:
                    return False  # transient fetch failure: retry
                with self._lock:
                    self._seg_map[uid] = local
                GLOBAL_COUNTERS.bump("ReplicatedSegmentFetches")
            elif op == "deletes":
                with self._lock:
                    local = self._seg_map.get(uid)
                if local is None:
                    return True  # segment merged away: deletes subsumed
                rows = self._fetch_np(peer, tname, uid, e["file"])
                if rows is None:
                    return False  # transient fetch failure: retry
                seg = next(
                    (s for s in t.live_segments() if s.segment_id == local),
                    None,
                )
                if seg is not None and len(rows):
                    already = seg.deleted_host()[: seg.n_rows]
                    fresh = rows[~already[rows]]
                    if len(fresh):
                        seg.delete_rows(fresh)  # OR-merge
                        for tdef in t._text_indexes.values():
                            tdef.on_deletes(seg)
                    t._winners_cache = None
            elif op == "mutate":
                with self._lock:
                    local = self._seg_map.get(uid)
                if local is None:
                    return True  # segment merged away: mutation subsumed
                got = self._fetch_segment_columns(
                    peer, t, tname, uid, force=True
                )
                if got is None:
                    return False  # transient fetch failure: retry
                _, cols, _deleted = got
                seg = next(
                    (s for s in t.live_segments() if s.segment_id == local),
                    None,
                )
                if seg is None:
                    return True  # dropped locally: nothing to mutate
                for cname in seg.scalars:
                    seg.scalar(cname)[: seg.n_rows] = cols[cname]
                seg.mutation_generation += 1
                for tdef in t._text_indexes.values():
                    tdef.on_new_segment(seg)
                t._winners_cache = None
            elif op == "truncate":
                t.truncate()  # listener suppressed via _applying
                with self._lock:
                    for u in [
                        u for u in self._seg_map
                        if u.split(":")[1] == tname
                    ]:
                        self._seg_map.pop(u, None)
            elif op == "merge":
                with self._lock:
                    if uid in self._seg_map:
                        return True
                    srcs = [self._seg_map.get(u) for u in e.get("sources", [])]
                if any(s is None for s in srcs):
                    GLOBAL_COUNTERS.bump("ReplicationSkippedMerges")
                    return True  # concurrent merge elsewhere won; gone
                local = self._ingest(peer, t, uid)
                if local is None:
                    return False  # transient fetch failure: retry
                with self._lock:
                    self._seg_map[uid] = local
                    for u in e.get("sources", []):
                        self._seg_map.pop(u, None)
                t._drop_segments([s for s in srcs if s is not None])
            return True
        finally:
            self._applying.on = False

    def _ingest(self, peer: str, table, uid: str) -> Optional[int]:
        got = self._fetch_segment_columns(peer, table, table.name, uid)
        if got is None:
            return None
        _, cols, deleted = got
        seg_id = table.insert(cols)
        if deleted is not None and deleted.any():
            seg = next(
                s for s in table.live_segments() if s.segment_id == seg_id
            )
            seg.delete_rows(np.nonzero(deleted)[0])
        # the fetched files already landed under our repdata mirror
        # (_fetch_segment_columns), so this node can serve them onward
        # and survives restarts without refetching
        return seg_id

    def _fetch_segment_columns(self, peer, table, tname, uid, force=False):
        from ..storage.persistence import _verify_checksums, load_segment_columns

        safe = uid.replace(":", "_")
        base = f"{peer}/segdata/{tname}/{safe}"
        dest = _uid_dir(self.root, tname, uid)
        if force:
            # mutation apply: the local mirror holds the PRE-mutation
            # columns; refetch unconditionally
            shutil.rmtree(dest, ignore_errors=True)
        if not os.path.exists(os.path.join(dest, "checksums.json")):
            tmp = dest + ".fetch"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            try:
                with urllib.request.urlopen(base, timeout=30) as r:
                    files = json.loads(r.read())["files"]
                for fn in files:
                    if fn not in _SAFE_SEG and not fn.startswith("deleted_rows_"):
                        raise ValueError(f"unexpected manifest entry {fn!r}")
                    with urllib.request.urlopen(f"{base}/{fn}", timeout=60) as r:
                        with open(os.path.join(tmp, fn), "wb") as f:
                            shutil.copyfileobj(r, f)
                _verify_checksums(tmp)
            except Exception:  # noqa: BLE001 — no partial installs
                shutil.rmtree(tmp, ignore_errors=True)
                GLOBAL_COUNTERS.bump("ReplicatedSegmentFailedFetches")
                return None
            shutil.rmtree(dest, ignore_errors=True)
            os.replace(tmp, dest)
        try:
            return load_segment_columns(dest, table.schema)
        except Exception:  # noqa: BLE001 — corrupt local mirror: refetch later
            shutil.rmtree(dest, ignore_errors=True)
            return None

    def _fetch_np(self, peer, tname, uid, fname) -> Optional[np.ndarray]:
        if "/" in fname or os.sep in fname or fname in (".", ".."):
            return None
        safe = uid.replace(":", "_")
        try:
            with urllib.request.urlopen(
                f"{peer}/segdata/{tname}/{safe}/{fname}", timeout=30
            ) as r:
                data = r.read()
            path = os.path.join(_uid_dir(self.root, tname, uid), fname)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(data)
            return np.load(path)
        except Exception:  # noqa: BLE001
            return None

    # -------------------------------------------------------------- state
    def _state_path(self) -> str:
        return os.path.join(self.root, "replica_state.json")

    def _save_state(self) -> None:
        with self._lock:
            state = {"applied": self._applied, "seg_map": self._seg_map}
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path())

    def _load_state(self) -> None:
        try:
            with open(self._state_path()) as f:
                state = json.load(f)
            self._applied = {
                p: {t: int(s) for t, s in m.items()}
                for p, m in state.get("applied", {}).items()
            }
            self._seg_map = {
                u: int(s) for u, s in state.get("seg_map", {}).items()
            }
        except (OSError, ValueError):
            pass
        # reload our own log so peers can resume from any seq after restart
        for fn in os.listdir(self.root) if os.path.isdir(self.root) else []:
            if fn.startswith("replog_") and fn.endswith(".jsonl"):
                tname = fn[len("replog_"):-len(".jsonl")]
                entries = []
                with open(os.path.join(self.root, fn)) as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            entries.append(json.loads(line))
                self._log[tname] = entries

    def close(self) -> None:
        self._save_state()
        self._httpd.shutdown()
