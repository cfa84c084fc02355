"""Text & hybrid search execution over a table's segments.

Re-expresses MergeTreeTextSearchManager / MergeTreeHybridSearchManager
(SURVEY.md §2.1, §3.3):

  * table-consistent BM25: per-segment stats merged BEFORE scoring
    (getStatisticForTextSearch, ReadWithHybridSearch.cpp:89-209);
  * per-segment device BM25 top-k with the pre-filter ∩ delete bitmap
    (bm25SearchWithFilter contract);
  * global merge across segments by score;
  * hybrid: vector leg + text leg, each fetching
    k × hybrid_search_top_k_multiple_base candidates
    (ExpressionAnalyzer.cpp:1217), fused with RRF or RSF.

The fts index itself is built at insert time, like the reference's fts
skip index written during part writes (MergeTreeDataPartWriterOnDisk.cpp:
238-244, 334-338, 450-457).
"""

from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional

import numpy as np

from ..errors import QueryShapeError, SchemaError
from ..metrics import Metric
from ..service.event_log import GLOBAL_COUNTERS
from ..text.analyzer import Analyzer
from ..text.inverted import BM25Stats, InvertedIndex
from .executor import SearchResult, segment_mask
from .filters import Expr
from .fusion import rank_fusion, relative_score_fusion


class TextIndexDefinition:
    """One fts index over one or more string columns (the
    `INDEX name(col, ...) TYPE fts('{json}')` DDL analogue)."""

    def __init__(self, name: str, columns: List[str], params: Optional[Dict[str, Any]] = None):
        self.name = name
        self.columns = list(columns)
        self.analyzer = Analyzer(params)
        self.params = dict(params or {})
        self._stores: Dict[int, InvertedIndex] = {}
        self._lock = threading.Lock()

    def on_new_segment(self, segment) -> None:
        texts = [segment.scalar(c)[: segment.n_rows] for c in self.columns]
        store = InvertedIndex.build(
            texts, segment.capacity, analyzer=self.analyzer
        )
        with self._lock:
            self._stores[segment.segment_id] = store
        GLOBAL_COUNTERS.bump("FTSIndexBuilds")

    def on_segment_dropped(self, segment_id: int) -> None:
        with self._lock:
            self._stores.pop(segment_id, None)

    def on_deletes(self, segment) -> None:
        # deletes are applied at query time through the alive bitmap
        pass

    def store(self, segment_id: int) -> Optional[InvertedIndex]:
        with self._lock:
            return self._stores.get(segment_id)

    def merged_stats(self, segment_ids) -> BM25Stats:
        with self._lock:
            parts = [self._stores[s].stats for s in segment_ids if s in self._stores]
        if not parts:
            return BM25Stats(0, 0, {})
        return BM25Stats.merge(parts)

    @property
    def memory_bytes(self) -> int:
        with self._lock:
            return sum(s.memory_bytes for s in self._stores.values())


class _TokenFilter(Expr):
    """hasToken predicate: index-accelerated when the segment has an fts
    store (term bitmap, the ffi_query_term_bitmap role), tokenize-scan
    fallback otherwise."""

    def __init__(self, table, column: str, token: str):
        self._table = table
        self.column = column
        self.token = token

    def _tdef(self):
        for d in self._table._text_indexes.values():
            if self.column in d.columns:
                return d
        return None

    def evaluate(self, segment) -> np.ndarray:
        tdef = self._tdef()
        if tdef is not None:
            store = tdef.store(segment.segment_id)
            if store is not None:
                toks = tdef.analyzer.tokenize(self.token)
                if not toks:
                    return np.zeros(segment.n_rows, bool)
                out = store.term_bitmap(toks[0])
                for tk in toks[1:]:
                    out &= store.term_bitmap(tk)
                GLOBAL_COUNTERS.bump("FTSAcceleratedFilters")
                return out
        # fallback: tokenize-and-scan the column
        an = Analyzer()
        want = set(an.tokenize(self.token))
        col = segment.scalar(self.column)[: segment.n_rows]
        return np.fromiter(
            (want <= set(an.tokenize(str(v))) for v in col),
            dtype=bool,
            count=segment.n_rows,
        )

    def columns(self):
        return {self.column}

    def __repr__(self):
        return f"hasToken({self.column}, {self.token!r})"


def fts_token_filter(table, column: str, token: str) -> Expr:
    return _TokenFilter(table, column, token)


class TextSearchExecutor:
    def __init__(self, table):
        self.table = table

    def _resolve(self, column_or_index: str) -> TextIndexDefinition:
        t = self.table
        tdef = t._text_indexes.get(column_or_index)
        if tdef is not None:
            return tdef
        for d in t._text_indexes.values():
            if column_or_index in d.columns:
                return d
        raise SchemaError(
            f"no fts index covering {column_or_index!r}; "
            f"add one with add_fts_index()"
        )

    def run(
        self,
        column_or_index: str,
        query: str,
        k: Optional[int],
        *,
        filter: Optional[Expr] = None,
        operator: str = "OR",
        stats_override: Optional[BM25Stats] = None,
    ) -> SearchResult:
        """textsearch() analogue: BM25 top-k, scores descending.

        stats_override: cluster-wide statistics injected by a distributed
        initiator (the _fts_statistic_info scalar analogue) — replaces the
        local table stats so scores are comparable across shards."""
        t = self.table
        st = t.settings
        k = int(k if k is not None else st.query.default_topk)
        if k <= 0:
            raise QueryShapeError("k must be positive")
        if k > st.query.max_search_result_window:
            raise QueryShapeError(
                f"top-k window {k} exceeds max_search_result_window="
                f"{st.query.max_search_result_window}"
            )
        tdef = self._resolve(column_or_index)
        GLOBAL_COUNTERS.bump("TextSearchQueries")
        segments = t.live_segments()
        seg_ids = [s.segment_id for s in segments]
        stats = (
            stats_override
            if stats_override is not None
            else tdef.merged_stats(seg_ids)
        )

        per: List = []
        for seg in segments:
            store = tdef.store(seg.segment_id)
            if store is None:
                continue
            mask = segment_mask(seg, filter)
            vals, rows, _terms = store.bm25_topk(
                query, k, stats=stats, operator=operator, mask=mask
            )
            per.append((seg.segment_id, np.asarray(vals)[0], np.asarray(rows)[0]))
        if not per:
            return SearchResult.empty(Metric.IP, 1, k)
        allv = np.concatenate([v for _, v, _ in per])
        allr = np.concatenate([r for _, _, r in per])
        alls = np.concatenate(
            [np.full(len(v), sid, np.int64) for sid, v, _ in per]
        )
        order = np.argsort(-allv, kind="stable")[:k]
        vals = allv[order]
        segs = alls[order]
        rows = allr[order]
        bad = ~np.isfinite(vals) | (rows < 0)
        segs = np.where(bad, -1, segs)
        rows = np.where(bad, -1, rows)
        if len(vals) < k:
            pad = k - len(vals)
            vals = np.pad(vals, (0, pad), constant_values=-np.inf)
            segs = np.pad(segs, (0, pad), constant_values=-1)
            rows = np.pad(rows, (0, pad), constant_values=-1)
        # BM25 score is bigger-better: expose via the IP (similarity) convention
        return SearchResult(
            Metric.IP,
            host=(vals[None].astype(np.float32), segs[None], rows[None].astype(np.int32)),
            nq=1,
            k=k,
        )


class HybridSearchExecutor:
    def __init__(self, table):
        self.table = table

    def run(
        self,
        vector_column: str,
        text_column_or_index: str,
        vector_query,
        text_query: str,
        k: Optional[int],
        *,
        fusion_type: str = "rsf",
        fusion_weight: Optional[float] = None,
        fusion_k: Optional[int] = None,
        filter: Optional[Expr] = None,
        operator: str = "OR",
        params: Optional[Dict[str, Any]] = None,
    ) -> SearchResult:
        """hybridsearch() analogue. Single query; returns fused scores
        descending (ORDER BY score DESC per the reference contract)."""
        t = self.table
        st = t.settings
        k = int(k if k is not None else st.query.default_topk)
        n_cand = min(
            k * st.query.hybrid_search_top_k_multiple_base,
            st.query.max_search_result_window,
        )
        GLOBAL_COUNTERS.bump("HybridSearchQueries")

        vres = t.search(vector_column, vector_query, n_cand, filter=filter, params=params)
        if vres.nq != 1:
            raise QueryShapeError("hybrid search takes a single vector query")
        tres = TextSearchExecutor(t).run(
            text_column_or_index, text_query, n_cand, filter=filter, operator=operator
        )

        vvalid = vres.valid[0]
        vkeys = [
            (int(s), int(r))
            for s, r in zip(vres.segments[0][vvalid], vres.rows[0][vvalid])
        ]
        vdists = vres.distances[0][vvalid]
        tvalid = tres.valid[0]
        tkeys = [
            (int(s), int(r))
            for s, r in zip(tres.segments[0][tvalid], tres.rows[0][tvalid])
        ]
        tscores = tres.scores[0][tvalid]

        ftype = fusion_type.lower()
        if ftype == "rrf":
            fused = rank_fusion(
                [vkeys, tkeys],
                k,
                fusion_k=int(fusion_k or st.query.hybrid_search_fusion_k),
            )
        elif ftype == "rsf":
            from ..metrics import direction

            vec_asc = direction(vres.metric) == "asc"
            fused = relative_score_fusion(
                list(zip(vkeys, vdists.tolist())),
                list(zip(tkeys, tscores.tolist())),
                k,
                fusion_weight=(
                    st.query.hybrid_search_fusion_weight
                    if fusion_weight is None
                    else fusion_weight
                ),
                vec_ascending_better=vec_asc,
            )
        else:
            raise QueryShapeError(f"fusion_type must be rrf or rsf, got {fusion_type!r}")

        vals = np.full(k, -np.inf, np.float32)
        segs = np.full(k, -1, np.int64)
        rows = np.full(k, -1, np.int32)
        for i, ((sid, rid), score) in enumerate(fused):
            vals[i] = score
            segs[i] = sid
            rows[i] = rid
        return SearchResult(
            Metric.IP, host=(vals[None], segs[None], rows[None]), nq=1, k=k
        )
