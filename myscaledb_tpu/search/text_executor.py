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

import functools
import threading
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
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
        # segment_id -> segment, for stores whose build is pending/running
        # (insert-time builds run OFF the client's critical path, like the
        # reference's part-write pipeline; a search arriving first builds
        # on demand under the per-definition build lock)
        self._pending: Dict[int, Any] = {}
        self._build_lock = threading.Lock()
        self._stats_cache = None  # (segment-id key, merged BM25Stats)
        self._stats_gen = 0  # bumped on every invalidation: a stats
        # computation that straddles an invalidation must not re-install
        # its (stale) result (TOCTOU between snapshot and cache write)

    def _build_store(self, segment) -> InvertedIndex:
        texts = [segment.scalar(c)[: segment.n_rows] for c in self.columns]
        store = InvertedIndex.build(
            texts, segment.capacity, analyzer=self.analyzer
        )
        GLOBAL_COUNTERS.bump("FTSIndexBuilds")
        return store

    def on_new_segment(self, segment, scheduler=None) -> None:
        """Register (and build) the fts store for a segment. With a
        scheduler the tokenize+CSR build runs in the background so a large
        text insert does not block the client (the reference builds the
        fts skip index inside the part-write pipeline, off the response
        path); queries arriving before completion build on demand."""
        if scheduler is None:
            store = self._build_store(segment)
            with self._lock:
                self._stores[segment.segment_id] = store
                self._pending.pop(segment.segment_id, None)
                self._stats_cache = None
                self._stats_gen += 1
            return
        sid = segment.segment_id
        with self._lock:
            self._pending[sid] = segment
            self._stores.pop(sid, None)  # a rebuild invalidates the old store
            self._stats_cache = None
            self._stats_gen += 1

        def job():
            with self._build_lock:
                with self._lock:
                    seg = self._pending.get(sid)
                if seg is None:
                    return  # built on demand (or dropped) meanwhile
                store = self._build_store(seg)
                with self._lock:
                    if self._pending.pop(sid, None) is not None:
                        self._stores[sid] = store
                        self._stats_cache = None
                        self._stats_gen += 1

        scheduler.submit(job)

    def on_segment_dropped(self, segment_id: int) -> None:
        with self._lock:
            self._stores.pop(segment_id, None)
            self._pending.pop(segment_id, None)
            self._stats_cache = None
            self._stats_gen += 1

    def on_deletes(self, segment) -> None:
        # deletes are applied at query time through the alive bitmap
        pass

    def store(self, segment_id: int) -> Optional[InvertedIndex]:
        with self._lock:
            hit = self._stores.get(segment_id)
            if hit is not None or segment_id not in self._pending:
                return hit
        # pending background build: build on demand (first query wins; the
        # background job then sees the pending entry gone and skips)
        with self._build_lock:
            with self._lock:
                hit = self._stores.get(segment_id)
                seg = self._pending.get(segment_id)
            if hit is not None or seg is None:
                return hit
            store = self._build_store(seg)
            with self._lock:
                self._pending.pop(segment_id, None)
                self._stores[segment_id] = store
                self._stats_cache = None
                self._stats_gen += 1
            return store

    def nlq_mask(self, segment, store, phrases, negs) -> np.ndarray:
        """bool[n_rows] rows satisfying the NLQ structure: every quoted
        phrase present (term-bitmap AND + adjacency verify) and no
        excluded term present (ffi_query_sentence_bitmap +
        negative-term semantics of the tantivy NLQ)."""
        m = np.ones(segment.n_rows, bool)
        for ph in phrases:
            toks = self.analyzer.tokenize(ph)
            if not toks:
                continue
            if len(toks) > 1:
                # device path: adjacency over the token stream (the stream
                # concatenates this index's columns — exactly the join the
                # host verifier builds below)
                bm = store.phrase_bitmap(toks)
                if bm is not None:
                    GLOBAL_COUNTERS.bump("FTSDevicePhraseChecks")
                    m &= bm
                    continue
            cand = store.term_bitmap(toks[0])
            for tk in toks[1:]:
                cand = cand & store.term_bitmap(tk)
            if len(toks) > 1:
                ver = np.zeros(segment.n_rows, bool)
                for i in np.nonzero(cand)[0]:
                    tt = self.analyzer.tokenize(
                        " ".join(str(segment.scalar(c)[i]) for c in self.columns)
                    )
                    ver[i] = any(
                        tt[j : j + len(toks)] == toks
                        for j in range(len(tt) - len(toks) + 1)
                    )
                cand = ver
            m &= cand
        for ng in negs:
            for tk in self.analyzer.tokenize(ng):
                m &= ~store.term_bitmap(tk)
        return m

    def merged_stats(self, segment_ids) -> BM25Stats:
        key = tuple(segment_ids)
        with self._lock:
            cached = self._stats_cache
            pending = bool(self._pending)
            gen = self._stats_gen
        # the term-df dict merge is ~1 ms per call at real vocabulary
        # sizes; cache per segment set (stores are immutable once built)
        if not pending and cached is not None and cached[0] == key:
            return cached[1]
        parts = []
        for s in segment_ids:
            st = self.store(s)  # forces any pending background build
            if st is not None:
                parts.append(st.stats)
        out = BM25Stats.merge(parts) if parts else BM25Stats(0, 0, {})
        with self._lock:
            # only install if no invalidation raced this computation —
            # otherwise stale idf/avg_len would serve until the next one
            if not pending and self._stats_gen == gen and not self._pending:
                self._stats_cache = (key, out)
        return out

    @property
    def memory_bytes(self) -> int:
        with self._lock:
            return sum(s.memory_bytes for s in self._stores.values())


class _FtsFilterBase(Expr):
    """Base for string-function predicates accelerated by an fts index
    (MergeTreeConditionTantivy atoms, MergeTreeIndexTantivy.h:141-180).

    Unlike the reference's skip index — where the bitmap only PRUNES
    granules and the predicate re-runs over read rows — our bitmap IS the
    result, so acceleration is candidate-generation + EXACT verification:
    term bitmaps cut the row set, the predicate verifies only candidates."""

    def __init__(self, table, column: str):
        self._table = table
        self.column = column

    def _tdef(self):
        for d in self._table._text_indexes.values():
            if self.column in d.columns:
                return d
        return None

    def _tokens(self) -> List[List[str]]:
        """DNF of token groups: row is a candidate when ALL tokens of ANY
        group appear in it. [] = no index cut possible (scan everything)."""
        raise NotImplementedError

    def _verify(self, text: str) -> bool:
        raise NotImplementedError

    def _needs_verify(self) -> bool:
        return True

    def evaluate(self, segment) -> np.ndarray:
        tdef = self._tdef()
        groups = self._tokens()
        col = None
        if tdef is not None and groups:
            store = tdef.store(segment.segment_id)
            if store is not None:
                cand = np.zeros(segment.n_rows, bool)
                for grp in groups:
                    if not grp:
                        continue
                    g = store.term_bitmap(grp[0])
                    for tk in grp[1:]:
                        g &= store.term_bitmap(tk)
                    cand |= g
                GLOBAL_COUNTERS.bump("FTSAcceleratedFilters")
                if not self._needs_verify():
                    return cand
                out = np.zeros(segment.n_rows, bool)
                idx = np.nonzero(cand)[0]
                if len(idx):
                    col = segment.scalar(self.column)
                    out[idx] = [self._verify(str(col[i])) for i in idx]
                return out
        # fallback: verify every row
        col = segment.scalar(self.column)[: segment.n_rows]
        return np.fromiter(
            (self._verify(str(v)) for v in col), dtype=bool, count=segment.n_rows
        )

    def columns(self):
        return {self.column}


class _TokenFilter(_FtsFilterBase):
    """hasToken(col, 'tok') — the ffi_query_term[s]_bitmap role."""

    def __init__(self, table, column: str, token: str):
        super().__init__(table, column)
        self.token = token
        an = self._tdef().analyzer if self._tdef() else Analyzer()
        self._toks = an.tokenize(token)

    def _tokens(self):
        return [self._toks] if self._toks else []

    def _needs_verify(self) -> bool:
        return False  # token containment IS the predicate

    def _verify(self, text: str) -> bool:
        an = Analyzer()
        return set(self._toks) <= set(an.tokenize(text))

    def evaluate(self, segment):
        if not self._toks:
            return np.zeros(segment.n_rows, bool)
        return super().evaluate(segment)

    def __repr__(self):
        return f"hasToken({self.column}, {self.token!r})"


class _LikeFilter(_FtsFilterBase):
    """col LIKE '%pattern%' accelerated by token bitmaps: the pattern's
    complete inner tokens must all appear in a matching row, so their
    bitmap intersection is a safe candidate set; a real LIKE match then
    verifies candidates (enable_fts_index_for_string_functions role)."""

    def __init__(self, table, column: str, pattern: str, negate: bool = False):
        super().__init__(table, column)
        self.pattern = pattern
        self.negate = negate
        import re as _re

        rx = _re.escape(pattern).replace("%", ".*").replace("_", ".")
        self._rx = _re.compile(f"^{rx}$", _re.DOTALL)
        an = self._tdef().analyzer if self._tdef() else Analyzer()
        # complete tokens: pieces between wildcards, excluding the edge
        # fragments that may be partial words (conservative-exact: only
        # tokens guaranteed whole, i.e. bounded by % on both sides after
        # stripping non-token chars, qualify for the bitmap cut)
        self._toks = []
        inner = [p for p in pattern.split("%")[1:-1] if p and "_" not in p]
        for piece in inner:
            # a piece may still START/END mid-word; only keep tokens with
            # non-word boundaries inside the piece
            toks = an.tokenize(piece)
            if len(toks) >= 3:
                self._toks.extend(toks[1:-1])

    def _tokens(self):
        # negated LIKE cannot use candidate cuts (complement semantics)
        return [self._toks] if self._toks and not self.negate else []

    def _verify(self, text: str) -> bool:
        hit = self._rx.match(text) is not None
        return (not hit) if self.negate else hit

    def __repr__(self):
        kw = "NOT LIKE" if self.negate else "LIKE"
        return f"fts:{self.column} {kw} {self.pattern!r}"


class _MultiSearchAnyFilter(_FtsFilterBase):
    """multiSearchAny(col, needles): substring-any, candidates from the
    union of each needle's inner-token bitmaps, substring verify."""

    def __init__(self, table, column: str, needles: List[str]):
        super().__init__(table, column)
        self.needles = [str(n) for n in needles]
        an = self._tdef().analyzer if self._tdef() else Analyzer()
        self._groups = []
        self._cuttable = True
        for n in self.needles:
            toks = an.tokenize(n)
            # safe only when the needle's inner tokens are whole words;
            # edge tokens may be word fragments -> drop them, require >=1
            inner = toks[1:-1] if len(toks) >= 3 else []
            if inner:
                self._groups.append(inner)
            else:
                self._cuttable = False  # some needle has no safe cut

    def _tokens(self):
        return self._groups if self._cuttable else []

    def _verify(self, text: str) -> bool:
        return any(n in text for n in self.needles)

    def __repr__(self):
        return f"multiSearchAny({self.column}, {self.needles!r})"


class _PhraseFilter(_FtsFilterBase):
    """Sentence/phrase predicate (ffi_query_sentence_bitmap role):
    candidates = AND of the phrase's term bitmaps, then an adjacency
    verify on the tokenized candidate rows (two-pass — postings store no
    positions; candidates are few)."""

    def __init__(self, table, column: str, phrase: str):
        super().__init__(table, column)
        self.phrase = phrase
        self._an = self._tdef().analyzer if self._tdef() else Analyzer()
        self._toks = self._an.tokenize(phrase)

    def _tokens(self):
        return [self._toks] if self._toks else []

    def _verify(self, text: str) -> bool:
        toks = self._an.tokenize(text)
        n, m = len(toks), len(self._toks)
        if m == 0:
            return True
        return any(toks[i : i + m] == self._toks for i in range(n - m + 1))

    def evaluate(self, segment):
        if not self._toks:
            return np.ones(segment.n_rows, bool)
        tdef = self._tdef()
        # device path: adjacency over the store's token stream — valid
        # when the index covers exactly this column (a multi-column store
        # concatenates columns into one stream)
        if tdef is not None and list(tdef.columns) == [self.column]:
            store = tdef.store(segment.segment_id)
            if store is not None:
                bm = store.phrase_bitmap(self._toks)
                if bm is not None:
                    GLOBAL_COUNTERS.bump("FTSAcceleratedFilters")
                    GLOBAL_COUNTERS.bump("FTSDevicePhraseChecks")
                    return bm
        return super().evaluate(segment)

    def __repr__(self):
        return f"hasPhrase({self.column}, {self.phrase!r})"


class _RegexTokenFilter(_FtsFilterBase):
    """Regex term bitmap (ffi_regex_term_bitmap role): rows containing at
    least one vocabulary term matching the regex."""

    def __init__(self, table, column: str, pattern: str):
        super().__init__(table, column)
        import re as _re

        self.pattern = pattern
        self._rx = _re.compile(pattern)

    def evaluate(self, segment) -> np.ndarray:
        tdef = self._tdef()
        if tdef is not None:
            store = tdef.store(segment.segment_id)
            if store is not None:
                out = np.zeros(segment.n_rows, bool)
                for term in store.vocab:
                    if self._rx.fullmatch(term):
                        out |= store.term_bitmap(term)
                GLOBAL_COUNTERS.bump("FTSAcceleratedFilters")
                return out
        an = Analyzer()
        col = segment.scalar(self.column)[: segment.n_rows]
        return np.fromiter(
            (
                any(self._rx.fullmatch(tk) for tk in an.tokenize(str(v)))
                for v in col
            ),
            dtype=bool,
            count=segment.n_rows,
        )

    def __repr__(self):
        return f"hasTokenMatching({self.column}, {self.pattern!r})"


def fts_token_filter(table, column: str, token: str) -> Expr:
    return _TokenFilter(table, column, token)


def fts_like_filter(table, column: str, pattern: str, negate: bool = False) -> Expr:
    return _LikeFilter(table, column, pattern, negate)


def fts_multi_search_any(table, column: str, needles: List[str]) -> Expr:
    return _MultiSearchAnyFilter(table, column, needles)


def fts_phrase_filter(table, column: str, phrase: str) -> Expr:
    return _PhraseFilter(table, column, phrase)


def fts_regex_filter(table, column: str, pattern: str) -> Expr:
    return _RegexTokenFilter(table, column, pattern)


def parse_nlq(query: str):
    """Natural-language query structure (the tantivy NLQ subset the
    reference exposes via enable_nlq, VSDescription.h:80-88): quoted
    phrases must match adjacently, '-term' excludes, the rest are
    ordinary scored terms. Returns (bm25_text, phrases, excluded)."""
    import re as _re

    phrases = _re.findall(r'"([^"]*)"', query)
    rest = _re.sub(r'"[^"]*"', " ", query)
    negs = _re.findall(r"(?:^|\s)-([\w]+)", rest)
    rest = _re.sub(r"(?:^|\s)-[\w]+", " ", rest)
    bm25_text = (rest + " " + " ".join(phrases)).strip()
    return bm25_text, phrases, negs


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
        query,
        k: Optional[int],
        *,
        filter: Optional[Expr] = None,
        operator: str = "OR",
        stats_override: Optional[BM25Stats] = None,
        enable_nlq: bool = False,
        settings=None,
    ) -> SearchResult:
        """textsearch() analogue: BM25 top-k, scores descending.

        `query` may be one string or a list of strings (batched: one device
        program per segment scores ALL queries — the multi-query serving
        path). stats_override: cluster-wide statistics injected by a
        distributed initiator (the _fts_statistic_info scalar analogue) —
        replaces the local table stats so scores are comparable across
        shards. The result is device-lazy like vector search."""
        t = self.table
        st = settings or t.settings
        queries = [query] if isinstance(query, str) else list(query)
        nq = len(queries)
        if nq == 0:
            raise QueryShapeError("query batch is empty")
        k = int(k if k is not None else st.query.default_topk)
        if k <= 0:
            raise QueryShapeError("k must be positive")
        if k > st.query.max_search_result_window:
            raise QueryShapeError(
                f"top-k window {k} exceeds max_search_result_window="
                f"{st.query.max_search_result_window}"
            )
        tdef = self._resolve(column_or_index)
        GLOBAL_COUNTERS.bump("TextSearchQueries", nq)
        segments = t.live_segments()
        seg_ids = [s.segment_id for s in segments]
        stats = (
            stats_override
            if stats_override is not None
            else tdef.merged_stats(seg_ids)
        )

        parsed = [parse_nlq(q) for q in queries] if enable_nlq else None
        need_nlq = parsed is not None and any(p or n for _, p, n in parsed)
        bm25_queries = [p[0] for p in parsed] if parsed is not None else queries

        vals_t: List = []
        rows_t: List = []
        tags_t: List = []
        tags: List[int] = []
        for seg in segments:
            store = tdef.store(seg.segment_id)
            if store is None:
                continue
            mask = segment_mask(seg, filter)
            if need_nlq:
                import jax.numpy as jnp

                from .filters import as_mask_array

                base = as_mask_array(mask)
                extra = np.zeros((nq, seg.capacity), bool)
                for qi, (_, phrases, negs) in enumerate(parsed):
                    extra[qi, : seg.n_rows] = tdef.nlq_mask(
                        seg, store, phrases, negs
                    )
                mask = jnp.asarray(extra)
                if base is not None:
                    mask = jnp.logical_and(mask, base[None, :])
            vals, rows, seg_tags, _terms = store.bm25_topk_batch(
                bm25_queries, k, stats=stats, operator=operator, mask=mask
            )
            vals_t.append(vals)
            rows_t.append(rows)
            tags_t.append(seg_tags)
            tags.append(seg.segment_id)
        if not vals_t:
            return SearchResult.empty(Metric.IP, nq, k)
        if len(vals_t) == 1:
            # tag column already produced inside the scoring program
            mv, mr, mt = vals_t[0], rows_t[0], tags_t[0]
        else:
            from .executor import merge_tagged_topk

            mv, mt, mr = merge_tagged_topk(tuple(vals_t), tuple(rows_t), k)
        # BM25 score is bigger-better: expose via the IP (similarity) convention
        return SearchResult(
            Metric.IP,
            device=(mv, mt, mr),
            seg_ids=np.asarray(tags, dtype=np.int64),
            nq=nq,
            k=k,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "fusion_type", "fusion_k", "fusion_weight", "vec_asc", "nq"
    ),
)
def _fuse_device(
    vvals, vtags, vrows, vtag_map,
    tvals, ttags, trows, ttag_map,
    k, fusion_type, fusion_k, fusion_weight, vec_asc, nq,
):
    """Device hybrid fusion: remap each leg's segment tags into a UNIFIED
    tag space, fuse (RRF/RSF) over (tag, row) pairs. Query-padding rows
    are sliced off HERE (an eager [:nq] per leg array costs a launch)."""
    from .fusion import rrf_fuse_t, rsf_fuse_t

    vvals, vtags, vrows = vvals[:nq], vtags[:nq], vrows[:nq]
    tvals, ttags, trows = tvals[:nq], ttags[:nq], trows[:nq]

    def remap(tags, rows, tag_map):
        uni = jnp.where(tags >= 0, jnp.take(tag_map, jnp.maximum(tags, 0)), -1)
        ok = jnp.logical_and(uni >= 0, rows >= 0)
        return jnp.where(ok, uni, -1), jnp.where(ok, rows, -1)

    vt, vr = remap(vtags, vrows, vtag_map)
    tt, tr = remap(ttags, trows, ttag_map)
    if fusion_type == "rrf":
        return rrf_fuse_t(vt, vr, tt, tr, k, fusion_k=fusion_k)
    return rsf_fuse_t(
        vt, vr, vvals, tt, tr, tvals, k,
        fusion_weight=fusion_weight, vec_ascending_better=vec_asc,
    )


class HybridSearchExecutor:
    def __init__(self, table):
        self.table = table

    def run(
        self,
        vector_column: str,
        text_column_or_index: str,
        vector_query,
        text_query,
        k: Optional[int],
        *,
        fusion_type: str = "rsf",
        fusion_weight: Optional[float] = None,
        fusion_k: Optional[int] = None,
        filter: Optional[Expr] = None,
        operator: str = "OR",
        params: Optional[Dict[str, Any]] = None,
        settings=None,
    ) -> SearchResult:
        """hybridsearch() analogue: both legs fetch k×multiple_base
        candidates, fused ON DEVICE (RRF: Σ1/(k+rank); RSF: direction-aware
        min-max, HybridSearchUtils.cpp:164,212-313), scores descending.

        Batched: vector_query may be [Q, D] with text_query a matching list
        of Q strings (or one string shared by all). The whole hybrid query
        is device-lazy — no host sync until results are read."""
        t = self.table
        st = settings or t.settings
        k = int(k if k is not None else st.query.default_topk)
        n_cand = min(
            k * st.query.hybrid_search_top_k_multiple_base,
            st.query.max_search_result_window,
        )

        vres = t.search(vector_column, vector_query, n_cand, filter=filter,
                        params=params, settings=st)
        nq = vres.nq
        GLOBAL_COUNTERS.bump("HybridSearchQueries", nq)
        tq = [text_query] * nq if isinstance(text_query, str) else list(text_query)
        if len(tq) != nq:
            raise QueryShapeError(
                f"text_query batch ({len(tq)}) must match vector batch ({nq})"
            )
        tres = TextSearchExecutor(t).run(
            text_column_or_index, tq, n_cand, filter=filter, operator=operator,
            settings=st,
        )

        ftype = fusion_type.lower()
        if ftype not in ("rrf", "rsf"):
            raise QueryShapeError(f"fusion_type must be rrf or rsf, got {fusion_type!r}")
        # unified segment-id table for both legs' tag spaces
        v_ids = vres._seg_ids if vres._seg_ids is not None else np.zeros(0, np.int64)
        t_ids = tres._seg_ids if tres._seg_ids is not None else np.zeros(0, np.int64)
        uni = np.unique(np.concatenate([v_ids, t_ids]))
        if len(uni) == 0:
            uni = np.asarray([-1], np.int64)  # both legs empty: sentinel
        vmap_tags = np.searchsorted(uni, v_ids).astype(np.int32)
        tmap_tags = np.searchsorted(uni, t_ids).astype(np.int32)
        if len(vmap_tags) == 0:
            vmap_tags = np.asarray([-1], np.int32)
        if len(tmap_tags) == 0:
            tmap_tags = np.asarray([-1], np.int32)

        def leg(res):
            if res._device is not None:
                # possibly query-padded ([nq_pad, k]) — sliced in the jit
                return res._device
            # host result here means SearchResult.empty: all slots invalid
            return (
                jnp.full((nq, res.k), -np.inf, jnp.float32),
                jnp.full((nq, res.k), -1, jnp.int32),
                jnp.full((nq, res.k), -1, jnp.int32),
            )

        vvals, vtags, vrows = leg(vres)
        tvals, ttags, trows = leg(tres)
        from ..metrics import score_ascending_better

        fv, ftag, frow = _fuse_device(
            vvals, vtags, vrows, jnp.asarray(vmap_tags),
            tvals, ttags, trows, jnp.asarray(tmap_tags),
            k,
            ftype,
            int(fusion_k if fusion_k is not None else st.query.hybrid_search_fusion_k),
            float(
                st.query.hybrid_search_fusion_weight
                if fusion_weight is None
                else fusion_weight
            ),
            score_ascending_better(vres.metric),
            nq,
        )
        return SearchResult(
            Metric.IP, device=(fv, ftag, frow), seg_ids=uni, nq=nq, k=k
        )
