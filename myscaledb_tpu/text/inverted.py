"""Per-segment inverted index with device-resident postings + BM25 scoring.

Replaces the tantivy index + TantivyIndexStore (SURVEY.md §2.4). Layout:

  host:   term -> term_id dict; term_offsets int64[V+1] (CSR row pointers);
          per-term doc freq (df)
  device: postings_rows int32[nnz]  (row ids, CSR order by term)
          postings_tf   f32[nnz]    (term frequency in that row)
          doc_len       f32[capacity]

Scoring is Okapi BM25 with *externally supplied* corpus statistics
(total_docs / total_tokens / df summed over segments — exactly the
TANTIVY::Statistics contract of bm25Search[WithFilter],
TantivyIndexStore.h:168-183, so scores are consistent across segments and
shards). The per-query device program slices each query term's posting
range (padded to a shared static budget), computes BM25 contributions, and
scatter-adds into a dense per-row score vector; AND semantics count
distinct matched terms. The pre-filter bitmap masks scores before top-k
(pre-filter semantics, as everywhere in this engine).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import NEG_INF, topk_scores
from .analyzer import Analyzer

BM25_K1 = 1.2
BM25_B = 0.75


@dataclasses.dataclass
class BM25Stats:
    """Corpus statistics for BM25 (BM25InfoInDataParts analogue): summed
    across segments before scoring so ranking is table-consistent."""

    total_docs: int
    total_tokens: int
    doc_freq: Dict[str, int]

    @classmethod
    def merge(cls, parts: Sequence["BM25Stats"]) -> "BM25Stats":
        df: Dict[str, int] = {}
        docs = tokens = 0
        for p in parts:
            docs += p.total_docs
            tokens += p.total_tokens
            for t, c in p.doc_freq.items():
                df[t] = df.get(t, 0) + c
        return cls(docs, tokens, df)

    def idf(self, term: str) -> float:
        n = self.doc_freq.get(term, 0)
        # Lucene/tantivy BM25 idf: ln(1 + (N - n + 0.5)/(n + 0.5))
        return float(np.log(1.0 + (self.total_docs - n + 0.5) / (n + 0.5)))

    @property
    def avg_doc_len(self) -> float:
        return self.total_tokens / max(self.total_docs, 1)


def _round_pow2(x: int, lo: int = 128, hi: int = 1 << 20) -> int:
    p = lo
    while p < min(x, hi):
        p <<= 1
    return p


# Posting-slice size per scan step. Terms with more postings are split
# into ceil(df/BUDGET_CAP) chunks host-side (no silent truncation); the
# fixed cap keeps the jit signature count O(1) instead of O(max_df).
BUDGET_CAP = 8192


@functools.partial(
    jax.jit, static_argnames=("budget", "capacity", "k", "approx", "need_counts")
)
def _bm25_score_topk_batch(
    postings_rows: jax.Array,  # int32[nnz_pad]
    postings_tf: jax.Array,  # f32[nnz_pad]
    doc_len: jax.Array,  # f32[capacity]
    qints: jax.Array,  # int32[Q, 2T+1]: starts | lengths | n_required
    idfs: jax.Array,  # f32[Q, T] idf of the chunk's term
    avg_len: jax.Array,  # f32 scalar
    mask: Optional[jax.Array],  # bool[capacity] or None
    *,
    budget: int,
    capacity: int,
    k: int,
    approx: bool,
    need_counts: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Batched BM25: scatter-accumulate every query's term chunks into
    dense per-row scores, then per-query top-k. A term's chunks partition
    its posting rows, so the per-row matched-term count used for AND
    semantics is unaffected by chunking. need_counts=False (OR queries)
    skips the matched-term-count scatter entirely — a BM25 contribution
    is strictly positive (Lucene idf > 0, tf > 0), so score > 0 IS the
    matched test; this halves the scatter updates, the kernel's cost.
    The three int operands ride in ONE packed array (one host->device
    transfer per call instead of three)."""
    nq, nt = idfs.shape
    starts = qints[:, :nt]
    lengths = qints[:, nt : 2 * nt]
    n_required = qints[:, 2 * nt]
    scores = jnp.zeros((nq, capacity), jnp.float32)
    nmatch = jnp.zeros((nq, capacity), jnp.int32) if need_counts else None
    qidx = jnp.arange(nq, dtype=jnp.int32)[:, None]
    offs = jnp.arange(budget, dtype=jnp.int32)

    def body(t, carry):
        scores, nmatch = carry
        st = starts[:, t]  # [Q]
        ln = lengths[:, t]
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice(postings_rows, (s,), (budget,))
        )(st)
        tf = jax.vmap(
            lambda s: jax.lax.dynamic_slice(postings_tf, (s,), (budget,))
        )(st)
        valid = offs[None, :] < ln[:, None]
        rows = jnp.where(valid, rows, capacity)  # OOB -> dropped
        dl = jnp.take(doc_len, jnp.minimum(rows, capacity - 1))
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avg_len)
        contrib = idfs[:, t][:, None] * tf * (BM25_K1 + 1.0) / jnp.maximum(denom, 1e-9)
        contrib = jnp.where(valid, contrib, 0.0)
        scores = scores.at[qidx, rows].add(contrib, mode="drop")
        if nmatch is not None:
            nmatch = nmatch.at[qidx, rows].add(valid.astype(jnp.int32), mode="drop")
        return scores, nmatch

    scores, nmatch = jax.lax.fori_loop(0, nt, body, (scores, nmatch))
    if need_counts:
        hit = nmatch >= n_required[:, None]
    else:
        # OR semantics with >=1 term present; empty queries are encoded by
        # the caller as n_required > nt and must match nothing
        hit = jnp.logical_and(scores > 0.0, n_required[:, None] <= nt)
    if mask is not None:
        # mask may be shared bool[capacity] or per-query bool[Q, capacity]
        hit = jnp.logical_and(hit, mask if mask.ndim == 2 else mask[None, :])
    scores = jnp.where(hit, scores, NEG_INF)
    vals, rows = topk_scores(scores, k, approx=approx)
    rows = jnp.where(jnp.isfinite(vals), rows, -1)
    # single-segment tag column (0 = this segment, -1 = empty slot): built
    # HERE so the caller never needs a separate eager device op for it
    tags = jnp.where(rows >= 0, 0, -1)
    return vals, rows, tags


def _pad_pow2(x: int, lo: int = 4) -> int:
    p = lo
    while p < x:
        p <<= 1
    return p


# Sparse-path cap: total candidate postings per query (nt * budget) at or
# below this use the sort-based kernel; above it, the dense scatter kernel.
SPARSE_CAP = 16384
# below this capacity the dense buffer is small enough that the scatter
# kernel wins (no sort, fewer passes)
SPARSE_MIN_CAPACITY = 256 * 1024


@functools.partial(
    jax.jit, static_argnames=("budget", "capacity", "k")
)
def _bm25_sparse_topk_batch(
    postings_rows: jax.Array,  # int32[nnz_pad]
    postings_tf: jax.Array,  # f32[nnz_pad]
    doc_len: jax.Array,  # f32[capacity]
    qints: jax.Array,  # int32[Q, 2T+1]: starts | lengths | n_required
    idfs: jax.Array,  # f32[Q, T]
    avg_len: jax.Array,  # f32 scalar
    mask: Optional[jax.Array],  # bool[capacity] | bool[Q, capacity] | None
    *,
    budget: int,
    capacity: int,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """CANDIDATE-SPARSE BM25: instead of scatter-adding into a dense
    [Q, capacity] score buffer (whose zero-init + top-k scan scale with
    the segment size), gather every query's candidate postings
    ([Q, T*budget] rows + contributions), sort by row id, segment-sum
    runs of equal rows, and top-k the run totals. Work scales with the
    query's own posting mass, not the corpus. A term's chunks partition
    its postings, so a run's LENGTH equals its distinct matched terms —
    which is exactly the AND-semantics counter."""
    nq, nt = idfs.shape
    starts = qints[:, :nt]
    lengths = qints[:, nt : 2 * nt]
    n_required = qints[:, 2 * nt]
    offs = jnp.arange(budget, dtype=jnp.int32)

    def gather_q(st_row, ln_row, idf_row):
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice(postings_rows, (s,), (budget,))
        )(st_row)  # [T, B]
        tf = jax.vmap(
            lambda s: jax.lax.dynamic_slice(postings_tf, (s,), (budget,))
        )(st_row)
        valid = offs[None, :] < ln_row[:, None]
        rows = jnp.where(valid, rows, capacity)  # pad -> sentinel (sorts last)
        dl = jnp.take(doc_len, jnp.minimum(rows, capacity - 1))
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avg_len)
        contrib = idf_row[:, None] * tf * (BM25_K1 + 1.0) / jnp.maximum(denom, 1e-9)
        contrib = jnp.where(valid, contrib, 0.0)
        return rows.reshape(-1), contrib.reshape(-1)

    rows, contrib = jax.vmap(gather_q)(starts, lengths, idfs)  # [Q, T*B]
    order = jnp.argsort(rows, axis=-1)
    r_s = jnp.take_along_axis(rows, order, axis=-1)
    c_s = jnp.take_along_axis(contrib, order, axis=-1)
    # run totals via prefix sums: score(run) = csum[end] - csum[start-1]
    csum = jnp.cumsum(c_s, axis=-1)
    is_end = jnp.concatenate(
        [r_s[:, 1:] != r_s[:, :-1], jnp.ones((nq, 1), bool)], axis=-1
    )
    is_start = jnp.concatenate(
        [jnp.ones((nq, 1), bool), r_s[:, 1:] != r_s[:, :-1]], axis=-1
    )
    pos = jnp.arange(r_s.shape[-1], dtype=jnp.int32)
    # for every position, the index of ITS run's start (max start pos <= i)
    start_pos = jax.lax.cummax(
        jnp.where(is_start, pos[None, :], -1), axis=1
    )
    csum_before = jnp.where(
        start_pos > 0,
        jnp.take_along_axis(csum, jnp.maximum(start_pos - 1, 0), axis=-1),
        0.0,
    )
    run_score = csum - csum_before  # valid at run ends
    run_len = pos[None, :] - start_pos + 1
    hit = jnp.logical_and(is_end, r_s < capacity)
    hit = jnp.logical_and(hit, run_len >= n_required[:, None])
    if mask is not None:
        mrow = jnp.minimum(r_s, capacity - 1)
        if mask.ndim == 2:
            mv = jnp.take_along_axis(mask, mrow, axis=-1)
        else:
            mv = jnp.take(mask, mrow)
        hit = jnp.logical_and(hit, mv)
    scores = jnp.where(hit, run_score, NEG_INF)
    kk = min(k, scores.shape[-1])
    vals, pos2 = jax.lax.top_k(scores, kk)
    out_rows = jnp.take_along_axis(r_s, pos2, axis=-1)
    out_rows = jnp.where(jnp.isfinite(vals), out_rows, -1)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        out_rows = jnp.pad(out_rows, pad, constant_values=-1)
    tags = jnp.where(out_rows >= 0, 0, -1)
    return vals, out_rows, tags


@functools.partial(jax.jit, static_argnames=("m",))
def _phrase_doc_counts(
    stream: jax.Array,      # int32[Lpad] (padding = -1)
    tids: jax.Array,        # int32[m] phrase term ids (-1 = absent term)
    doc_bounds: jax.Array,  # int32[capacity + 1] token offsets per doc
    *,
    m: int,
) -> jax.Array:
    """Streaming phrase match over the document-ordered token stream:
    position p starts the phrase iff stream[p+i] == tids[i] for all i and
    no document boundary falls inside (p, p+m-1] — boundary containment
    follows from doc_bounds, so no per-token doc-id array is needed.
    Returns int32[capacity] phrase-occurrence counts per row. All ops are
    aligned slices + one prefix sum + one sorted gather: the kernel
    streams at memory bandwidth, independent of how common the terms are
    (the reference's tantivy phrase query walks per-doc position lists —
    a host-side pointer chase this replaces)."""
    lp = stream.shape[0]
    lw = lp - m + 1  # phrase-start window
    match = jnp.ones((lw,), bool)
    for i in range(m):
        match = jnp.logical_and(
            match, jax.lax.slice_in_dim(stream, i, i + lw) == tids[i]
        )
    # M0[p] = number of phrase starts strictly before token p
    csum = jnp.cumsum(match.astype(jnp.int32))
    m0 = jnp.concatenate([jnp.zeros(1, jnp.int32), csum])  # [lw + 1]
    # A phrase starting in doc r lies at p in [bounds[r], bounds[r+1] - m + 1);
    # counting starts in [bounds[r], min(bounds[r+1], lw)) both confines the
    # phrase to the doc (starts past len-m+1 can't match: padding is -1 and
    # the next doc's tokens would have to match the tail, which the
    # boundary clamp below excludes) ... clamp handles the cross-doc case:
    lo = jnp.minimum(doc_bounds[:-1], lw)
    hi = jnp.maximum(jnp.minimum(doc_bounds[1:] - (m - 1), lw), lo)
    return jnp.take(m0, hi) - jnp.take(m0, lo)


class InvertedIndex:
    """Built per (segment, text columns) — the TantivyIndexStore analogue.
    Multi-column: tokens of all indexed columns are concatenated per row
    (the reference indexes multi-column docs into one tantivy index,
    indexMultiColumnDoc)."""

    def __init__(
        self,
        capacity: int,
        n_rows: int,
        vocab: Dict[str, int],
        term_offsets: np.ndarray,
        postings_rows: jax.Array,
        postings_tf: jax.Array,
        doc_len: jax.Array,
        stats: BM25Stats,
        analyzer: Analyzer,
        token_stream: Optional[np.ndarray] = None,
    ):
        self.capacity = capacity
        self.n_rows = n_rows
        self.vocab = vocab
        self.term_offsets = term_offsets  # host int64[V+1]
        self.postings_rows = postings_rows
        self.postings_tf = postings_tf
        self.doc_len = doc_len
        self.stats = stats
        self.analyzer = analyzer
        # Token-id stream in document order (filtered tokens only) — the
        # device-side phrase representation: adjacency in the stream IS
        # adjacency after analysis, exactly the host verifier's semantics.
        # None on indexes persisted before this field existed (phrase
        # verification then falls back to the host path).
        self._stream_host = token_stream  # int32[total_tokens] or None
        self._stream_dev = None  # (padded stream, doc_bounds) lazy upload

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        texts_per_column: List[np.ndarray],
        capacity: int,
        *,
        analyzer: Optional[Analyzer] = None,
        use_native: bool = True,
    ) -> "InvertedIndex":
        analyzer = analyzer or Analyzer()
        n_rows = len(texts_per_column[0])
        if use_native:
            native_out = cls._build_native(texts_per_column, capacity, analyzer)
            if native_out is not None:
                return native_out
        vocab: Dict[str, int] = {}
        # first pass: tokenize, count tf per (term, row)
        doc_len = np.zeros(capacity, np.float32)
        tf_maps: List[Dict[int, int]] = []
        stream: List[int] = []
        total_tokens = 0
        for row in range(n_rows):
            tf: Dict[int, int] = {}
            for col in texts_per_column:
                for tok in analyzer.tokenize(str(col[row])):
                    tid = vocab.setdefault(tok, len(vocab))
                    tf[tid] = tf.get(tid, 0) + 1
                    stream.append(tid)
            ntok = sum(tf.values())
            doc_len[row] = ntok
            total_tokens += ntok
            tf_maps.append(tf)
        v = len(vocab)
        df = np.zeros(v, np.int64)
        for tf in tf_maps:
            for tid in tf:
                df[tid] += 1
        offsets = np.zeros(v + 1, np.int64)
        np.cumsum(df, out=offsets[1:])
        nnz = int(offsets[-1])
        # tail padding >= the largest possible slice budget, so a term
        # slice [start, start+budget) never clamps (clamping would shift
        # the window off the term's posting range)
        max_df = int(df.max()) if v else 1
        nnz_pad = nnz + _round_pow2(max(max_df, 128))
        prow = np.zeros(nnz_pad, np.int32)
        ptf = np.zeros(nnz_pad, np.float32)
        cursor = offsets[:-1].copy()
        for row, tf in enumerate(tf_maps):
            for tid, c in tf.items():
                p = cursor[tid]
                prow[p] = row
                ptf[p] = c
                cursor[tid] = p + 1
        doc_freq = {t: int(df[i]) for t, i in vocab.items()}
        stats = BM25Stats(n_rows, total_tokens, doc_freq)
        return cls(
            capacity,
            n_rows,
            vocab,
            offsets,
            jnp.asarray(prow),
            jnp.asarray(ptf),
            jnp.asarray(doc_len),
            stats,
            analyzer,
            token_stream=np.asarray(stream, np.int32),
        )

    @classmethod
    def _build_native(cls, texts_per_column, capacity: int, analyzer: Analyzer):
        """Native (C++) build path — identical output to the Python
        builder; returns None when the library is unavailable."""
        from . import native

        if not native.available():
            return None
        n_rows = len(texts_per_column[0])
        if len(texts_per_column) == 1:
            docs = [str(x) for x in texts_per_column[0]]
        else:
            # multi-column: concatenate with a separator (space is never a
            # token char, so tokenization is unchanged)
            docs = [
                " ".join(str(col[i]) for col in texts_per_column)
                for i in range(n_rows)
            ]
        out = native.build_csr(
            docs,
            lower_case=analyzer.lower_case,
            min_token_len=analyzer.min_token_len,
            max_token_len=analyzer.max_token_len,
            stop_words=analyzer.stop_words,
        )
        if out is None:
            return None
        vocab, offsets, rows, tf, doc_len, total_tokens, stream = out
        v = len(vocab)
        df_arr = (offsets[1:] - offsets[:-1]) if v else np.zeros(0, np.int64)
        max_df = int(df_arr.max()) if v else 1
        nnz = int(offsets[-1]) if v else 0
        nnz_pad = nnz + _round_pow2(max(max_df, 128))
        prow = np.zeros(nnz_pad, np.int32)
        ptf = np.zeros(nnz_pad, np.float32)
        prow[:nnz] = rows
        ptf[:nnz] = tf
        dl = np.zeros(capacity, np.float32)
        dl[:n_rows] = doc_len
        terms = sorted(vocab, key=vocab.get)
        doc_freq = {t: int(df_arr[i]) for i, t in enumerate(terms)}
        stats = BM25Stats(n_rows, total_tokens, doc_freq)
        return cls(
            capacity,
            n_rows,
            vocab,
            offsets,
            jnp.asarray(prow),
            jnp.asarray(ptf),
            jnp.asarray(dl),
            stats,
            analyzer,
            token_stream=np.asarray(stream, np.int32),
        )

    # ------------------------------------------------------------- query
    def term_range(self, term: str) -> Tuple[int, int]:
        tid = self.vocab.get(term)
        if tid is None:
            return 0, 0
        return int(self.term_offsets[tid]), int(
            self.term_offsets[tid + 1] - self.term_offsets[tid]
        )

    def _stream_arrays(self):
        """(padded device stream, device doc_bounds) for phrase kernels,
        uploaded once per store; None when the stream is unavailable
        (pre-stream persisted indexes)."""
        if self._stream_host is None:
            return None
        if self._stream_dev is None:
            st = self._stream_host
            # NOT _round_pow2: its 1<<20 cap is a posting-budget bound;
            # the stream (== total tokens) routinely exceeds it
            lp = 128
            while lp < len(st) + 1:
                lp <<= 1
            padded = np.full(lp, -1, np.int32)
            padded[: len(st)] = st
            dl = np.asarray(self.doc_len[: self.n_rows]).astype(np.int64)
            bounds = np.zeros(self.capacity + 1, np.int64)
            np.cumsum(dl, out=bounds[1 : self.n_rows + 1])
            bounds[self.n_rows + 1 :] = bounds[self.n_rows]
            self._stream_dev = (
                jnp.asarray(padded),
                jnp.asarray(bounds.astype(np.int32)),
            )
        return self._stream_dev

    def phrase_counts_device(self, tokens: Sequence[str]) -> Optional[jax.Array]:
        """int32[capacity] per-row occurrence counts of the analyzed
        phrase `tokens` (adjacent in the filtered stream), or None when
        the store predates token streams. Runs entirely on device."""
        got = self._stream_arrays()
        if got is None or not tokens:
            return None
        stream, bounds = got
        tids = np.asarray(
            [self.vocab.get(t, -1) for t in tokens], np.int32
        )
        if (tids < 0).any():  # absent term: phrase matches nothing
            return jnp.zeros(self.capacity, jnp.int32)
        return _phrase_doc_counts(stream, jnp.asarray(tids), bounds, m=len(tids))

    def phrase_bitmap(self, tokens: Sequence[str]) -> Optional[np.ndarray]:
        """bool[n_rows] rows containing the phrase (host view), or None
        when unavailable (caller falls back to host verification)."""
        counts = self.phrase_counts_device(tokens)
        if counts is None:
            return None
        return np.asarray(counts[: self.n_rows]) > 0

    def term_bitmap(self, term: str) -> np.ndarray:
        """bool[n_rows] rows containing the term — the ffi_query_term_bitmap
        analogue, used for hasToken-style predicate acceleration."""
        s, ln = self.term_range(term)
        rows = np.asarray(self.postings_rows[s : s + ln])
        out = np.zeros(self.n_rows, bool)
        out[rows[rows < self.n_rows]] = True
        return out

    @property
    def scan_budget(self) -> int:
        """Static posting-slice size for this store: pow2 of the largest
        term's df, capped at BUDGET_CAP (bigger terms scan in chunks)."""
        b = getattr(self, "_scan_budget", None)
        if b is None:
            max_df = 1
            if len(self.term_offsets) > 1:
                max_df = int(np.max(self.term_offsets[1:] - self.term_offsets[:-1]))
            b = min(BUDGET_CAP, _round_pow2(max(max_df, 128)))
            self._scan_budget = b
        return b

    def bm25_topk_batch(
        self,
        queries: Sequence[str],
        k: int,
        *,
        stats: Optional[BM25Stats] = None,
        operator: str = "OR",
        mask: Optional[jax.Array] = None,
        approx: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, List[List[str]]]:
        """Device BM25 top-k for a BATCH of query strings against this
        segment, using table-level `stats` (falls back to segment-local).
        One device program for the whole batch; terms whose posting lists
        exceed the scan budget are split into chunks (never truncated).
        Returns (vals, rows, tags, per-query terms) — tags is the
        program's single-segment tag column (0 valid / -1 empty)."""
        stats = stats or self.stats
        from ..search.filters import as_mask_array

        mask = as_mask_array(mask)
        require_all = operator.upper() == "AND"
        all_terms: List[List[str]] = []
        ranges: List[List[Tuple[int, int, float]]] = []
        maxlen = 1
        for query in queries:
            terms = self.analyzer.tokenize_query(query)
            seen: set = set()
            terms = [t for t in terms if not (t in seen or seen.add(t))]
            all_terms.append(terms)
            rs: List[Tuple[int, int, float]] = []
            for t in terms:
                s, ln = self.term_range(t)
                if ln == 0:
                    continue  # absent here; still counts toward n_required
                rs.append((s, ln, stats.idf(t)))
                maxlen = max(maxlen, ln)
            ranges.append(rs)
        # per-CALL budget: the scatter cost is #updates = nq*nt*budget, so
        # padding every chunk to the index-wide max df multiplies the work
        # of short-posting queries ~30x; pow2-bucketing the batch's own max
        # keeps the jit signature count O(log)
        budget = min(BUDGET_CAP, _round_pow2(maxlen, lo=128))
        chunk_lists = [
            [
                (s + off, min(budget, ln - off), idf)
                for (s, ln, idf) in rs
                for off in range(0, ln, budget)
            ]
            for rs in ranges
        ]
        nq = len(queries)
        nt = _pad_pow2(max((len(c) for c in chunk_lists), default=1))
        # starts | lengths | n_required packed into ONE int32 upload
        qints = np.zeros((nq, 2 * nt + 1), np.int32)
        idfs = np.zeros((nq, nt), np.float32)
        qints[:, 2 * nt] = 1
        for i, chunks in enumerate(chunk_lists):
            for j, (s, ln, idf) in enumerate(chunks):
                qints[i, j] = s
                qints[i, nt + j] = ln
                idfs[i, j] = idf
            if require_all:
                qints[i, 2 * nt] = max(len(all_terms[i]), 1)
            if not all_terms[i]:
                qints[i, 2 * nt] = nt + 1  # empty query matches nothing
        if nt * budget <= SPARSE_CAP and self.capacity >= SPARSE_MIN_CAPACITY:
            # candidate-sparse path: work scales with the batch's own
            # posting mass instead of the segment size — a clear win once
            # the dense [Q, capacity] buffer outgrows the posting mass
            vals, rows, tags = _bm25_sparse_topk_batch(
                self.postings_rows,
                self.postings_tf,
                self.doc_len,
                qints,
                idfs,
                jnp.float32(stats.avg_doc_len),
                mask,
                budget=budget,
                capacity=self.capacity,
                k=k,  # exact top-k: run totals are tiny, approx irrelevant
            )
        else:
            vals, rows, tags = _bm25_score_topk_batch(
                self.postings_rows,
                self.postings_tf,
                self.doc_len,
                qints,
                idfs,
                jnp.float32(stats.avg_doc_len),
                mask,
                budget=budget,
                capacity=self.capacity,
                k=k,
                approx=approx,
                need_counts=require_all and any(len(t) > 1 for t in all_terms),
            )
        return vals, rows, tags, all_terms

    def bm25_topk(
        self,
        query: str,
        k: int,
        *,
        stats: Optional[BM25Stats] = None,
        operator: str = "OR",
        mask: Optional[jax.Array] = None,
        approx: bool = False,
    ) -> Tuple[jax.Array, jax.Array, List[str]]:
        """Single-query convenience wrapper over bm25_topk_batch."""
        vals, rows, _tags, terms = self.bm25_topk_batch(
            [query], k, stats=stats, operator=operator, mask=mask, approx=approx
        )
        return vals, rows, terms[0]

    @property
    def memory_bytes(self) -> int:
        return (
            self.postings_rows.size * 4
            + self.postings_tf.size * 4
            + self.doc_len.size * 4
        )

    # ----------------------------------------------------------- persist
    def state_dict(self) -> Dict[str, Any]:
        terms = sorted(self.vocab, key=self.vocab.get)
        return {
            "meta": {
                "capacity": self.capacity,
                "n_rows": self.n_rows,
                "total_tokens": self.stats.total_tokens,
                "analyzer": self.analyzer.config(),
            },
            "arrays": {
                "term_offsets": self.term_offsets,
                "postings_rows": np.asarray(self.postings_rows),
                "postings_tf": np.asarray(self.postings_tf),
                "doc_len": np.asarray(self.doc_len),
                "terms": np.asarray(terms, dtype=str),
                **(
                    {"token_stream": np.asarray(self._stream_host)}
                    if self._stream_host is not None
                    else {}
                ),
            },
        }

    @classmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "InvertedIndex":
        m = state["meta"]
        a = state["arrays"]
        terms = [str(t) for t in a["terms"]]
        vocab = {t: i for i, t in enumerate(terms)}
        offsets = np.asarray(a["term_offsets"], np.int64)
        df = {t: int(offsets[i + 1] - offsets[i]) for t, i in vocab.items()}
        stats = BM25Stats(m["n_rows"], m["total_tokens"], df)
        cfg = dict(m["analyzer"])
        if cfg.get("stop_words"):
            cfg["stop_words"] = list(cfg["stop_words"])
        else:
            cfg.pop("stop_words", None)
        ts = a.get("token_stream")
        return cls(
            m["capacity"],
            m["n_rows"],
            vocab,
            offsets,
            jnp.asarray(a["postings_rows"]),
            jnp.asarray(a["postings_tf"]),
            jnp.asarray(a["doc_len"]),
            stats,
            Analyzer(cfg),
            token_stream=None if ts is None else np.asarray(ts, np.int32),
        )
