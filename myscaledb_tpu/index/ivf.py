"""IVF indexes: k-means coarse quantizer over a cluster-major window
layout, with raw (IVFFLAT), int8 (IVFSQ) and product-quantized (IVFPQ)
payloads, plus the two-stage MSTG-style index (quantized first pass +
exact re-rank).

TPU re-design of the reference's IVF*/MSTG family (search-index library,
SURVEY.md §2.3). The CPU layout (ragged posting lists, per-list pointer
chasing) becomes:

  * centroids f32[C, D] from balanced k-means (oversized clusters are
    recursively split — a static layout cannot tolerate ragged tails);
  * ONE cluster-major permutation of the payload, `perm_data[N', D']`,
    with per-cluster row offsets `cluster_start[C+1]`. Zero padding
    beyond rounding N to the 512-row window size;
  * search reads fixed 512-row WINDOWS: each query turns its top-nprobe
    clusters into a per-query window list (rounded out to window
    boundaries — boundary rows of neighboring clusters are merely extra
    true candidates), padded/truncated to a static budget W. A lax.scan
    gathers one window per query per step, decodes the codec inline,
    scores on the MXU, and folds into a running top-k. Work per query is
    EXACTLY the probed rows (±511), independent of cluster skew.

The pre-filter/delete bitmap is applied inside the scan by row-id lookup
(the DenseBitmap-into-search contract, VIWithDataPart.cpp:930). Cosine is
normalize-then-IP (as the reference: VIWithDataPart.h:349).

MSTG here = IVF over SQ8-compressed windows + exact re-rank of the top
candidates against the raw segment payload (two-stage semantics of §3.5:
search(first_stage_only) + computeTopDistanceSubset). With `disk_mode=1`
(or a host-tier table) the raw re-rank payload lives in HOST RAM and only
the SQ8 windows occupy HBM — the beyond-HBM corpus path of the
reference's disk-mode MSTG (Search::DiskIOManager, VICommon.h:132).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import IndexParameterError
from ..metrics import Metric
from ..ops import distance, kmeans, quantize
from ..ops._pallas import exact_precision, round_up
from ..ops.topk import NEG_INF, dedup_rows
from .base import IndexKind, ParamsKey, VectorIndex, check_cancel, register_index_pytree
from .registry import register

DEFAULT_NPROBE = 16
WINDOW = 512  # rows per scan window


def _default_pq_m(dim: int) -> int:
    """Largest power-of-2 subquantizer count <= 32 that divides dim
    (DDL may omit M; the reference accepts that and the build adapts)."""
    m = 32
    while m > 1 and dim % m:
        m //= 2
    return m

# one jitted mask builder for ALL filters: constants are traced leaves,
# so a new comparison value reuses the compiled program (a per-miss
# jax.jit(lambda ...) would retrace+recompile per constant)
_build_window_mask = jax.jit(lambda m: m.build())


def default_ncentroids(n_rows: int) -> int:
    """~4*sqrt(N), power-of-two-ish, clamped (FAISS-style heuristic)."""
    c = int(4 * math.sqrt(max(n_rows, 1)))
    c = 1 << max(4, int(round(math.log2(max(c, 16)))))
    return int(min(c, max(16, n_rows // 8), 65_536))


def _scan_rep(payload, n_rows: int, metric: Metric):
    """Rows in 'scan representation': raw for L2/IP, normalized for Cosine.
    Host-tier payloads stay numpy (chunked device work downstream)."""
    if getattr(payload, "is_host", False):
        data = payload.data[:n_rows].astype(np.float32)
        if metric == Metric.COSINE and payload.invnorm is not None:
            data = data * payload.invnorm[:n_rows, None]
        return data
    data = payload.data[:n_rows].astype(jnp.float32)
    if metric == Metric.COSINE and payload.invnorm is not None:
        data = data * payload.invnorm[:n_rows, None]
    return data


def balanced_kmeans(
    rep,
    rep_h: Optional[np.ndarray],
    n_rows: int,
    c: int,
    *,
    extra_frac: float = 0.5,
    seed: int = 0,
    max_train_rows: Optional[int] = None,
    cancel_cb=None,
):
    """K-means with size-proportional cluster splitting: after the main
    fit, `extra_frac*c` extra centroids are seeded onto the heaviest
    clusters (proportionally to their mass) and refined — bounding the
    size histogram's tail, which bounds per-probe scan work. The whole fit
    is ONE compiled program with a fixed [C', D] output shape
    (kmeans.kmeans_fit_balanced), so repeated builds share executables —
    the round-1 recursive-split version recompiled per round, which
    dominated IVF build time. Returns (centroids f32[C', D], assign) where
    assign stays ON DEVICE for device-resident payloads (int32[n]) and is
    numpy for host-tier payloads."""
    host = isinstance(rep, np.ndarray)
    n_extra = int(c * extra_frac) if c >= 4 else 0
    if host:
        sample = kmeans.training_sample_host(
            rep_h, n_rows, c, seed=seed, max_rows=max_train_rows
        )
    else:
        sample = kmeans.training_sample(
            rep, n_rows, c, seed=seed, max_rows=max_train_rows
        )
    check_cancel(cancel_cb)
    cents = kmeans.kmeans_fit_balanced(
        sample, n_clusters=c, n_extra=n_extra, n_iters=10, seed=seed
    )
    check_cancel(cancel_cb)
    if host:
        return cents, kmeans.assign_chunked_host(rep_h, cents)
    return cents, kmeans.assign_chunked(rep, cents)


def windows_for_probes(
    cluster_start: jax.Array,
    probe: jax.Array,
    n_windows: int,
    w_budget: int,
    limit=None,
) -> Tuple[jax.Array, jax.Array]:
    """Probed clusters -> per-query deduplicated window lists.

    probe int32[Q, P] -> (widx int32[Q, W], valid bool[Q, W]). A window can
    be listed by several adjacent probed clusters; Σ windows <= n_windows +
    P, so a budget of that size guarantees full coverage (callers pass a
    smaller wpp-based budget in the common case; truncation drops windows
    of the least-promising probes only). Deduplicated because duplicated
    windows both waste scan steps and flood running top-k merges with
    duplicate rows.

    `limit` (optional dynamic int32 scalar) masks windows of probes ranked
    at or past it — the dynamic-nprobe path: `probe` is sized to the pow2
    bucket, `limit` is the actual requested nprobe."""
    nprobe = probe.shape[1]
    starts = jnp.take(cluster_start, probe)  # [Q, P]
    ends = jnp.take(cluster_start, probe + 1)
    ws = starts // WINDOW
    wcnt = jnp.where(ends > starts, -((-ends) // WINDOW) - ws, 0)
    cum = jnp.cumsum(wcnt, axis=1)  # [Q, P]
    j = jnp.arange(w_budget, dtype=jnp.int32)[None, :]  # [1, W]
    # p_idx[q, j] = which probe the j-th window belongs to
    p_idx = jnp.sum(
        (cum[:, None, :] <= j[:, :, None]).astype(jnp.int32), axis=2
    )  # [Q, W]
    valid_w = p_idx < (nprobe if limit is None else limit)
    p_clip = jnp.minimum(p_idx, nprobe - 1)
    prev = jnp.where(
        p_idx > 0,
        jnp.take_along_axis(cum, jnp.maximum(p_clip - 1, 0), axis=1),
        0,
    )
    wbase = jnp.take_along_axis(ws, p_clip, axis=1)
    widx = jnp.where(valid_w, wbase + (j - prev), 0)  # [Q, W]
    dead = jnp.int32(n_windows + 1)
    keyw = jnp.sort(jnp.where(valid_w, widx, dead), axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(keyw[:, :1], bool), keyw[:, 1:] == keyw[:, :-1]],
        axis=1,
    )
    valid_w = jnp.logical_and(keyw < dead, ~dup)
    return jnp.where(valid_w, keyw, 0), valid_w


@register_index_pytree
class IVFIndex(VectorIndex):
    """Shared IVF machinery; `codec` selects the payload encoding:
    'raw' -> IVFFLAT, 'sq8' -> IVFSQ, 'pq' -> IVFPQ."""

    _array_fields = (
        "centroids",
        "csq",
        "perm_data",  # [N', D'|M] cluster-major payload (codec-encoded)
        "perm_rows",  # int32[N'] original row ids (-1 pad)
        "perm_aux",  # f32[N'] decoded |x|^2 (inf on padding)
        "cluster_start",  # int32[C+1] row offsets into perm_*
        "codec_a",  # sq8: lo[D'] / pq: codebooks[M, K, ds]
        "codec_b",  # sq8: scale[D'] / pq: None
        "raw_data",  # two-stage only: reference to the segment payload
        "raw_aux",
    )
    _static_fields = (
        "metric",
        "dim",
        "n_rows",
        "n_clusters",
        "n_windows",
        "wpp",  # typical windows per probed cluster (sizes the W budget)
        "codec",
        "two_stage",
        "rerank_multiple",
    )

    def __init__(self, **kw):
        for f in self._array_fields + self._static_fields:
            setattr(self, f, kw.pop(f))
        assert not kw, f"unexpected fields: {kw}"
        self.raw_host = None  # host-RAM raw rows (disk-mode re-rank tier)
        # window-layout mirrors of filterable scalar columns / the alive
        # bitmap, keyed by (column, mutation_generation) — see to_window_mask
        self._win_mirrors: Dict[Any, jax.Array] = {}

    # --------------------------------------------------- window-space masks
    def to_window_mask(self, dmask, segment):
        """Re-express a row-space DeviceMask over this index's cluster-major
        window layout (WindowMask), so the scan kernel tests candidates by
        CONTIGUOUS window lookup instead of per-row scattered gathers from
        bool[capacity] (the gather dominates masked scans on TPU). Column
        mirrors are permuted ONCE per (column, segment generation) and
        cached. Returns None when some leaf cannot be mirrored."""
        from ..search.filters import WindowMask

        _, _, _, has_alive, expr_skel = dmask.skel
        if not hasattr(self, "_win_mirrors"):  # unflattened copies lack it
            return None
        gen = getattr(segment, "mutation_generation", 0)
        leaves = list(dmask.leaves)
        out: list = []
        pos = 0
        perm = jnp.maximum(self.perm_rows, 0)

        def mirror(key, src):
            hit = self._win_mirrors.get(key)
            if hit is None:
                if len(self._win_mirrors) > 64:
                    self._win_mirrors.clear()
                hit = jax.jit(lambda c, p: jnp.take(c, p))(jnp.asarray(src), perm)
                self._win_mirrors[key] = hit
            return hit

        if has_alive:
            out.append(mirror(("__alive__", gen), leaves[0]))
            pos = 1

        def rec(s):
            nonlocal pos
            kind = s[0]
            if kind in ("and", "or"):
                return rec(s[1]) and rec(s[2])
            if kind == "not":
                return rec(s[1])
            if kind == "lit":
                return True
            if kind in ("cmp", "in"):
                if len(s) < 3:
                    return False  # no column name: cannot key the mirror
                col, val = leaves[pos], leaves[pos + 1]
                pos += 2
                out.append(mirror((s[2], gen), col))
                out.append(val)
                return True
            return False

        if expr_skel is not None and not rec(expr_skel):
            return None
        n_prime = int(self.perm_rows.shape[0])
        # n_rows == capacity: layout padding is masked by the kernel's own
        # rows>=0 test, not by an arange tail
        wm = WindowMask(("root", n_prime, n_prime, has_alive, expr_skel), out)
        # materialized-bitmap cache: a REPEATED filter (the serving norm)
        # skips the in-program mask arithmetic entirely — the scan takes a
        # prebuilt bool[N'] leaf. Key = skeleton + the comparison-constant
        # bytes + generation (mirrors are generation-keyed already).
        try:
            vals_key = tuple(
                v.tobytes() for v in out if isinstance(v, np.ndarray)
            )
        except Exception:  # noqa: BLE001 — unhashable leaf: skip the cache
            return wm
        ck = (expr_skel, has_alive, vals_key, gen)
        cache = getattr(self, "_win_mask_built", None)
        if cache is None:
            cache = self._win_mask_built = {}
        hit = cache.get(ck)
        if hit is None:
            if len(cache) > 32:
                cache.clear()
            hit = _build_window_mask(wm)
            cache[ck] = hit
        return WindowMask(("prebuilt", n_prime, n_prime, False, None), [hit])

    # ------------------------------------------------------------- build
    @classmethod
    def _build_common(
        cls,
        payload,
        n_rows: int,
        *,
        metric: Metric,
        dim: int,
        params: Dict[str, Any],
        settings,
        codec: str,
        two_stage: bool,
        progress_cb=None,
        cancel_cb=None,
        force_host_raw: bool = False,
    ) -> "IVFIndex":
        def _report(frac):
            if progress_cb is not None:
                progress_cb(frac)

        if metric not in (Metric.L2, Metric.IP, Metric.COSINE):
            raise IndexParameterError(f"IVF does not support metric {metric}")
        c = int(params.get("ncentroids", default_ncentroids(n_rows)))
        c = max(1, min(c, n_rows))
        storage_dtype = payload.data.dtype
        dpad = payload.data.shape[1]

        host_tier = getattr(payload, "is_host", False)
        host_raw = host_tier or force_host_raw  # disk-mode raw tier
        if host_tier and codec == "raw":
            raise IndexParameterError(
                "host-tier (beyond-HBM) segments need a compressed codec: "
                "use MSTG/IVFSQ/IVFPQ (raw IVFFLAT would mirror the whole "
                "payload into HBM)"
            )
        rep = _scan_rep(payload, n_rows, metric)  # f32[n, dpad] (np if host)
        rep_h = rep if host_tier else None  # device payloads never download
        max_train = None
        if settings is not None:
            max_train = max(
                settings.query.max_build_index_train_block_bytes // (dpad * 4), c
            )
        _report(0.05)
        cents, assign = balanced_kmeans(
            rep, rep_h, n_rows, c, seed=0,
            max_train_rows=max_train, cancel_cb=cancel_cb,
        )
        check_cancel(cancel_cb)
        _report(0.6)  # k-means dominates the IVF build
        c = int(cents.shape[0])
        npad = round_up(max(n_rows, WINDOW), WINDOW)

        codec_a = codec_b = None
        if host_tier:
            # host path: permutation + encode in numpy, one device push
            sizes = np.bincount(assign, minlength=c)
            order = np.argsort(assign, kind="stable").astype(np.int32)
            starts = np.zeros(c + 1, np.int64)
            np.cumsum(sizes, out=starts[1:])
            perm_rows_arr = np.full(npad, -1, np.int32)
            perm_rows_arr[:n_rows] = order
            perm_rows_arr = jnp.asarray(perm_rows_arr)
            starts_arr = jnp.asarray(starts.astype(np.int32))
            if codec == "sq8":
                p = quantize.sq8_train(rep_h)
                enc = quantize.sq8_encode(rep_h, p)
                codec_a = jnp.asarray(p.lo)
                codec_b = jnp.asarray(p.scale)
                dec_sq = quantize.decoded_sqnorm(
                    lambda cb: quantize.sq8_decode_dev(cb, codec_a, codec_b), enc
                )
                pdata = np.zeros((npad, dpad), np.uint8)
            elif codec == "pq":
                m = int(params.get("M", 0)) or _default_pq_m(dim)
                if dim % m:
                    raise IndexParameterError(f"dim {dim} not divisible by M={m}")
                bits = int(params.get("bit_size", 8))
                pqp = quantize.pq_train(rep_h[:, :dim], m, bits=bits)
                enc = quantize.pq_encode(rep_h[:, :dim], pqp)
                codec_a = jnp.asarray(pqp.codebooks)
                dec_sq = quantize.decoded_sqnorm(
                    lambda cb: quantize.pq_decode_dev(cb, codec_a), enc
                )
                pdata = np.zeros((npad, m), np.uint8)
            else:  # pragma: no cover — raw is rejected on host tiers above
                raise IndexParameterError(f"unsupported host-tier codec {codec}")
            pdata[:n_rows] = enc[order]
            perm_data = jnp.asarray(pdata)
            paux = np.full(npad, np.inf, np.float32)
            paux[:n_rows] = dec_sq[order]
            paux_arr = jnp.asarray(paux)
        else:
            # device path: permutation, encode and sqnorms never leave HBM
            order = jnp.argsort(assign, stable=True).astype(jnp.int32)
            counts = jnp.bincount(assign, length=c)
            starts_arr = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
            )
            perm_rows_arr = jnp.full(npad, -1, jnp.int32).at[:n_rows].set(order)
            rep_perm = jnp.take(rep, order, axis=0)  # f32[n, dpad]
            if codec == "raw":
                dec_sq = jnp.sum(rep_perm * rep_perm, axis=1)
                perm_data = (
                    jnp.zeros((npad, dpad), jnp.float32)
                    .at[:n_rows]
                    .set(rep_perm)
                    .astype(storage_dtype)
                )
            elif codec == "sq8":
                codec_a, codec_b = quantize.sq8_train_dev(rep)
                enc = quantize.sq8_encode_dev(rep_perm, codec_a, codec_b)
                dec = quantize.sq8_decode_dev(enc, codec_a, codec_b).astype(
                    jnp.float32
                )
                dec_sq = jnp.sum(dec * dec, axis=1)
                perm_data = jnp.zeros((npad, dpad), jnp.uint8).at[:n_rows].set(enc)
            elif codec == "pq":
                m = int(params.get("M", 0)) or _default_pq_m(dim)
                if dim % m:
                    raise IndexParameterError(f"dim {dim} not divisible by M={m}")
                bits = int(params.get("bit_size", 8))
                codec_a = quantize.pq_train_dev(rep[:, :dim], m, bits=bits)
                check_cancel(cancel_cb)
                enc = quantize.pq_encode_dev(rep_perm[:, :dim], codec_a)
                cbn = quantize.pq_codeword_sqnorms(codec_a)  # [M, K]
                dec_sq = jnp.sum(
                    jnp.take_along_axis(
                        cbn.T, enc.astype(jnp.int32), axis=0
                    ),
                    axis=1,
                )
                perm_data = jnp.zeros((npad, m), jnp.uint8).at[:n_rows].set(enc)
            else:  # pragma: no cover
                raise IndexParameterError(f"unknown codec {codec}")
            paux_arr = (
                jnp.full(npad, jnp.inf, jnp.float32).at[:n_rows].set(dec_sq)
            )
        check_cancel(cancel_cb)
        _report(0.9)  # windows permuted + encoded

        wpp = int(math.ceil((n_rows / max(c, 1)) / WINDOW)) + 1
        out = cls(
            centroids=cents,
            csq=jnp.sum(cents * cents, axis=1),
            perm_data=perm_data,
            perm_rows=perm_rows_arr,
            perm_aux=paux_arr,
            cluster_start=starts_arr,
            codec_a=codec_a,
            codec_b=codec_b,
            raw_data=payload.data if two_stage and not host_raw else None,
            raw_aux=payload.aux_for(metric) if two_stage and not host_raw else None,
            metric=metric,
            dim=dim,
            n_rows=n_rows,
            n_clusters=c,
            n_windows=npad // WINDOW,
            wpp=wpp,
            codec=codec,
            two_stage=two_stage,
            rerank_multiple=4,
        )
        if two_stage and host_raw:
            # disk-mode: exact re-rank gathers raw rows from HOST RAM
            # (plain attrs, not pytree children — never traced). For a
            # device payload with disk_mode=1 this is the one deliberate
            # device->host transfer: the raw tier is being EVICTED to host.
            out.raw_host = rep_h if host_tier else np.asarray(rep, np.float32)
        return out

    def reattach_payload(self, payload) -> None:
        """Re-attach segment payload references after a state-dict load
        (raw_data/raw_aux are never serialized — they belong to the
        segment). Host-tier payloads re-attach as the host re-rank
        tier; device payloads as device references."""
        if not self.two_stage:
            return
        if getattr(payload, "is_host", False):
            self.raw_host = np.asarray(payload.data, np.float32)
        else:
            self.raw_data = payload.data
            self.raw_aux = payload.aux_for(self.metric)

    def cluster_heads(self) -> jax.Array:
        """Representative row of each cluster (entry points for graph
        indexes): the first row in its window range, -1 for empty."""
        starts = self.cluster_start[:-1]
        sizes = self.cluster_start[1:] - starts
        heads = jnp.take(self.perm_rows, jnp.minimum(starts, self.perm_rows.shape[0] - 1))
        return jnp.where(sizes > 0, heads, -1)

    # ------------------------------------------------------------- score
    def _q_parts(self, q: jax.Array) -> jax.Array:
        """Query in matmul form (f32; gathered-row scoring upcasts)."""
        return q.astype(jnp.float32)[None]

    def _decode(self, gathered: jax.Array) -> jax.Array:
        """Gathered payload -> f32 rows for scoring. Gathered-row paths are
        bandwidth/gather-bound, so f32 math costs nothing extra — and the
        bf16 hi/lo-split trick measured UNSAFE here: XLA can refold the
        split inside this fusion, dropping the low half and biasing every
        score by ~q_lo·x (seen as a per-query-constant distance error at
        1M scale on TPU)."""
        if self.codec == "raw":
            return gathered.astype(jnp.float32)
        if self.codec == "sq8":
            return quantize.sq8_decode_dev(gathered, self.codec_a, self.codec_b).astype(jnp.float32)
        return quantize.pq_decode_dev(gathered, self.codec_a).astype(jnp.float32)

    def _dot(self, q_parts: jax.Array, rows_mat: jax.Array) -> jax.Array:
        """[P, Q, D'] x [Q, B, D'] -> f32[Q, B] (batched over queries)."""
        d = rows_mat.shape[-1]
        out = jnp.zeros((q_parts.shape[1], rows_mat.shape[1]), jnp.float32)
        for p in range(q_parts.shape[0]):
            out = out + jax.lax.dot_general(
                q_parts[p][:, None, :d],
                rows_mat,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=exact_precision(),
            )[:, 0, :]
        return out

    def _nprobe(self, params: ParamsKey) -> int:
        d = dict(params)
        p = d.get("nprobe", DEFAULT_NPROBE)
        # MSTG 'alpha' maps to probe width (its reference role: search
        # expansion factor) — alpha*default probes.
        if "alpha" in d and "nprobe" not in d:
            p = max(1, int(float(d["alpha"]) * DEFAULT_NPROBE))
        return int(max(1, min(int(p), self.n_clusters)))

    # ------------------------------------------------------------- search
    # the fused executor may pass the actual nprobe as a dynamic scalar
    # (params then carry its pow2 bucket) — see base.split_dyn_nprobe
    supports_dyn_nprobe = True

    def search_t(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
        dyn_nprobe=None,
    ) -> Tuple[jax.Array, jax.Array]:
        if (
            self.two_stage
            and getattr(self, "raw_host", None) is None
            and self.raw_data is not None
        ):
            ncand = min(max(k * self.rerank_multiple, k), self.n_rows)
            v, r = self._scan_stage(
                queries, ncand, mask=mask, params=params, dyn_nprobe=dyn_nprobe
            )
            ev = self._exact_scores(queries, r)
            kk = min(k, ev.shape[-1])
            v2, p2 = jax.lax.top_k(ev, kk)
            r2 = jnp.take_along_axis(r, p2, axis=-1)
            r2 = jnp.where(jnp.isfinite(v2), r2, -1)
            if kk < k:
                pad = ((0, 0), (0, k - kk))
                v2 = jnp.pad(v2, pad, constant_values=NEG_INF)
                r2 = jnp.pad(r2, pad, constant_values=-1)
            return v2, r2
        return self._scan_stage(
            queries, k, mask=mask, params=params, dyn_nprobe=dyn_nprobe
        )

    def _scan_stage(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
        dyn_nprobe=None,
    ) -> Tuple[jax.Array, jax.Array]:
        from ..search.filters import WindowMask, as_mask_array

        wmask = None
        if isinstance(mask, WindowMask):
            # predicate over window-layout column mirrors: built once per
            # call, consumed by contiguous window take inside the scan
            wmask = mask.build().reshape(self.n_windows, WINDOW)
            mask = None
        else:
            mask = as_mask_array(mask)
        nprobe = self._nprobe(params)
        nq = queries.shape[0]
        q = queries.astype(jnp.float32)
        if self.metric == Metric.COSINE:
            nrm = jnp.linalg.norm(q, axis=1, keepdims=True)
            q = q / jnp.where(nrm > 0, nrm, 1.0)

        # Coarse probe: MXU score vs all centroids. Cell ranking must match
        # the ASSIGNMENT geometry (rows were L2-assigned by k-means): for L2
        # and Cosine (|q|=1 after normalization) rank by 2 q·c - |c|^2. For
        # IP (MIPS) rank by raw q·c — large-norm centroids aligned with q.
        cs = jnp.dot(q, self.centroids.T, preferred_element_type=jnp.float32)
        if self.metric in (Metric.L2, Metric.COSINE):
            cs = 2.0 * cs - self.csq[None, :]
        # never probe empty clusters (balanced k-means keeps a fixed slot
        # count; slots that own no rows must not consume probe budget)
        sizes0 = self.cluster_start[1:] - self.cluster_start[:-1]
        cs = jnp.where(sizes0[None, :] > 0, cs, NEG_INF)
        _, probe = jax.lax.top_k(cs, nprobe)  # [Q, P]

        w_budget = int(
            min(self.n_windows + nprobe, nprobe * self.wpp + 4)
        )
        limit = None
        if dyn_nprobe is not None:
            limit = jnp.minimum(jnp.asarray(dyn_nprobe, jnp.int32), nprobe)
        widx, valid_w = windows_for_probes(
            self.cluster_start, probe, self.n_windows, w_budget, limit=limit
        )

        q_parts = self._q_parts(q)
        kk = min(k, self.n_rows)
        pdw = self.perm_data.reshape(self.n_windows, WINDOW, -1)
        prw = self.perm_rows.reshape(self.n_windows, WINDOW)
        paw = self.perm_aux.reshape(self.n_windows, WINDOW)

        # NOTE on a tempting non-optimization (measured, round 4): scoring
        # the gathered bf16 codes with a hi/lo-split query does NOT help —
        # (a) accuracy collapses to single-bf16 because XLA merges
        # dot(hi,g)+dot(lo,g) into dot(hi+lo,g), re-rounding hi+lo in
        # bf16; an optimization_barrier on the SPLIT cannot block that
        # rewrite (only one on the dot OUTPUTS could); and (b) there is no
        # bandwidth to win: the _decode astype is a convert that XLA fuses
        # into the matmul operand, so no f32 copy of the gather ever
        # materializes (isolated probe: default-precision f32 dot and the
        # decode path both measure ~1e-6 relative of host truth).

        # Group G windows per scan step: fewer, larger device ops — the
        # sequential lax.scan step count is a latency term, and every
        # step costs two top_k passes. When the whole probe budget fits a
        # transient-memory cap, run ONE step (no scan, one matmul, one
        # selection pass): at bench shapes (nprobe 2, w_budget ~10,
        # batch<=512) this replaces 3 sequential steps + 6 top_ks with
        # 1 gather + 1 matmul + 2 top_ks per call.
        elem = 4 * max(1, pdw.shape[-1])
        cap_windows = max(1, int((512 << 20) // max(1, nq * WINDOW * elem)))
        group = max(1, min(w_budget, cap_windows))
        w_pad = -(-w_budget // group) * group
        if w_pad != w_budget:
            widx = jnp.pad(widx, ((0, 0), (0, w_pad - w_budget)))
            valid_w = jnp.pad(valid_w, ((0, 0), (0, w_pad - w_budget)))
        n_steps = w_pad // group

        def step(carry, s):
            bv, br = carry
            sl = jax.lax.dynamic_slice_in_dim(widx, s * group, group, axis=1)
            live = jax.lax.dynamic_slice_in_dim(valid_w, s * group, group, axis=1)
            rows = jnp.take(prw, sl, axis=0)  # [Q, G, WIN]
            rows = jnp.where(live[..., None], rows, -1).reshape(nq, -1)
            xb = self._decode(jnp.take(pdw, sl, axis=0))  # [Q, G, WIN, D']
            xb = xb.reshape(nq, group * WINDOW, xb.shape[-1])
            scores = self._dot(q_parts, xb)
            if self.metric == Metric.L2:
                aux = jnp.take(paw, sl, axis=0).reshape(nq, -1)
                scores = 2.0 * scores - aux
            valid = rows >= 0
            if wmask is not None:
                wv = jnp.take(wmask, sl, axis=0).reshape(nq, -1)
                valid = jnp.logical_and(valid, wv)
            elif mask is not None:
                valid = jnp.logical_and(
                    valid, jnp.take(mask, jnp.maximum(rows, 0))
                )
            scores = jnp.where(valid, scores, NEG_INF)
            ksel = min(kk, group * WINDOW)
            sv, sp = jax.lax.top_k(scores, ksel)
            sr = jnp.take_along_axis(rows, jnp.maximum(sp, 0), axis=-1)
            sr = jnp.where(sp >= 0, sr, -1)
            nv, npos = jax.lax.top_k(jnp.concatenate([bv, sv], -1), kk)
            nr = jnp.take_along_axis(jnp.concatenate([br, sr], -1), npos, -1)
            return (nv, nr), None

        init = (
            jnp.full((nq, kk), NEG_INF, jnp.float32),
            jnp.full((nq, kk), -1, jnp.int32),
        )
        (bv, br), _ = jax.lax.scan(
            step, init, jnp.arange(n_steps, dtype=jnp.int32)
        )

        # boundary windows shared by adjacent probed clusters can score a
        # row twice — dedup before the final cut
        bv, br, _ = dedup_rows(bv, br)
        bv, pos = jax.lax.top_k(bv, kk)
        br = jnp.take_along_axis(br, pos, axis=-1)
        br = jnp.where(jnp.isfinite(bv), br, -1)
        if kk < k:
            pad = ((0, 0), (0, k - kk))
            bv = jnp.pad(bv, pad, constant_values=NEG_INF)
            br = jnp.pad(br, pad, constant_values=-1)
        return bv, br

    # ---------------------------------------------------------- two-stage
    def supports_two_stage(self) -> bool:
        return self.two_stage

    def requires_two_stage(self) -> bool:
        """Disk-mode (host raw tier) indexes MUST take the eager two-stage
        path: the exact re-rank gathers raw rows from host RAM, which
        cannot happen inside a traced program."""
        return self.two_stage and getattr(self, "raw_host", None) is not None

    def search_first_stage(
        self,
        queries: jax.Array,
        num_candidates: int,
        *,
        params: Optional[Dict[str, Any]] = None,
        mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        pkey = tuple(sorted((params or {}).items()))
        return self._scan_stage(queries, num_candidates, mask=mask, params=pkey)

    def _exact_scores_host(self, queries, row_ids) -> jax.Array:
        """Disk-mode computeTopDistanceSubset: candidate rows gathered from
        HOST RAM, scored in f64 numpy (candidates are few), result back on
        device. Eager only."""
        raw = self.raw_host
        q = np.asarray(queries, np.float64)
        r = np.asarray(row_ids)
        rows = raw[np.maximum(r, 0)].astype(np.float64)  # [Q, C, D']
        s = np.einsum("qd,qcd->qc", q[:, : rows.shape[-1]], rows)
        if self.metric == Metric.L2:
            s = 2.0 * s - (rows**2).sum(-1)
        elif self.metric == Metric.COSINE:
            nrm = np.linalg.norm(rows, axis=-1)
            s = s / np.where(nrm > 0, nrm, 1.0)
        s = np.where(r >= 0, s, NEG_INF).astype(np.float32)
        return jnp.asarray(s)

    def _exact_scores(self, queries: jax.Array, row_ids: jax.Array) -> jax.Array:
        """Exact scores vs the RAW payload (computeTopDistanceSubset)."""
        if getattr(self, "raw_host", None) is not None:
            return self._exact_scores_host(queries, row_ids)
        assert self.raw_data is not None
        rows = jnp.take(
            self.raw_data, jnp.maximum(row_ids, 0), axis=0
        ).astype(jnp.float32)
        q = distance.normalize_queries(queries.astype(jnp.float32), self.metric)
        s = jnp.einsum("qd,qkd->qk", q, rows, precision=exact_precision())
        if self.metric == Metric.L2:
            aux = jnp.take(self.raw_aux, jnp.maximum(row_ids, 0))
            s = 2.0 * s - aux
        elif self.metric == Metric.COSINE:
            nrm = jnp.linalg.norm(rows, axis=-1)
            s = s * jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
        return jnp.where(row_ids >= 0, s, NEG_INF)

    def compute_scores_subset(self, queries: jax.Array, row_ids: jax.Array):
        return self._exact_scores(queries, row_ids)

    def search(self, queries, k, *, params=None, mask=None):
        if getattr(self, "raw_host", None) is None:
            return super().search(queries, k, params=params, mask=mask)
        # disk-mode standalone search: eager two-stage (SQ8 scan on device,
        # exact re-rank against host rows)
        ncand = min(max(k * self.rerank_multiple, k), self.n_rows)
        v, r = self.search_first_stage(queries, ncand, params=params, mask=mask)
        ev = self._exact_scores_host(queries, r)
        kk = min(k, ev.shape[-1])
        v2, p2 = jax.lax.top_k(ev, kk)
        r2 = jnp.take_along_axis(r, p2, axis=-1)
        r2 = jnp.where(jnp.isfinite(v2), r2, -1)
        if kk < k:
            pad = ((0, 0), (0, k - kk))
            v2 = jnp.pad(v2, pad, constant_values=NEG_INF)
            r2 = jnp.pad(r2, pad, constant_values=-1)
        return v2, r2

    # -------------------------------------------------------------- misc
    @property
    def memory_bytes(self) -> int:
        total = 0
        for f in self._array_fields:
            if f in ("raw_data", "raw_aux"):
                continue  # references to the segment payload, not owned
            a = getattr(self, f)
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total

    def state_dict(self) -> Dict[str, Any]:
        arrays = {}
        for f in self._array_fields:
            if f in ("raw_data", "raw_aux"):
                continue
            a = getattr(self, f)
            if a is not None:
                arrays[f] = np.asarray(a)
        return {
            "meta": {
                "kind": self.kind.value,
                "metric": self.metric.value,
                "dim": self.dim,
                "n_rows": self.n_rows,
                "n_clusters": self.n_clusters,
                "n_windows": self.n_windows,
                "wpp": self.wpp,
                "codec": self.codec,
                "two_stage": self.two_stage,
                "rerank_multiple": self.rerank_multiple,
                "storage_dtype": str(self.perm_data.dtype),
            },
            "arrays": arrays,
        }

    @classmethod
    def from_state_dict(cls, state: Dict[str, Any]) -> "IVFIndex":
        m = state["meta"]
        a = dict(state["arrays"])
        # two-stage indexes load WITHOUT their raw payload references
        # (raw_data/raw_aux are segment-owned, never serialized); the
        # table re-attaches them via reattach_payload() right after
        # load. Until then search_t degrades to the quantized scan.
        dt = jnp.bfloat16 if "bfloat16" in m["storage_dtype"] else None
        kw = {}
        for f in cls._array_fields:
            v = a.get(f)
            if v is None:
                kw[f] = None
            elif f == "perm_data" and dt is not None and m["codec"] == "raw":
                kw[f] = jnp.asarray(v, dtype=dt)
            else:
                kw[f] = jnp.asarray(v)
        kw.update(
            metric=Metric(m["metric"]),
            dim=m["dim"],
            n_rows=m["n_rows"],
            n_clusters=m["n_clusters"],
            n_windows=m["n_windows"],
            wpp=m["wpp"],
            codec=m["codec"],
            two_stage=m["two_stage"],
            rerank_multiple=m["rerank_multiple"],
            raw_data=None,
            raw_aux=None,
        )
        obj = cls.__new__(cls)
        IVFIndex.__init__(obj, **kw)
        return obj


@register(IndexKind.IVFFLAT)
@register_index_pytree
class IVFFlatIndex(IVFIndex):
    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        if getattr(payload, "is_host", False):
            # Host-tier payload (requested, or HBM-spilled under memory
            # pressure): raw IVFFLAT would mirror the whole payload into
            # HBM — degrade to the disk-mode shape instead (SQ8 windows on
            # device + exact re-rank against host rows), the same
            # degradation the reference's disk-mode MSTG embodies
            # (Search::DiskIOManager; MergeTreeVSManager.cpp:510-630
            # two-stage). Reported distances stay exact via the re-rank.
            from ..service.event_log import GLOBAL_COUNTERS

            GLOBAL_COUNTERS.bump("IvfFlatDegradedToDiskMode")
            return cls._build_common(
                payload, n_rows, metric=metric, dim=dim,
                params=dict(params or {}), settings=settings, codec="sq8",
                two_stage=True, progress_cb=progress_cb, cancel_cb=cancel_cb,
            )
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=dict(params or {}),
            settings=settings, codec="raw", two_stage=False,
            progress_cb=progress_cb, cancel_cb=cancel_cb,
        )


@register(IndexKind.IVFSQ)
@register_index_pytree
class IVFSQIndex(IVFIndex):
    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=dict(params or {}),
            # two_stage: the SQ8 scan ranks candidates, then the top
            # k*rerank_multiple re-score exactly against the raw payload
            # (zero extra HBM: raw_data references the segment payload).
            # The reference reports SQ-reconstructed distances here; we
            # report exact ones — same ids at far better tie behavior on
            # coarse value ranges (PARITY.md).
            settings=settings, codec="sq8", two_stage=True,
            progress_cb=progress_cb, cancel_cb=cancel_cb,
        )


@register(IndexKind.IVFPQ)
@register_index_pytree
class IVFPQIndex(IVFIndex):
    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=dict(params or {}),
            settings=settings, codec="pq", two_stage=True,
            progress_cb=progress_cb, cancel_cb=cancel_cb,
        )


@register(IndexKind.MSTG)
@register_index_pytree
class MSTGIndex(IVFIndex):
    """Multi-stage tree-graph analogue: SQ8 quantized IVF first pass +
    exact re-rank on the raw payload (two-stage, §3.5)."""

    @classmethod
    def build(cls, payload, n_rows, *, metric, dim, params=None, settings=None, progress_cb=None, cancel_cb=None):
        params = dict(params or {})
        # disk_mode=1: the exact-re-rank raw tier moves to HOST RAM so HBM
        # holds only the SQ8 windows — the beyond-HBM contract of the
        # reference's disk-mode MSTG (Search::DiskIOManager, 00028
        # disk_mode=1). Host-tier tables imply it.
        disk = params.pop("disk_mode", 0)
        return cls._build_common(
            payload, n_rows, metric=metric, dim=dim, params=params,
            settings=settings, codec="sq8", two_stage=True,
            progress_cb=progress_cb, cancel_cb=cancel_cb,
            force_host_raw=bool(int(disk or 0)),
        )
