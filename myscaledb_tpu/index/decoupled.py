"""Decoupled index: serve a merged segment through its sources' indexes.

Reference semantics (SURVEY.md §3.4, MergeTask.cpp:319-405 +
VIWithDataPart.cpp:56-127): when parts with built indexes merge, the new
part keeps the old index files plus row-id maps (old->new and new->old);
searches fan out over the old index segments with label translation until
a fresh index for the merged part is built in the background, then the
decouple machinery is dropped.

TPU version: the wrapper holds the source index objects (device arrays
already resident) and per-source `row_map` int32[old_capacity] -> new row
id (-1 = dropped/deleted at merge). The merged segment's filter/delete
bitmap is translated through the map INTO each source search, and result
labels are translated back — same pre-filter guarantees as everywhere.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..metrics import Metric
from ..ops.topk import NEG_INF
from .base import ParamsKey, VectorIndex


class DecoupledIndex(VectorIndex):
    """Transient (never persisted): replaced by a real rebuild."""

    def __init__(self, subs, row_maps, *, metric: Metric, dim: int, n_rows: int):
        self.subs = tuple(subs)
        self.row_maps = tuple(row_maps)  # int32[old_capacity] each
        self.metric = metric
        self.dim = dim
        self.n_rows = n_rows

    @property
    def supports_dyn_nprobe(self) -> bool:
        return any(getattr(s, "supports_dyn_nprobe", False) for s in self.subs)

    def search_t(
        self,
        queries: jax.Array,
        k: int,
        *,
        mask: Optional[jax.Array] = None,
        params: ParamsKey = (),
        dyn_nprobe=None,
    ) -> Tuple[jax.Array, jax.Array]:
        vs, rs = [], []
        for sub, rmap in zip(self.subs, self.row_maps):
            alive_old = rmap >= 0
            if mask is not None:
                old_mask = jnp.logical_and(
                    alive_old, jnp.take(mask, jnp.maximum(rmap, 0))
                )
            else:
                old_mask = alive_old
            kw = (
                {"dyn_nprobe": dyn_nprobe}
                if dyn_nprobe is not None
                and getattr(sub, "supports_dyn_nprobe", False)
                else {}
            )
            v, r_old = sub.search_t(queries, k, mask=old_mask, params=params, **kw)
            r_new = jnp.where(
                r_old >= 0, jnp.take(rmap, jnp.maximum(r_old, 0)), -1
            )
            v = jnp.where(r_new >= 0, v, NEG_INF)
            vs.append(v)
            rs.append(r_new)
        vals = jnp.concatenate(vs, axis=-1)
        rows = jnp.concatenate(rs, axis=-1)
        mv, pos = jax.lax.top_k(vals, min(k, vals.shape[-1]))
        mr = jnp.take_along_axis(rows, pos, axis=-1)
        mr = jnp.where(jnp.isfinite(mv), mr, -1)
        if mv.shape[-1] < k:
            pad = ((0, 0), (0, k - mv.shape[-1]))
            mv = jnp.pad(mv, pad, constant_values=NEG_INF)
            mr = jnp.pad(mr, pad, constant_values=-1)
        return mv, mr

    @property
    def memory_bytes(self) -> int:
        return sum(s.memory_bytes for s in self.subs) + sum(
            m.size * m.dtype.itemsize for m in self.row_maps
        )

    def state_dict(self) -> Dict[str, Any]:
        raise NotImplementedError("decoupled indexes are transient")

    @classmethod
    def from_state_dict(cls, state):
        raise NotImplementedError("decoupled indexes are transient")


def _flatten(d: DecoupledIndex):
    return (d.subs, d.row_maps), (d.metric, d.dim, d.n_rows)


def _unflatten(aux, children):
    obj = object.__new__(DecoupledIndex)
    obj.subs, obj.row_maps = children
    obj.metric, obj.dim, obj.n_rows = aux
    return obj


jax.tree_util.register_pytree_node(DecoupledIndex, _flatten, _unflatten)
