"""Filter expressions → per-segment row bitmaps (pre-filter semantics).

The reference evaluates WHERE/PREWHERE over each part *before* ANN search,
collecting surviving `_part_offset`s into a DenseBitmap that is passed INTO
the index search (performPrefilter,
src/VectorIndex/Storages/MergeTreeSelectWithHybridSearchProcessor.cpp:938;
getFilterFromPipeline :906-934). Post-filtering is never used for
correctness-critical paths.

Here a filter is a small expression tree over scalar columns. Evaluation
produces a bool[n_rows] numpy mask per segment which the executor extends
to capacity, intersects with the delete bitmap, and ships to the device as
the top-k mask (the DenseBitmap analogue).

Usage:
    from myscaledb_tpu import F
    t.search("vec", q, k=10, filter=(F("id") < 1000) & (F("tag") == "news"))
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import SchemaError


@jax.tree_util.register_pytree_node_class
class DeviceMask:
    """A predicate LOWERED TO THE DEVICE: the expression skeleton is the
    pytree's static aux data (so it keys the jit cache) and the leaves are
    device arrays — mirrored scalar columns plus the comparison constants.
    The fused search program calls build() to produce the bool[capacity]
    bitmap INSIDE the kernel program, completing performPrefilter
    (MergeTreeSelectWithHybridSearchProcessor.cpp:938) without any host
    evaluation or mask upload; changing a constant (id < 5 -> id < 9)
    reuses the compiled program because constants are traced leaves."""

    def __init__(self, skel, leaves):
        self.skel = skel  # ("root", capacity, n_rows, has_alive, expr_skel|None)
        self.leaves = list(leaves)

    def tree_flatten(self):
        return tuple(self.leaves), self.skel

    @classmethod
    def tree_unflatten(cls, skel, leaves):
        return cls(skel, leaves)

    _JOPS = {
        "<": jnp.less,
        "<=": jnp.less_equal,
        ">": jnp.greater,
        ">=": jnp.greater_equal,
        "==": jnp.equal,
        "!=": jnp.not_equal,
    }

    def build(self) -> jnp.ndarray:
        """bool[capacity] mask (False beyond n_rows and on deleted rows)."""
        _, capacity, n_rows, has_alive, expr_skel = self.skel
        it = iter(self.leaves)
        alive = next(it) if has_alive else None

        def rec(s):
            kind = s[0]
            if kind == "and":
                return jnp.logical_and(rec(s[1]), rec(s[2]))
            if kind == "or":
                return jnp.logical_or(rec(s[1]), rec(s[2]))
            if kind == "not":
                return jnp.logical_not(rec(s[1]))
            if kind == "lit":
                return jnp.full((capacity,), bool(s[1]))
            if kind == "cmp":
                col = next(it)
                val = next(it)
                return self._JOPS[s[1]](col, val)
            if kind == "in":
                col = next(it)
                vals = next(it)
                m = jnp.any(col[:, None] == vals[None, :], axis=1)
                return jnp.logical_not(m) if s[1] else m
            raise AssertionError(f"bad skel {s!r}")

        out = rec(expr_skel) if expr_skel is not None else None
        if alive is not None:
            out = alive if out is None else jnp.logical_and(out, alive)
        if out is None:
            out = jnp.full((capacity,), True)
        # padding rows are never valid (pad slots of the mirrored column
        # hold 0 and could otherwise satisfy e.g. `id == 0`)
        if expr_skel is not None and n_rows < capacity:
            out = jnp.logical_and(
                out, jnp.arange(capacity, dtype=jnp.int32) < n_rows
            )
        return out


@jax.tree_util.register_pytree_node_class
class WindowMask(DeviceMask):
    """A DeviceMask re-expressed in an INDEX'S OWN ROW LAYOUT (e.g. the
    IVF cluster-major window permutation): the column leaves are
    layout-permuted mirrors, so the scan kernel tests candidates with a
    contiguous window lookup instead of a per-row scattered gather from
    the row-space bitmap (TPU gathers are the expensive op — ~4ms per
    masked 1M-row IVF batch before this). skel n_rows == capacity == N'
    (layout padding is excluded by the kernel's own row-validity test).

    A "prebuilt" skeleton carries the bool[N'] bitmap itself as the only
    leaf: repeated filters hit an index-side cache of the materialized
    window bitmap, so the scan program does no mask arithmetic at all."""

    def build(self) -> jnp.ndarray:
        if self.skel[0] == "prebuilt":
            return self.leaves[0]
        return super().build()


def as_mask_array(mask):
    """Materialize a mask input (None | bool array | DeviceMask) to a
    bool[capacity] device array (or None). WindowMask is NOT a row-space
    mask — callers that can't consume one must never receive it."""
    if mask is None or not isinstance(mask, DeviceMask):
        return mask
    assert not isinstance(mask, WindowMask), "window mask in a row-space path"
    return mask.build()


def _numeric_minmax(segment, column):
    """(min, max) of a numeric scalar column over the segment's rows, or
    None for string/missing columns. Cached on the segment per mutation
    generation (the minmax-index analogue used by canSkipPrewhereForPart)."""
    try:
        return segment.scalar_minmax(column)
    except Exception:  # noqa: BLE001 — missing column/odd dtype: no fold
        return None


def _device_scalar(segment, column):
    """Device mirror of a numeric scalar column, or None when the column
    cannot be represented exactly on a 32-bit device (strings, Float64,
    integers beyond int32 range)."""
    try:
        return segment.scalar_device(column)
    except Exception:  # noqa: BLE001
        return None


def _value_fits(segment, column, value) -> bool:
    """The comparison constant must be exactly representable in the
    mirrored column's device dtype, or device and host paths would
    disagree at the boundary."""
    col = segment.scalar(column)
    if np.issubdtype(col.dtype, np.integer):
        if isinstance(value, float) and not float(value).is_integer():
            return False  # fractional compare vs int col: host semantics
        v = int(value)
        return -(2**31) <= v < 2**31
    # float32 column
    return float(np.float32(value)) == float(value)


class Expr:
    """Boolean filter expression over scalar columns."""

    def evaluate(self, segment) -> np.ndarray:  # -> bool[n_rows]
        raise NotImplementedError

    def const_fold(self, segment):
        """Try to prove the predicate TRUE or FALSE for the WHOLE segment
        from per-segment column min/max stats (the canSkipPrewhereForPart
        fast path, MergeTreeSelectWithHybridSearchProcessor.cpp:224-290,
        gated by optimize_prefilter_in_search). Returns True/False/None."""
        return None

    def lower_t(self, segment) -> Optional[Tuple[tuple, list]]:
        """Lower to a device-evaluable (skeleton, leaves) pair, or None
        when this node needs host evaluation (strings, Lambda, regex)."""
        return None

    def columns(self) -> set:
        raise NotImplementedError

    def __and__(self, other: "Expr") -> "Expr":
        return And(self, other)

    def __or__(self, other: "Expr") -> "Expr":
        return Or(self, other)

    def __invert__(self) -> "Expr":
        return Not(self)


class And(Expr):
    def __init__(self, a: Expr, b: Expr):
        self.a, self.b = a, b

    def evaluate(self, segment):
        return self.a.evaluate(segment) & self.b.evaluate(segment)

    def const_fold(self, segment):
        fa, fb = self.a.const_fold(segment), self.b.const_fold(segment)
        if fa is False or fb is False:
            return False
        if fa is True and fb is True:
            return True
        return None

    def lower_t(self, segment):
        la, lb = self.a.lower_t(segment), self.b.lower_t(segment)
        if la is None or lb is None:
            return None
        return ("and", la[0], lb[0]), la[1] + lb[1]

    def columns(self):
        return self.a.columns() | self.b.columns()

    def __repr__(self):
        return f"({self.a} AND {self.b})"


class Or(Expr):
    def __init__(self, a: Expr, b: Expr):
        self.a, self.b = a, b

    def evaluate(self, segment):
        return self.a.evaluate(segment) | self.b.evaluate(segment)

    def const_fold(self, segment):
        fa, fb = self.a.const_fold(segment), self.b.const_fold(segment)
        if fa is True or fb is True:
            return True
        if fa is False and fb is False:
            return False
        return None

    def lower_t(self, segment):
        la, lb = self.a.lower_t(segment), self.b.lower_t(segment)
        if la is None or lb is None:
            return None
        return ("or", la[0], lb[0]), la[1] + lb[1]

    def columns(self):
        return self.a.columns() | self.b.columns()

    def __repr__(self):
        return f"({self.a} OR {self.b})"


class Not(Expr):
    def __init__(self, a: Expr):
        self.a = a

    def evaluate(self, segment):
        return ~self.a.evaluate(segment)

    def const_fold(self, segment):
        f = self.a.const_fold(segment)
        return None if f is None else (not f)

    def lower_t(self, segment):
        la = self.a.lower_t(segment)
        if la is None:
            return None
        return ("not", la[0]), la[1]

    def columns(self):
        return self.a.columns()

    def __repr__(self):
        return f"(NOT {self.a})"


class Literal(Expr):
    """Constant TRUE/FALSE (e.g. a partition predicate folded per segment —
    the canSkipPrewhereForPart fast path, SURVEY.md §2.1)."""

    def __init__(self, value: bool):
        self.value = bool(value)

    def evaluate(self, segment):
        return np.full(segment.n_rows, self.value, dtype=bool)

    def const_fold(self, segment):
        return self.value

    def lower_t(self, segment):
        return ("lit", self.value), []

    def columns(self):
        return set()

    def __repr__(self):
        return "TRUE" if self.value else "FALSE"


class Compare(Expr):
    _OPS: dict = {
        "<": np.less,
        "<=": np.less_equal,
        ">": np.greater,
        ">=": np.greater_equal,
        "==": np.equal,
        "!=": np.not_equal,
    }

    def __init__(self, column: str, op: str, value: Any):
        self.column, self.op, self.value = column, op, value

    def evaluate(self, segment):
        col = segment.scalar(self.column)
        if col.dtype == object:  # string column
            vals = np.array([str(self.value)] * 1, dtype=object)
            if self.op == "==":
                return np.fromiter(
                    (c == self.value for c in col), dtype=bool, count=len(col)
                )
            if self.op == "!=":
                return np.fromiter(
                    (c != self.value for c in col), dtype=bool, count=len(col)
                )
            raise SchemaError(f"op {self.op} not supported on string column")
        return self._OPS[self.op](col[: segment.n_rows], self.value)

    def const_fold(self, segment):
        mm = _numeric_minmax(segment, self.column)
        if mm is None:
            return None
        lo, hi = mm
        v = self.value
        try:
            if self.op == "<":
                return True if hi < v else (False if lo >= v else None)
            if self.op == "<=":
                return True if hi <= v else (False if lo > v else None)
            if self.op == ">":
                return True if lo > v else (False if hi <= v else None)
            if self.op == ">=":
                return True if lo >= v else (False if hi < v else None)
            if self.op == "==":
                return True if lo == hi == v else (False if v < lo or v > hi else None)
            if self.op == "!=":
                return False if lo == hi == v else (True if v < lo or v > hi else None)
        except TypeError:
            return None
        return None

    def lower_t(self, segment):
        col = _device_scalar(segment, self.column)
        if col is None or not isinstance(self.value, (int, float, np.number)):
            return None
        if not _value_fits(segment, self.column, self.value):
            return None
        # numpy leaf: jit converts it at dispatch time — an eager
        # jnp.asarray here would cost a ~0.5ms device round-trip PER CALL
        # the column NAME rides in the static skel so index layouts can
        # re-express the predicate over their own column mirrors
        return ("cmp", self.op, self.column), [col, np.asarray(self.value, col.dtype)]

    def columns(self):
        return {self.column}

    def __repr__(self):
        return f"{self.column} {self.op} {self.value!r}"


class In(Expr):
    def __init__(self, column: str, values: Sequence[Any], negate: bool = False):
        self.column, self.values, self.negate = column, list(values), negate

    def evaluate(self, segment):
        col = segment.scalar(self.column)[: segment.n_rows]
        if col.dtype == object:
            vs = set(self.values)
            out = np.fromiter((c in vs for c in col), dtype=bool, count=len(col))
        else:
            out = np.isin(col, np.asarray(self.values, dtype=col.dtype))
        return ~out if self.negate else out

    def const_fold(self, segment):
        if not self.values:
            return self.negate  # IN () is always false, NOT IN () true
        mm = _numeric_minmax(segment, self.column)
        if mm is None:
            return None
        lo, hi = mm
        try:
            if all(v < lo or v > hi for v in self.values):
                return self.negate  # no row can be IN
        except TypeError:
            return None
        return None

    def lower_t(self, segment):
        col = _device_scalar(segment, self.column)
        if col is None or not self.values:
            return None
        for v in self.values:
            if not isinstance(v, (int, float, np.number)):
                return None
            if not _value_fits(segment, self.column, v):
                return None
        vals = np.asarray(self.values, dtype=col.dtype)  # numpy leaf (see Compare)
        return ("in", self.negate, self.column), [col, vals]

    def columns(self):
        return {self.column}

    def __repr__(self):
        kw = "NOT IN" if self.negate else "IN"
        return f"{self.column} {kw} {self.values!r}"


class Like(Expr):
    """SQL LIKE over a string column (% and _ wildcards)."""

    def __init__(self, column: str, pattern: str, negate: bool = False):
        self.column, self.pattern, self.negate = column, pattern, negate
        rx = re.escape(pattern).replace("%", ".*").replace("_", ".")
        self._rx = re.compile(f"^{rx}$", re.DOTALL)

    def evaluate(self, segment):
        col = segment.scalar(self.column)[: segment.n_rows]
        out = np.fromiter(
            (self._rx.match(c) is not None for c in col), dtype=bool, count=len(col)
        )
        return ~out if self.negate else out

    def columns(self):
        return {self.column}

    def __repr__(self):
        kw = "NOT LIKE" if self.negate else "LIKE"
        return f"{self.column} {kw} {self.pattern!r}"


class Lambda(Expr):
    """Escape hatch: arbitrary numpy predicate over named columns."""

    def __init__(self, cols: Sequence[str], fn: Callable[..., np.ndarray]):
        self._cols, self._fn = list(cols), fn

    def evaluate(self, segment):
        args = [segment.scalar(c)[: segment.n_rows] for c in self._cols]
        out = np.asarray(self._fn(*args), dtype=bool)
        if out.shape != (segment.n_rows,):
            raise SchemaError("Lambda filter must return bool[n_rows]")
        return out

    def columns(self):
        return set(self._cols)


class F:
    """Column handle for building filter expressions: F('id') < 100."""

    def __init__(self, column: str):
        self.column = column

    def __lt__(self, v):
        return Compare(self.column, "<", v)

    def __le__(self, v):
        return Compare(self.column, "<=", v)

    def __gt__(self, v):
        return Compare(self.column, ">", v)

    def __ge__(self, v):
        return Compare(self.column, ">=", v)

    def __eq__(self, v):  # type: ignore[override]
        return Compare(self.column, "==", v)

    def __ne__(self, v):  # type: ignore[override]
        return Compare(self.column, "!=", v)

    def isin(self, values):
        return In(self.column, values)

    def notin(self, values):
        return In(self.column, values, negate=True)

    def like(self, pattern):
        return Like(self.column, pattern)

    def between(self, lo, hi):
        return Compare(self.column, ">=", lo) & Compare(self.column, "<=", hi)

    __hash__ = None  # type: ignore[assignment]
