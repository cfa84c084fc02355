"""Table schema: column types, vector column specs.

Mirrors the reference's DDL contract (SURVEY.md §2.7): float vectors are
`Array(Float32)` columns whose dimension comes from a
`CONSTRAINT CHECK length(vector)=D` (VIDescriptions.cpp:152-155); binary
vectors are `FixedString(D/8)` with dim = N*8 (:156-161). Here both are
first-class column types carrying their dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..errors import SchemaError


class ColumnType:
    """Base scalar column type."""

    np_dtype: Optional[np.dtype] = None
    name = "Column"

    def __repr__(self):
        return self.name

    def validate(self, values: np.ndarray) -> np.ndarray:
        return np.asarray(values, dtype=self.np_dtype)


class UInt64(ColumnType):
    np_dtype = np.dtype(np.uint64)
    name = "UInt64"


class Int64(ColumnType):
    np_dtype = np.dtype(np.int64)
    name = "Int64"


class Int32(ColumnType):
    np_dtype = np.dtype(np.int32)
    name = "Int32"


class Float32(ColumnType):
    np_dtype = np.dtype(np.float32)
    name = "Float32"


class Float64(ColumnType):
    np_dtype = np.dtype(np.float64)
    name = "Float64"


class String(ColumnType):
    np_dtype = np.dtype(object)
    name = "String"

    def validate(self, values) -> np.ndarray:
        arr = np.empty(len(values), dtype=object)
        for i, v in enumerate(values):
            arr[i] = "" if v is None else str(v)
        return arr


@dataclasses.dataclass(frozen=True)
class FloatVector(ColumnType):
    """Dense float vector column of fixed dimension."""

    dim: int
    name = "FloatVector"

    def validate(self, values) -> np.ndarray:
        arr = np.asarray(values, dtype=np.float32)
        if arr.ndim != 2 or arr.shape[1] != self.dim:
            raise SchemaError(
                f"FloatVector({self.dim}) expects [N, {self.dim}] rows, got {arr.shape}"
            )
        return arr


@dataclasses.dataclass(frozen=True)
class BinaryVector(ColumnType):
    """Packed binary vector of `dim` bits (dim % 8 == 0), stored as uint8
    bytes — the FixedString(dim/8) of the reference."""

    dim: int
    name = "BinaryVector"

    def __post_init__(self):
        if self.dim % 8 != 0:
            raise SchemaError(f"BinaryVector dim must be a multiple of 8, got {self.dim}")

    @property
    def nbytes(self) -> int:
        return self.dim // 8

    def validate(self, values) -> np.ndarray:
        arr = np.asarray(values)
        if arr.dtype == np.bool_:
            if arr.ndim != 2 or arr.shape[1] != self.dim:
                raise SchemaError(
                    f"BinaryVector({self.dim}) bool input expects [N, {self.dim}]"
                )
            return np.packbits(arr, axis=1)
        arr = arr.astype(np.uint8, copy=False)
        if arr.ndim != 2 or arr.shape[1] != self.nbytes:
            raise SchemaError(
                f"BinaryVector({self.dim}) expects packed [N, {self.nbytes}] uint8"
            )
        return arr


def is_vector_type(t: ColumnType) -> bool:
    return isinstance(t, (FloatVector, BinaryVector))


@dataclasses.dataclass
class Schema:
    """Ordered column name -> type mapping."""

    columns: Dict[str, ColumnType]

    def __post_init__(self):
        if not self.columns:
            raise SchemaError("schema needs at least one column")
        for cname in self.columns:
            if not cname.isidentifier():
                raise SchemaError(f"bad column name {cname!r}")

    def vector_columns(self) -> Dict[str, ColumnType]:
        return {n: t for n, t in self.columns.items() if is_vector_type(t)}

    def scalar_columns(self) -> Dict[str, ColumnType]:
        return {n: t for n, t in self.columns.items() if not is_vector_type(t)}

    def require(self, name: str) -> ColumnType:
        if name not in self.columns:
            raise SchemaError(f"no such column: {name}")
        return self.columns[name]

    def require_vector(self, name: str) -> ColumnType:
        t = self.require(name)
        if not is_vector_type(t):
            raise SchemaError(f"column {name} is not a vector column")
        return t
