"""Index factory + parameter validation.

Replaces Search::createVectorIndex / Search::getVectorIndexType /
Search::MYSCALE_VALID_INDEX_PARAMETER (SURVEY.md §2.3;
VIDescriptions.cpp:137-209). Parameter names follow the reference's DDL
surface: build — metric_type, ncentroids, M (PQ subquantizers, must divide
dim — VIDescriptions.cpp:317-328), bit_size (SQ), m / ef_c (HNSW),
disk_mode / alpha (MSTG); search — nprobe (IVF), ef_s (HNSW), alpha (MSTG).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

from ..errors import IndexParameterError
from ..metrics import Metric
from .base import BINARY_KINDS, IndexDescription, IndexKind, VectorIndex

# Valid parameters per index kind: name -> (type, validator or None).
# The validation role of Search::MYSCALE_VALID_INDEX_PARAMETER.
_COMMON_BUILD = {"metric_type": (str, None)}
_IVF_BUILD = {**_COMMON_BUILD, "ncentroids": (int, lambda v: 1 <= v <= 1_048_576)}
_HNSW_BUILD = {
    **_COMMON_BUILD,
    "m": (int, lambda v: 2 <= v <= 512),
    "ef_c": (int, lambda v: 1 <= v <= 100_000),
}

VALID_BUILD_PARAMS: Dict[IndexKind, Dict[str, tuple]] = {
    IndexKind.FLAT: dict(_COMMON_BUILD),
    IndexKind.IVFFLAT: dict(_IVF_BUILD),
    IndexKind.IVFPQ: {
        **_IVF_BUILD,
        "M": (int, lambda v: v >= 1),
        "bit_size": (int, lambda v: v in (4, 8)),
    },
    IndexKind.IVFSQ: {**_IVF_BUILD, "bit_size": (str, None)},
    IndexKind.HNSWFLAT: dict(_HNSW_BUILD),
    IndexKind.HNSWPQ: {
        **_HNSW_BUILD,
        "M": (int, lambda v: v >= 1),
        "bit_size": (int, lambda v: v in (4, 8)),
    },
    IndexKind.HNSWSQ: {**_HNSW_BUILD, "bit_size": (str, None)},
    IndexKind.MSTG: {**_IVF_BUILD, "disk_mode": (int, lambda v: v in (0, 1))},
    IndexKind.BINARYFLAT: dict(_COMMON_BUILD),
    IndexKind.BINARYMSTG: {**_IVF_BUILD},
}

VALID_SEARCH_PARAMS: Dict[IndexKind, Dict[str, tuple]] = {
    IndexKind.FLAT: {},
    IndexKind.IVFFLAT: {"nprobe": (int, lambda v: v >= 1)},
    IndexKind.IVFPQ: {"nprobe": (int, lambda v: v >= 1)},
    IndexKind.IVFSQ: {"nprobe": (int, lambda v: v >= 1)},
    IndexKind.HNSWFLAT: {
        "ef_s": (int, lambda v: v >= 1),
        "entries": (int, lambda v: v >= 1),
        "rerank": (int, lambda v: v >= 1),
    },
    IndexKind.HNSWPQ: {
        "ef_s": (int, lambda v: v >= 1),
        "entries": (int, lambda v: v >= 1),
        "rerank": (int, lambda v: v >= 1),
    },
    IndexKind.HNSWSQ: {
        "ef_s": (int, lambda v: v >= 1),
        "entries": (int, lambda v: v >= 1),
        "rerank": (int, lambda v: v >= 1),
    },
    IndexKind.MSTG: {
        "alpha": ((int, float), lambda v: v > 0),
        "nprobe": (int, lambda v: v >= 1),
    },
    IndexKind.BINARYFLAT: {},
    IndexKind.BINARYMSTG: {
        "alpha": ((int, float), lambda v: v > 0),
        "nprobe": (int, lambda v: v >= 1),
    },
}

_IMPLEMENTATIONS: Dict[IndexKind, Type[VectorIndex]] = {}


def register(kind: IndexKind):
    def deco(cls):
        _IMPLEMENTATIONS[kind] = cls
        cls.kind = kind
        return cls

    return deco


def implementation(kind: IndexKind) -> Type[VectorIndex]:
    if kind not in _IMPLEMENTATIONS:
        raise IndexParameterError(f"index type {kind.value} is not implemented")
    return _IMPLEMENTATIONS[kind]


def _coerce(name: str, value: Any, spec: tuple) -> Any:
    typ, check = spec
    try:
        if typ is int and not isinstance(value, bool):
            value = int(value)
        elif typ is str:
            value = str(value)
        elif isinstance(typ, tuple):
            value = float(value)
    except (TypeError, ValueError):
        raise IndexParameterError(f"parameter {name}={value!r} has wrong type")
    if check is not None and not check(value):
        raise IndexParameterError(f"parameter {name}={value!r} out of range")
    return value


def validate_build_params(
    kind: IndexKind, dim: int, params: Dict[str, Any], *, strict: bool = True
) -> Dict[str, Any]:
    """DDL-time validation (vector_index_parameter_check,
    MergeTreeSettings.h:187)."""
    valid = VALID_BUILD_PARAMS[kind]
    out: Dict[str, Any] = {}
    for name, value in params.items():
        if name not in valid:
            if strict:
                raise IndexParameterError(
                    f"parameter {name!r} is not valid for index type {kind.value}; "
                    f"valid: {sorted(valid)}"
                )
            continue
        out[name] = _coerce(name, value, valid[name])
    # IVFPQ/HNSWPQ: dim % M == 0 (VIDescriptions.cpp:317-328). With
    # vector_index_parameter_check=0 the reference defers this to the
    # BUILD, which then lands in status Error — so only strict DDL checks
    # (only when M is explicit: an omitted M picks a dividing default at
    # build time, like the reference accepting IVFPQ DDL without M)
    if kind in (IndexKind.IVFPQ, IndexKind.HNSWPQ) and strict and "M" in out:
        m = out["M"]
        if dim % m != 0:
            raise IndexParameterError(
                f"PQ subquantizer count M={m} must divide dim={dim}"
            )
    return out


def validate_search_params(
    kind: IndexKind, params: Optional[Dict[str, Any]]
) -> Dict[str, Any]:
    """Query-time validation (parseVSParameters analogue,
    src/VectorIndex/Interpreters/parseVSParameters.cpp:78)."""
    if not params:
        return {}
    valid = VALID_SEARCH_PARAMS[kind]
    out = {}
    for name, value in params.items():
        if name not in valid:
            raise IndexParameterError(
                f"search parameter {name!r} is not valid for {kind.value}; "
                f"valid: {sorted(valid)}"
            )
        out[name] = _coerce(name, value, valid[name])
    return out


def make_description(
    name: str,
    column: str,
    type_str: str,
    dim: int,
    *,
    is_binary_column: bool,
    default_metric: str,
    params: Optional[Dict[str, Any]] = None,
    strict: bool = True,
) -> IndexDescription:
    """Build + validate an IndexDescription from DDL-level inputs."""
    kind = IndexKind.parse(type_str)
    if is_binary_column and kind not in BINARY_KINDS:
        # Binary columns accept only binary index kinds; remap the FLAT/MSTG
        # shorthands the way the reference's getVectorIndexType(type, dtype)
        # dispatches on data type.
        remap = {IndexKind.FLAT: IndexKind.BINARYFLAT, IndexKind.MSTG: IndexKind.BINARYMSTG}
        if kind in remap:
            kind = remap[kind]
        else:
            raise IndexParameterError(
                f"index type {kind.value} is not valid for binary vector columns"
            )
    if not is_binary_column and kind in BINARY_KINDS:
        raise IndexParameterError(
            f"index type {kind.value} requires a binary vector column"
        )
    params = dict(params or {})
    metric_str = params.pop("metric_type", default_metric)
    metric = Metric.parse(metric_str, binary=kind in BINARY_KINDS)
    checked = validate_build_params(kind, dim, params, strict=strict)
    return IndexDescription(
        name=name, column=column, kind=kind, metric=metric, dim=dim,
        params=checked, declared_type=type_str,
    )
