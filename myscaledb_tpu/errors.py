"""Error types for myscaledb_tpu.

Mirrors the error surface of the reference engine (MyScaleDB) where the
capability overlaps — e.g. parameter validation errors raised at DDL time
(reference: src/VectorIndex/Storages/VIDescriptions.cpp:168-328), build
memory errors (VECTOR_INDEX_BUILD_MEMORY_INSUFFICIENT,
src/VectorIndex/Common/VIBuildMemoryUsageHelper.h), and query-shape errors
enforced by the analyzer (src/Interpreters/TreeRewriter.cpp:904-1000).
"""


class MyScaleTPUError(Exception):
    """Base class for all engine errors."""


class SchemaError(MyScaleTPUError):
    """Bad table schema (unknown column, bad vector dim, duplicate name)."""


class IndexParameterError(MyScaleTPUError):
    """Invalid index type or build/search parameters.

    Reference analogue: Search::MYSCALE_VALID_INDEX_PARAMETER validation
    (src/VectorIndex/Storages/VIDescriptions.cpp:168-209) and the IVFPQ
    `dim % M == 0` check (:317-328).
    """


class QueryShapeError(MyScaleTPUError):
    """Query violates the required shape (ORDER BY direction vs metric,
    missing LIMIT, topk window too large).

    Reference analogue: src/Interpreters/TreeRewriter.cpp:904-1000 and
    max_search_result_window (src/Core/Settings.h:923).
    """


class IndexBuildError(MyScaleTPUError):
    """Index build failed (surfaced in the event log / index status)."""


class IndexBuildMemoryError(IndexBuildError):
    """Build memory budget exceeded; caller may retry with smaller chunks.

    Reference analogue: VECTOR_INDEX_BUILD_MEMORY_INSUFFICIENT retry loop
    (src/VectorIndex/Storages/VIBuilderUpdater.cpp:639-657).
    """


class IndexBuildCanceledError(IndexBuildError):
    """Build canceled mid-flight (DROP VECTOR INDEX during build).

    Reference analogue: builds_blocker + per-part cancelBuild
    (src/VectorIndex/Common/VIWithDataPart.h:183-185); surfaces as the
    BUILD_CANCELED event.
    """


class IndexNotReadyError(MyScaleTPUError):
    """Search requested an index that is not BUILT/LOADED and brute force
    is disabled (enable_brute_force_vector_search=False on a large part).
    """


class PersistenceError(MyScaleTPUError):
    """Checksum mismatch or unreadable index/segment files."""


class SQLError(MyScaleTPUError):
    """SQL parse or analysis error."""
