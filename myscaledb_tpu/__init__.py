"""myscaledb_tpu — a TPU-native vector search & hybrid retrieval engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MyScaleDB's
vector-search core (reference: myscale/MyScaleDB, a ClickHouse 23.3 fork):
segmented columnar vector storage, exact Pallas scan kernels, ANN indexes
(IVF*, HNSW*, MSTG-style two-stage), pre-filtered search, BM25 full-text
search, hybrid fusion (RRF/RSF), multi-chip sharded execution, index
persistence + LRU cache, and observability. See SURVEY.md for the
capability map.
"""

from .api.client import Database, connect
from .config import QuerySettings, ServerSettings, Settings, TableSettings
from .errors import (
    IndexBuildError,
    IndexNotReadyError,
    IndexParameterError,
    MyScaleTPUError,
    QueryShapeError,
    SchemaError,
    SQLError,
)
from .metrics import Metric
from .search.filters import F, Expr, Lambda
from .storage.schema import (
    BinaryVector,
    Float32,
    Float64,
    FloatVector,
    Int32,
    Int64,
    Schema,
    String,
    UInt64,
)
from .storage.table import Table


def __getattr__(name):
    # heavyweight scale-out constructs load lazily (they import shard_map
    # machinery; most single-chip users never touch them)
    if name == "MeshTable":
        from .parallel.mesh_table import MeshTable

        return MeshTable
    if name == "ShardedTable":
        from .parallel.sharded_table import ShardedTable

        return ShardedTable
    raise AttributeError(name)

# Index implementations register themselves on import.
from .index import flat as _flat  # noqa: F401
from .index import ivf as _ivf  # noqa: F401
from .index import binary as _binary  # noqa: F401
from .index import hnsw as _hnsw  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "Database",
    "connect",
    "Settings",
    "QuerySettings",
    "TableSettings",
    "ServerSettings",
    "Metric",
    "Schema",
    "Table",
    "F",
    "Expr",
    "Lambda",
    "FloatVector",
    "BinaryVector",
    "UInt64",
    "Int64",
    "Int32",
    "Float32",
    "Float64",
    "String",
    "MyScaleTPUError",
    "SchemaError",
    "IndexParameterError",
    "IndexBuildError",
    "IndexNotReadyError",
    "QueryShapeError",
    "SQLError",
    "MeshTable",
    "ShardedTable",
]
