"""ALTER TABLE ADD/DROP COLUMN (scalar columns; instant metadata change
materialized with a default — AlterCommands ADD_COLUMN/DROP_COLUMN)."""

import numpy as np
import pytest

import myscaledb_tpu as ms
from myscaledb_tpu.errors import SchemaError


def _mk(db):
    t = db.create_table(
        "alt_t", ms.Schema({"id": ms.UInt64(), "v": ms.Float32()})
    )
    t.insert({"id": np.arange(5, dtype=np.uint64),
              "v": np.arange(5, dtype=np.float32)})
    return t


def test_add_column_default_and_insert(db):
    _mk(db)
    db.sql("ALTER TABLE alt_t ADD COLUMN score Float32 DEFAULT 1.5")
    rows = db.sql("SELECT id, score FROM alt_t ORDER BY id")
    assert [r["score"] for r in rows] == [1.5] * 5
    # new inserts must carry the column
    db.sql("INSERT INTO alt_t VALUES (9, 0.5, 7.0)")
    rows = db.sql("SELECT score FROM alt_t WHERE id == 9")
    assert rows[0]["score"] == 7.0
    # filters see the new column
    rows = db.sql("SELECT id FROM alt_t WHERE score > 2.0")
    assert [r["id"] for r in rows] == [9]


def test_add_string_column(db):
    _mk(db)
    db.sql("ALTER TABLE alt_t ADD COLUMN tag String DEFAULT 'none'")
    rows = db.sql("SELECT tag FROM alt_t LIMIT 1")
    assert rows[0]["tag"] == "none"


def test_add_column_if_not_exists(db):
    _mk(db)
    db.sql("ALTER TABLE alt_t ADD COLUMN x Int64")
    db.sql("ALTER TABLE alt_t ADD COLUMN IF NOT EXISTS x Int64")
    with pytest.raises(SchemaError):
        db.sql("ALTER TABLE alt_t ADD COLUMN x Int64")


def test_drop_column(db):
    _mk(db)
    db.sql("ALTER TABLE alt_t ADD COLUMN junk Int64 DEFAULT -3")
    db.sql("ALTER TABLE alt_t DROP COLUMN junk")
    assert "junk" not in db.table("alt_t").schema.columns
    db.sql("ALTER TABLE alt_t DROP COLUMN IF EXISTS junk")  # no-op
    with pytest.raises(SchemaError):
        db.sql("ALTER TABLE alt_t DROP COLUMN junk")


def test_drop_vector_or_engine_column_rejected(db):
    t = db.create_table(
        "alt_v",
        ms.Schema({"id": ms.UInt64(), "vec": ms.FloatVector(8)}),
    )
    t.insert({"id": np.arange(4, dtype=np.uint64),
              "vec": np.zeros((4, 8), np.float32)})
    with pytest.raises(SchemaError):
        db.sql("ALTER TABLE alt_v DROP COLUMN vec")
