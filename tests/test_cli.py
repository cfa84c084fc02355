"""CLI client (programs/client analogue): formats, statement splitting,
local one-shot mode, and remote mode against HttpFrontend /sql."""

import io
import json
import sys

import numpy as np
import pytest

from myscaledb_tpu import cli


def test_split_statements():
    s = "CREATE TABLE t (x UInt64); INSERT INTO t VALUES ('a;b'); SELECT 1"
    parts = cli.split_statements(s)
    assert len(parts) == 3
    assert parts[1] == "INSERT INTO t VALUES ('a;b')"


def test_formats():
    rows = [{"a": 1, "b": "x"}, {"a": 2.5, "b": "y"}]
    pretty = cli.format_pretty(rows)
    assert "a" in pretty and "2.5" in pretty and "(2 rows)" in pretty
    jr = cli.format_json_each_row(rows).splitlines()
    assert json.loads(jr[0]) == {"a": 1, "b": "x"}
    tsv = cli.FORMATS["TSV"](rows).splitlines()
    assert tsv[0] == "a\tb" and tsv[1] == "1\tx"
    csv = cli.FORMATS["CSV"](rows).splitlines()
    assert csv[2] == "2.5,y"
    assert cli.format_pretty([]) == "Ok. (0 rows)"


def test_local_oneshot(capsys, monkeypatch, tmp_path):
    rc = cli.main(
        [
            "-q",
            "CREATE TABLE cli_t (id UInt64, v Float32)",
            "-q",
            "INSERT INTO cli_t VALUES (1, 1.5), (2, 2.5)",
            "-q",
            "SELECT id, v FROM cli_t ORDER BY id",
            "--format",
            "JSONEachRow",
        ]
    )
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rows = [json.loads(l) for l in out]
    assert {"id": 1, "v": 1.5} in rows and {"id": 2, "v": 2.5} in rows


def test_local_error_exit_code(capsys):
    rc = cli.main(["-q", "SELECT FROM nowhere !!"])
    assert rc == 1
    assert "Error" in capsys.readouterr().err


def test_remote_mode(capsys, db):
    from myscaledb_tpu.service.server import HttpFrontend

    front = HttpFrontend(db, port=0)
    try:
        db.sql("CREATE TABLE cli_r (id UInt64)")
        db.sql("INSERT INTO cli_r VALUES (7)")
        rc = cli.main(
            [
                "--host", "127.0.0.1", "--port", str(front.port),
                "-q", "SELECT id FROM cli_r",
                "--format", "JSONEachRow",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert json.loads(out[0]) == {"id": 7}
    finally:
        front.httpd.shutdown()
        front.server.close()
