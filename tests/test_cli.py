"""CLI parity tests for ``python -m delta_rs_spark inspect`` (reference:
rust/src/bin/delta-inspect.rs:15-64 — `info` and `files` subcommands)."""

import json

from delta_rs_spark.__main__ import main


def test_inspect_info(golden, capsys):
    assert main(["inspect", "info", golden("simple_table")]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["version"] == 4
    assert info["numFiles"] == 5
    assert info["minReaderVersion"] == 1
    assert info["minWriterVersion"] == 2
    assert info["schema"]["type"] == "struct"


def test_inspect_files_latest_and_versioned(golden, capsys):
    path = golden("simple_table")
    assert main(["inspect", "files", path]) == 0
    latest = capsys.readouterr().out.splitlines()
    assert len(latest) == 5

    assert main(["inspect", "files", path, "-v", "2"]) == 0
    v2 = capsys.readouterr().out.splitlines()
    assert len(v2) == 6
    assert all(f.endswith(".snappy.parquet") for f in v2)


def test_inspect_files_full_uri(golden, capsys):
    path = golden("delta-0.8.0-partitioned")
    assert main(["inspect", "files", path, "--full-uri"]) == 0
    uris = capsys.readouterr().out.splitlines()
    assert len(uris) == 6
    assert all(u.startswith(path) for u in uris)
    assert all("year=" in u for u in uris)
