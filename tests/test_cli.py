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


def test_inspect_history(golden, capsys):
    assert main(["inspect", "history", golden("simple_table"), "-n", "2"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 2
    assert all(isinstance(json.loads(ln), dict) for ln in lines)


def test_vacuum_cli_dry_run(golden, capsys):
    # golden table has tombstones well past retention; dry-run lists them
    # without touching anything
    assert main(["vacuum", golden("simple_table")]) == 0
    out = capsys.readouterr().out.splitlines()
    assert all(p and not p.startswith("_delta_log") for p in out)


def test_vacuum_cli_retention_guard(golden, capsys):
    # a refused vacuum is a clean one-line error + exit 2, not a traceback
    assert main(["vacuum", golden("simple_table"), "--retention-hours", "1"]) == 2
    assert "vacuum refused" in capsys.readouterr().err


def test_inspect_detail(golden, capsys):
    assert main(["inspect", "detail", golden("simple_table")]) == 0
    d = json.loads(capsys.readouterr().out)
    assert d["format"] == "delta" and d["numFiles"] == 5 and d["version"] == 4


def test_inspect_dv(spark, tmp_path, capsys):
    from delta_rs_spark.writer import write_deltalake

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, val string"
    ).coalesce(1)
    t = write_deltalake(
        spark, df, str(tmp_path),
        configuration={"delta.enableDeletionVectors": "true"},
    )
    t.delete(spark, "id % 10 = 0")
    capsys.readouterr()

    assert main(["inspect", "dv", str(tmp_path)]) == 0
    cap = capsys.readouterr()
    lines = [json.loads(l) for l in cap.out.splitlines()]
    assert len(lines) == 1
    assert lines[0]["cardinality"] == 10
    assert lines[0]["storageType"] in ("u", "i", "p")
    assert lines[0]["physicalRows"] == 100 and lines[0]["liveRows"] == 90
    summary = json.loads(cap.err)
    assert summary["numFilesWithDV"] == 1
    assert summary["totalDeletedRows"] == 10
    assert summary["liveRows"] == 90


def test_inspect_dv_clean_table(golden, capsys):
    assert main(["inspect", "dv", golden("simple_table")]) == 0
    cap = capsys.readouterr()
    assert cap.out == ""
    assert json.loads(cap.err)["numFilesWithDV"] == 0


def test_inspect_protocol(spark, tmp_path, capsys):
    import json as _json

    from delta_rs_spark import write_deltalake
    from delta_rs_spark.__main__ import main

    uri = str(tmp_path / "t")
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    write_deltalake(
        spark, df, uri, configuration={"delta.enableInCommitTimestamps": "true"}
    )
    assert main(["inspect", "protocol", uri]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["minWriterVersion"] == 7
    assert "inCommitTimestamp" in out["writerFeatures"]
    assert out["featureProperties"]["delta.enableInCommitTimestamps"] == "true"


def test_inspect_checksum(spark, tmp_path, capsys):
    import os

    from delta_rs_spark import write_deltalake

    uri = str(tmp_path / "t")
    write_deltalake(spark, spark.range(3).selectExpr("id"), uri)
    write_deltalake(spark, spark.range(3).selectExpr("id"), uri, mode="append")
    assert main(["inspect", "checksum", uri]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["valid"] is True
    crc = os.path.join(uri, "_delta_log", f"{1:020d}.crc")
    j = json.loads(open(crc).read())
    j["tableSizeBytes"] += 1
    with open(crc, "w") as f:
        f.write(json.dumps(j))
    assert main(["inspect", "checksum", uri]) == 1
    out = json.loads(capsys.readouterr().out.strip())
    assert out["valid"] is False and "tableSizeBytes" in out["error"]


def test_inspect_iceberg(spark, tmp_path, capsys):
    from delta_rs_spark import DeltaTable, write_deltalake

    uri = str(tmp_path / "t")
    write_deltalake(spark, spark.createDataFrame([(1,), (2,)], "id int"), uri)
    # not UniForm yet -> exit 1, {"uniform": false}
    assert main(["inspect", "iceberg", uri]) == 1
    assert json.loads(capsys.readouterr().out) == {"uniform": False}

    DeltaTable(uri).enable_uniform()
    assert main(["inspect", "iceberg", uri]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["uniform"] is True
    assert out["liveRecords"] == 2
    assert out["deltaVersion"] == "1"  # the property commit itself
    assert out["snapshots"][0]["operation"] == "append"


def test_cli_clone_shallow_and_deep(spark, tmp_path, capsys):
    """`clone` is Spark-free: shallow writes only a log; --deep copies the
    data files and the result survives deleting the source."""
    import os
    import shutil

    from delta_rs_spark import DeltaTable, write_deltalake

    src = str(tmp_path / "src")
    write_deltalake(spark, spark.range(25).coalesce(1).selectExpr("id"), src)

    sh = str(tmp_path / "sh")
    assert main(["clone", src, sh]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["mode"] == "shallow"
    assert not [
        f for _, _, fs in os.walk(sh) for f in fs if f.endswith(".parquet")
    ]

    dp = str(tmp_path / "dp")
    assert main(["clone", src, dp, "--deep", "--version", "0"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["mode"] == "deep" and out["sourceVersion"] == 0
    shutil.rmtree(src)
    assert DeltaTable(dp).to_df(spark).count() == 25
