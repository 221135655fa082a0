"""``python -m delta_rs_spark`` — table inspection CLI.

Spark-free (pure protocol layer): loading a snapshot only replays the JSON
log / checkpoint on the driver, so inspection never needs a SparkSession.

Parity with the reference's ``delta-inspect`` binary
(``rust/src/bin/delta-inspect.rs:15-64``):

- ``inspect info <uri>``                    — dump table metadata
- ``inspect files <uri> [-v N] [--full-uri]`` — list active files, optionally
  at an exact version / as absolute URIs
"""

from __future__ import annotations

import argparse
import json
import sys

from .table import DeltaTable


def _cmd_info(args: argparse.Namespace) -> int:
    table = DeltaTable(args.uri)
    meta = table.metadata()
    min_reader, min_writer = table.protocol_versions()
    info = {
        "uri": args.uri,
        "version": table.version,
        "metadata": {
            "id": meta.id,
            "name": meta.name,
            "description": meta.description,
            "partitionColumns": meta.partition_columns,
            "createdTime": meta.created_time,
            "configuration": meta.configuration,
        },
        "minReaderVersion": min_reader,
        "minWriterVersion": min_writer,
        "numFiles": len(table.files()),
        "schema": table.schema_json(),
    }
    print(json.dumps(info, indent=2))
    return 0


def _cmd_files(args: argparse.Namespace) -> int:
    if args.version is not None:
        table = DeltaTable.for_version(args.uri, args.version)
    else:
        table = DeltaTable(args.uri)
    paths = table.file_uris() if args.full_uri else table.files()
    for p in paths:
        print(p)
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m delta_rs_spark", description="Delta table inspector"
    )
    sub = parser.add_subparsers(dest="tool", required=True)

    inspect = sub.add_parser("inspect", help="inspect a Delta table")
    isub = inspect.add_subparsers(dest="command", required=True)

    p_info = isub.add_parser("info", help="dump table metadata info")
    p_info.add_argument("uri", help="Table URI")
    p_info.set_defaults(func=_cmd_info)

    p_files = isub.add_parser(
        "files", help="output list of files for a given version, default to latest"
    )
    p_files.add_argument("uri", help="Table URI")
    p_files.add_argument("-f", "--full-uri", action="store_true", help="display full URIs")
    p_files.add_argument("-v", "--version", type=int, default=None, help="table version")
    p_files.set_defaults(func=_cmd_files)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
