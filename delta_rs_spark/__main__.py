"""``python -m delta_rs_spark`` — table inspection CLI.

Spark-free (pure protocol layer): loading a snapshot only replays the JSON
log / checkpoint on the driver, so inspection never needs a SparkSession.

Parity with the reference's ``delta-inspect`` binary
(``rust/src/bin/delta-inspect.rs:15-64``):

- ``inspect info <uri>``                    — dump table metadata
- ``inspect files <uri> [-v N] [--full-uri]`` — list active files, optionally
  at an exact version / as absolute URIs

Beyond the reference binary (still Spark-free):

- ``inspect history <uri> [-n N]``   — commitInfo provenance, newest first
- ``inspect dv <uri>``               — deletion-vector summary (per DV'd
  file cardinality/bytes + table totals; never decodes bitmaps)
- ``vacuum <uri> [--retention-hours H] [--no-dry-run]`` — list/delete
  unreferenced files (168h guard, dry-run by default, like the API)
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


def _cmd_detail(args: argparse.Namespace) -> int:
    print(json.dumps(DeltaTable(args.uri).detail(), indent=2))
    return 0


def _cmd_history(args: argparse.Namespace) -> int:
    table = DeltaTable(args.uri)
    for entry in table.history(limit=args.limit):
        print(json.dumps(entry, separators=(",", ":")))
    return 0


def _cmd_iceberg(args: argparse.Namespace) -> int:
    """UniForm summary: walk the Iceberg metadata tree the way a foreign
    reader would (version-hint -> metadata.json -> manifest list ->
    manifests) and report snapshots + the live file census. Spark-free;
    bounded by metadata size, never data size."""
    from .protocol.storage import parse_table_uri
    from .uniform import read_file_list

    from .uniform import read_delete_files

    root, backend = parse_table_uri(args.uri)
    mdir = backend.join(root, "metadata")
    # bounded retry: the three tree walks below (metadata + file census +
    # delete census) must describe the SAME metadata version, or a
    # concurrent UniForm sync yields a self-contradictory report
    for _attempt in range(3):
        try:
            hint = int(
                backend.get_obj(backend.join(mdir, "version-hint.text")).decode()
            )
        except (FileNotFoundError, ValueError):
            # genuinely absent/unreadable hint = not a UniForm table;
            # transient backend errors propagate loudly instead
            print(json.dumps({"uniform": False}))
            return 1
        md = json.loads(backend.get_obj(backend.join(mdir, f"v{hint}.metadata.json")))
        files = read_file_list(root, backend=backend)
        deletes = read_delete_files(root, backend=backend)
        try:
            hint_after = int(
                backend.get_obj(backend.join(mdir, "version-hint.text")).decode()
            )
        except (FileNotFoundError, ValueError):
            hint_after = -1
        if hint_after == hint:
            break  # consistent snapshot of the tree
    print(
        json.dumps(
            {
                "uniform": True,
                "metadataVersion": hint,
                "tableUuid": md["table-uuid"],
                "currentSnapshotId": md["current-snapshot-id"],
                "lastSequenceNumber": md["last-sequence-number"],
                "deltaVersion": md["properties"].get("delta-version"),
                "snapshots": [
                    {
                        "id": s["snapshot-id"],
                        "operation": s["summary"].get("operation"),
                        "deltaVersion": s["summary"].get("delta-version"),
                    }
                    for s in md.get("snapshots", [])
                ],
                "liveFiles": len(files),
                "liveRecords": sum(f["record_count"] for f in files),
                "positionDeleteFiles": len(deletes),
                "deletedRecords": sum(d["record_count"] for d in deletes),
            },
            indent=2,
        )
    )
    return 0


def _cmd_protocol(args: argparse.Namespace) -> int:
    """Protocol summary: versions, feature lists, and the feature-bearing
    table properties — what a foreign engine needs to know before opening.
    Spark-free, O(1) driver work."""
    table = DeltaTable(args.uri)
    state = table.snapshot.state
    cfg = table.metadata().configuration or {}
    feature_props = {
        k: v
        for k, v in sorted(cfg.items())
        if k.startswith(("delta.enable", "delta.feature.", "delta.checkpointPolicy",
                         "delta.appendOnly", "delta.columnMapping"))
    }
    print(
        json.dumps(
            {
                "minReaderVersion": state.min_reader_version,
                "minWriterVersion": state.min_writer_version,
                "readerFeatures": sorted(state.reader_features or []),
                "writerFeatures": sorted(state.writer_features or []),
                "featureProperties": feature_props,
            },
            indent=2,
        )
    )
    return 0


def _cmd_checksum(args: argparse.Namespace) -> int:
    """Validate the snapshot's replayed state against the stored version
    checksum (``{version}.crc``). Exit 0 on match or when no checksum
    exists (reported), 1 on divergence — scriptable integrity probe."""
    from .maintenance import ChecksumMismatchError

    table = DeltaTable(args.uri)
    try:
        ok = table.validate_checksum()
    except ChecksumMismatchError as e:
        print(json.dumps({"version": table.version, "valid": False,
                          "checksumPresent": True, "error": str(e)}))
        return 1
    # no .crc = nothing to validate: not "invalid", simply unknown —
    # a script keying on .valid must not flag a healthy crc-less table
    print(json.dumps({
        "version": table.version,
        "valid": True if ok else None,
        "checksumPresent": bool(ok),
    }))
    return 0


def _cmd_dv(args: argparse.Namespace) -> int:
    """Deletion-vector summary: one line per DV'd file + a totals object.

    Spark-free — descriptors come straight from the snapshot's add actions;
    nothing reads the bitmaps, so this is O(#DV'd files) driver work even on
    a 100 TB table."""
    table = DeltaTable(args.uri)
    dv_adds = [a for a in table.add_actions() if a.deletion_vector]
    total_card = 0
    total_bytes = 0
    for a in sorted(dv_adds, key=lambda a: a.path):
        d = a.deletion_vector
        card = int(d.get("cardinality", 0))
        size = int(d.get("sizeInBytes", 0))
        total_card += card
        total_bytes += size
        print(
            json.dumps(
                {
                    "path": a.path,
                    "storageType": d.get("storageType"),
                    "cardinality": card,
                    "sizeInBytes": size,
                    "physicalRows": a.num_records,
                    "liveRows": a.logical_records,
                },
                separators=(",", ":"),
            )
        )
    summary = {
        "numFiles": len(table.files()),
        "numFilesWithDV": len(dv_adds),
        "totalDeletedRows": total_card,
        "totalDVBytes": total_bytes,
        "liveRows": table.count_rows(),
    }
    print(json.dumps(summary, indent=2), file=sys.stderr)
    return 0


def _cmd_clone(args: argparse.Namespace) -> int:
    """Spark-free clone: shallow is metadata-only; deep copies every data /
    DV object through the storage backends (server-side on object stores)."""
    table = (
        DeltaTable.for_version(args.uri, args.version)
        if args.version is not None
        else DeltaTable(args.uri)
    )
    # the clone helpers take the version explicitly; for_version above only
    # validates it exists before any copying starts
    if args.deep:
        t = table.deep_clone(args.target, version=args.version)
    else:
        t = table.shallow_clone(args.target, version=args.version)
    h = t.history(limit=1)[0]
    print(
        json.dumps(
            {
                "location": args.target,
                "mode": "deep" if args.deep else "shallow",
                "sourceVersion": h["operationParameters"]["sourceVersion"],
                "numClonedFiles": h["operationMetrics"]["numClonedFiles"],
            },
            indent=2,
        )
    )
    return 0


def _cmd_vacuum(args: argparse.Namespace) -> int:
    from .maintenance import VacuumError

    table = DeltaTable(args.uri)
    dry = not args.no_dry_run
    try:
        removed = table.vacuum(
            retention_hours=args.retention_hours, dry_run=dry, lite=args.lite
        )
    except VacuumError as e:
        print(f"vacuum refused: {e}", file=sys.stderr)
        return 2
    for p in removed:
        print(p)
    print(
        f"{'would delete' if dry else 'deleted'} {len(removed)} files",
        file=sys.stderr,
    )
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

    p_det = isub.add_parser("detail", help="DESCRIBE DETAIL summary from the log")
    p_det.add_argument("uri", help="Table URI")
    p_det.set_defaults(func=_cmd_detail)

    p_hist = isub.add_parser("history", help="commitInfo provenance, newest first")
    p_hist.add_argument("uri", help="Table URI")
    p_hist.add_argument("-n", "--limit", type=int, default=None, help="max entries")
    p_hist.set_defaults(func=_cmd_history)

    p_dv = isub.add_parser(
        "dv", help="deletion-vector summary (per DV'd file + totals)"
    )
    p_dv.add_argument("uri", help="Table URI")
    p_dv.set_defaults(func=_cmd_dv)

    p_proto = isub.add_parser(
        "protocol", help="protocol versions + feature lists"
    )
    p_proto.add_argument("uri", help="Table URI")
    p_proto.set_defaults(func=_cmd_protocol)

    p_ice = isub.add_parser(
        "iceberg", help="UniForm Iceberg metadata summary (foreign-reader walk)"
    )
    p_ice.add_argument("uri")
    p_ice.set_defaults(func=_cmd_iceberg)

    p_crc = isub.add_parser(
        "checksum", help="validate state against the version .crc"
    )
    p_crc.add_argument("uri", help="Table URI")
    p_crc.set_defaults(func=_cmd_checksum)

    p_clone = sub.add_parser(
        "clone", help="clone a table (shallow: metadata-only; --deep: full copy)"
    )
    p_clone.add_argument("uri", help="Source table URI")
    p_clone.add_argument("target", help="Target table URI")
    p_clone.add_argument(
        "--deep",
        action="store_true",
        help="copy data + DV files (server-side on object stores); "
        "default is a zero-copy shallow clone",
    )
    p_clone.add_argument(
        "--version", type=int, default=None, help="clone this source version"
    )
    p_clone.set_defaults(func=_cmd_clone)

    p_vac = sub.add_parser("vacuum", help="list/delete unreferenced files")
    p_vac.add_argument("uri", help="Table URI")
    p_vac.add_argument(
        "--retention-hours", type=int, default=168, help="retention floor (>=168)"
    )
    p_vac.add_argument(
        "--no-dry-run", action="store_true", help="actually delete (default: list only)"
    )
    p_vac.add_argument(
        "--lite",
        action="store_true",
        help="log-derived candidates only: no full table listing "
        "(untracked orphans are not cleaned)",
    )
    p_vac.set_defaults(func=_cmd_vacuum)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
