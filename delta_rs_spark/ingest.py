"""COPY INTO: idempotent batch file ingestion (public Delta SQL surface).

``COPY INTO delta.`/t` FROM '/data/landing' FILEFORMAT = PARQUET
[PATTERN = '*.parquet'] [FORCE = TRUE]`` loads source files into an
existing Delta table, skipping files that were already loaded — the
public contract that makes retrying a failed ingest job safe ("COPY INTO
is an idempotent operation: files that have already been loaded are
skipped").

Loaded-file tracking rides the log as a ``domainMetadata`` action
(domain ``delta.copyInto``): a JSON map of source path → {size, mtime}.
Domain metadata is reconciled state, so the registry survives
checkpoints and log truncation (unlike commitInfo provenance, which
expires with log retention) and is replaced atomically in the SAME
commit as the data — a crash between data and registry cannot happen.
Growth is one small entry per ingested file; a 100k-file ingest history
is a few MB of checkpoint, and ``FORCE = TRUE`` reloads regardless of
the registry without growing it twice. Skipping is by file path (the
public semantics): a source file replaced in-place with new content
under the same name is still skipped unless FORCE.
"""

from __future__ import annotations

import fnmatch
import json
import os
from typing import Any, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COPY_INTO_DOMAIN = "delta.copyInto"
_FORMATS = {"parquet", "csv", "json"}


class CopyIntoError(Exception):
    pass


def _list_source_files(source: str, pattern: Optional[str]) -> list[str]:
    if not os.path.isdir(source):
        if os.path.isfile(source):
            return [source]
        raise CopyIntoError(f"source {source!r} does not exist")
    out = []
    for dirpath, _dirs, files in os.walk(source):
        for f in files:
            if f.startswith((".", "_")):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), source)
            if pattern and not fnmatch.fnmatch(rel, pattern) and not fnmatch.fnmatch(f, pattern):
                continue
            out.append(os.path.join(dirpath, f))
    return sorted(out)


def _registry(table) -> dict[str, Any]:
    raw = table.snapshot.state.domain_metadata.get(COPY_INTO_DOMAIN)
    return json.loads(raw) if raw else {}


def copy_into(
    spark: SparkSession,
    table_uri: str,
    source: str,
    file_format: str = "parquet",
    pattern: Optional[str] = None,
    force: bool = False,
) -> dict[str, Any]:
    """Load new files from ``source`` into the table at ``table_uri``.

    Returns Delta-shaped metrics: num_affected_rows, num_inserted_rows,
    numFilesLoaded, numFilesSkipped. The table must already exist (the
    public COPY INTO contract targets an existing table); incoming
    columns are cast to the table schema by name and must cover every
    column the writer cannot fill itself (DEFAULT, identity and generated
    columns are assigned on write).

    Concurrency: the loaded-file registry is a whole-value domain replace,
    so this commit declares a read on the domain — a concurrent COPY INTO
    that wins the race aborts this one (instead of this one silently
    clobbering the winner's registry entries, which would let ITS files be
    re-ingested later), and the loop below re-reads the merged registry and
    retries with only the still-unloaded files."""
    from .protocol.actions import DomainMetadataAction, upgraded_protocol
    from .table import DeltaTable
    from .transactions import ConcurrentDomainMetadataError
    from .writer import write_deltalake

    fmt = file_format.lower()
    if fmt not in _FORMATS:
        raise CopyIntoError(
            f"FILEFORMAT {file_format!r} not supported; one of {sorted(_FORMATS)}"
        )
    matched = _list_source_files(source, pattern)

    attempts = 0
    while True:
        attempts += 1
        table = DeltaTable(table_uri)
        schema = table.schema()
        registry = _registry(table)
        new_files = [p for p in matched if force or p not in registry]
        skipped = len(matched) - len(new_files)
        if not new_files:
            return {
                "num_affected_rows": 0,
                "num_inserted_rows": 0,
                "numFilesLoaded": 0,
                "numFilesSkipped": skipped,
            }

        reader = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            # text formats have no embedded types: the table schema IS the
            # schema (writer-assigned columns are filled after the read)
            import pyspark.sql.types as _T

            assigned = _writer_assigned_columns(schema)
            read_schema = _T.StructType(
                [f for f in schema.fields if f.name not in assigned]
            )
            reader = reader.schema(read_schema)
            if fmt == "csv":
                reader = reader.option("header", "true")
        df = reader.load(new_files)
        missing = set(schema.names) - set(df.columns)
        hard_missing = missing - _writer_assigned_columns(schema)
        if hard_missing:
            raise CopyIntoError(
                f"source files lack required columns {sorted(hard_missing)}"
            )
        types = {f.name: f.dataType for f in schema.fields}
        df = df.select(
            *[
                F.col(c).cast(types[c]).alias(c)
                for c in schema.names
                if c in df.columns
            ]
        )

        merged = dict(registry)
        for p in new_files:
            st = os.stat(p)
            merged[p] = {"size": st.st_size, "mtime": int(st.st_mtime)}
        extra: list = [
            DomainMetadataAction(
                domain=COPY_INTO_DOMAIN,
                configuration=json.dumps(
                    merged, sort_keys=True, separators=(",", ":")
                ),
            )
        ]
        # writers may only emit domainMetadata when the table advertises the
        # feature — first COPY INTO carries the bump
        if "domainMetadata" not in (table.snapshot.state.writer_features or []):
            bump = upgraded_protocol(
                table.snapshot.state, 1, 7, writer_features=["domainMetadata"]
            )
            if bump is not None:
                extra.insert(0, bump)
        try:
            t2 = write_deltalake(
                spark,
                df,
                table_uri,
                mode="append",
                partition_by=table.metadata().partition_columns or None,
                extra_actions=extra,
                read_domains=[COPY_INTO_DOMAIN],
                operation="COPY INTO",
                operation_parameters_extra={
                    "source": source,
                    "fileFormat": fmt,
                    **({"pattern": pattern} if pattern else {}),
                    **({"force": "true"} if force else {}),
                    "numSourceFiles": str(len(new_files)),
                },
            )
        except ConcurrentDomainMetadataError:
            if attempts >= 10:
                raise
            continue  # re-read the merged registry, reload the remainder
        # row count from the committed adds' footer stats — no second scan
        commit = t2.log.try_read_commit(t2.version) or []
        from .protocol.actions import AddAction

        n_rows = sum(
            a.num_records or 0 for a in commit if isinstance(a, AddAction)
        )
        return {
            "num_affected_rows": n_rows,
            "num_inserted_rows": n_rows,
            "numFilesLoaded": len(new_files),
            "numFilesSkipped": skipped,
        }


def _writer_assigned_columns(schema) -> set[str]:
    """Columns the writer fills when the source omits them: DEFAULTs,
    identity columns (GENERATED ALWAYS must in fact be omitted), and
    generated columns."""
    from .protocol import defaults as _dfl
    from .protocol import generated as _gen
    from .protocol import identity as _idc

    return (
        set(_dfl.defaults(schema))
        | set(_idc.specs(schema))
        | set(_gen.expressions(schema))
    )
