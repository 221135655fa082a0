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
_FORMATS = {"parquet", "csv", "json", "avro"}


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

        if fmt == "avro":
            df = _read_avro(spark, new_files, schema)
            reader = None
        else:
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
        if reader is not None:
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


def _avro_header_schema(path: str) -> dict:
    """Writer schema from an Avro OCF header — reads ONLY the header
    (magic + metadata map), never the data blocks, so the driver-side
    schema probe is one bounded read however large the file is."""
    from .uniform.avro import MAGIC, read_bytes, read_long

    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise CopyIntoError(f"{path}: not an Avro object container file")
        meta: dict[str, bytes] = {}
        while True:
            n = read_long(fh)
            if n == 0:
                break
            if n < 0:
                read_long(fh)
                n = -n
            for _ in range(n):
                k = read_bytes(fh).decode("utf-8")
                meta[k] = read_bytes(fh)
    return json.loads(meta["avro.schema"])


def _avro_logical(ftype) -> tuple[Optional[str], int]:
    """(logicalType, decimal scale) of an Avro field type, unwrapping a
    nullable union."""
    if isinstance(ftype, list):
        branches = [b for b in ftype if b != "null"]
        ftype = branches[0] if branches else "null"
    if isinstance(ftype, dict):
        return ftype.get("logicalType"), int(ftype.get("scale", 0) or 0)
    return None, 0


def _avro_canon(ftype):
    """Canonical (base type, logicalType, decimal scale[, nested...]) of an
    Avro field type, unwrapping a nullable union — the decode-relevant
    identity of a field. Two files whose fields differ in any component
    decode DIFFERENTLY (timestamp-millis vs -micros is a silent 1000x; a
    decimal scale change mis-scales every value), so ingest compares these
    and fails loudly on drift instead of applying the first file's decode
    map. Complex types carry their element identity recursively: an array
    whose ITEM type drifted (e.g. items int -> string) is just as much a
    decode change as a top-level drift, and without the recursion it would
    only surface later — and less clearly — at Arrow conversion."""
    if isinstance(ftype, list):
        branches = [b for b in ftype if b != "null"]
        ftype = branches[0] if branches else "null"
    if isinstance(ftype, dict):
        base = str(ftype.get("type", "record"))
        head = (base, ftype.get("logicalType"), int(ftype.get("scale", 0) or 0))
        if base == "array":
            return head + (_avro_canon(ftype.get("items", "null")),)
        if base == "map":
            return head + (_avro_canon(ftype.get("values", "null")),)
        if base == "record":
            return head + tuple(
                (f["name"], _avro_canon(f["type"]))
                for f in ftype.get("fields", [])
            )
        return head
    return str(ftype), None, 0


# Avro-legal promotions (Avro spec §Schema Resolution) that decode correctly
# file-by-file — read_container decodes each file with its OWN embedded
# schema, so int/long (or float/double) files yield correct Python values
# either way; the only requirement is that the TABLE column is the wide type
# so every file's values fit. Keyed by the wide Spark type name.
_AVRO_WIDENING_FAMILIES = {
    "long": {"int", "long"},
    "double": {"int", "long", "float", "double"},
}


def _avro_drift_ok(first, this, table_type) -> bool:
    """True when two differing canonical identities are an Avro-legal
    numeric widening pair that still fits the table column — allowed in
    either file order (the first file seen may be the narrow OR the wide
    one). Logical types never qualify: a timestamp/decimal drift changes
    meaning, not just width."""
    if first == this:
        return True
    if len(first) != 3 or len(this) != 3:
        return False
    (base_a, lt_a, _), (base_b, lt_b, _) = first, this
    if lt_a is not None or lt_b is not None:
        return False
    family = _AVRO_WIDENING_FAMILIES.get(table_type.typeName())
    return family is not None and base_a in family and base_b in family


def _read_avro(spark: SparkSession, files: list[str], table_schema):
    """Distributed Avro OCF ingest built on the repo's own pure-Python OCF
    reader (``uniform/avro.py`` — the decoder cross-validated against the
    Apache Avro Java reference reader): ``binaryFile`` partitions the file
    list across executors, each file decodes inside ``mapInPandas`` and
    returns an Arrow batch typed to the TABLE schema.

    Spark itself cannot read Avro without the external spark-avro jar;
    routing the decode through the existing OCF reader keeps COPY INTO
    FILEFORMAT = AVRO dependency-free. Logical types arrive as raw
    primitives and are converted here: date (int days), timestamp-millis/
    micros (long), decimal (big-endian bytes + scale). Parallelism is one
    task per file (ingest-shaped: many landing files); the per-byte decode
    is Python-speed, so the scale path for bulk history loads remains
    parquet — this is the "accept whatever the upstream lands" format
    door, same as CSV/JSON.
    """
    import pyspark.sql.types as _T

    avro_schema = _avro_header_schema(files[0])
    if avro_schema.get("type") != "record":
        raise CopyIntoError(
            f"top-level Avro type must be a record, got {avro_schema.get('type')!r}"
        )
    avro_fields = {f["name"]: f["type"] for f in avro_schema.get("fields", [])}
    # nullable on the wire regardless of the table's nullability: the Arrow
    # batch must be able to CARRY a null so the writer's NOT NULL invariant
    # scan can reject it with the proper error (instead of an executor
    # crash materializing the batch)
    out_fields = [
        _T.StructField(f.name, f.dataType, True)
        for f in table_schema.fields
        if f.name in avro_fields
    ]
    out_schema = _T.StructType(out_fields)
    logicals = {n: _avro_logical(t) for n, t in avro_fields.items()}
    canon = {n: _avro_canon(t) for n, t in avro_fields.items()}
    table_types = {f.name: f.dataType for f in out_fields}
    def _convert(name: str, values: list):
        import datetime as _dt
        import decimal as _decimal

        def _instant(delta: _dt.timedelta) -> _dt.datetime:
            # Avro timestamp-millis/micros are UTC INSTANTS: decode them as
            # tz-AWARE UTC datetimes so the Arrow conversion carries the
            # instant explicitly — a naive datetime would be reinterpreted
            # relative to the session/JVM zone and silently shift every
            # value when copy_into runs in a non-UTC session
            # (local-timestamp-* stays naive: wall-clock by definition)
            return _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + delta

        lt, scale = logicals.get(name, (None, 0))
        if lt == "date":
            epoch = _dt.date(1970, 1, 1)
            return [
                None if v is None else epoch + _dt.timedelta(days=v)
                for v in values
            ]
        if lt == "timestamp-micros":
            return [
                None if v is None else _instant(_dt.timedelta(microseconds=v))
                for v in values
            ]
        if lt == "timestamp-millis":
            return [
                None if v is None else _instant(_dt.timedelta(milliseconds=v))
                for v in values
            ]
        if lt == "local-timestamp-micros":
            epoch = _dt.datetime(1970, 1, 1)
            return [
                None if v is None else epoch + _dt.timedelta(microseconds=v)
                for v in values
            ]
        if lt == "local-timestamp-millis":
            epoch = _dt.datetime(1970, 1, 1)
            return [
                None if v is None else epoch + _dt.timedelta(milliseconds=v)
                for v in values
            ]
        if lt == "decimal":
            q = _decimal.Decimal(10) ** -scale
            return [
                None
                if v is None
                else _decimal.Decimal(
                    int.from_bytes(v, "big", signed=True)
                ).scaleb(-scale).quantize(q)
                for v in values
            ]
        return values

    col_names = [f.name for f in out_fields]

    def _decode(iterator):
        import pandas as pd

        from .uniform.avro import read_container

        for pdf in iterator:
            for blob in pdf["content"]:
                fschema, _, records = read_container(bytes(blob))
                # the ingest schema came from the FIRST file: a later file
                # missing one of its fields must fail loudly, not null-fill
                ftypes = {
                    f["name"]: f["type"] for f in fschema.get("fields", [])
                }
                lacking = [n for n in col_names if n not in ftypes]
                if lacking:
                    raise ValueError(
                        f"Avro source file lacks ingested column(s) {lacking}"
                        " present in the first file's schema"
                    )
                # ...and a column whose TYPE drifted (base, logicalType, or
                # decimal scale — recursively through array items / map
                # values / record fields) would silently decode wrong under
                # the first file's logical-type map — same loud-failure
                # contract. Avro-legal numeric widenings (int<->long,
                # float<->double) that fit the table column are NOT drift:
                # each file decodes with its own embedded schema, so both
                # widths yield correct values.
                drifted = {
                    n: (canon[n], _avro_canon(ftypes[n]))
                    for n in col_names
                    if not _avro_drift_ok(
                        canon[n], _avro_canon(ftypes[n]), table_types[n]
                    )
                }
                if drifted:
                    detail = "; ".join(
                        f"{n}: first file {a}, this file {b}"
                        for n, (a, b) in sorted(drifted.items())
                    )
                    raise ValueError(
                        "Avro source file's column type(s) drifted from the "
                        f"first file's schema — {detail}"
                    )
                data = {
                    n: pd.Series(
                        _convert(n, [r.get(n) for r in records]), dtype="object"
                    )
                    for n in col_names
                }
                yield pd.DataFrame(data, columns=col_names)

    return (
        spark.read.format("binaryFile")
        .load(files)
        .select("content")
        .mapInPandas(_decode, schema=out_schema)
    )
