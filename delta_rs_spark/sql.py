"""SQL entry point: the Delta SQL command surface over path tables.

``sql(spark, statement)`` accepts the statement forms Delta users type,
with tables addressed as ``delta.`/path/to/table```:

- ``SELECT ... FROM delta.`/p` [VERSION AS OF n | TIMESTAMP AS OF 'ts'] ...``
  — every delta.`...` reference becomes a snapshot DataFrame registered as a
  temp view; the rewritten query then runs on Spark SQL unchanged (joins,
  CTEs, aggregates — the full Catalyst surface).
- ``DELETE FROM delta.`/p` WHERE <predicate>``
- ``UPDATE delta.`/p` SET a = <expr>, b = <expr> WHERE <predicate>``
- ``DESCRIBE HISTORY delta.`/p``` / ``DESCRIBE DETAIL delta.`/p```
- ``SELECT ... FROM table_changes_by_path('/p', start [, end]) ...`` — the
  Delta CDF table-valued function: the change feed (table schema +
  ``_change_type`` + ``_commit_version``) as a queryable relation.
- ``COPY INTO delta.`/p` FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON|AVRO
  [PATTERN = '<glob>'] [FORCE = TRUE]`` — idempotent batch ingest; already-
  loaded files are skipped (registry rides the log as domainMetadata).
- ``VACUUM delta.`/p` [LITE] [RETAIN <n> HOURS] [DRY RUN]``
- ``OPTIMIZE delta.`/p` [WHERE p = 'v' [AND ...]] [ZORDER BY (a, b)]``
- ``REORG TABLE delta.`/p` [WHERE p = 'v' [AND ...]] APPLY (PURGE)`` —
  rewrite only DV-bearing / stale-narrow files (materialize soft deletes;
  prerequisite pass for DROP FEATURE deletionVectors / typeWidening).
- ``RESTORE delta.`/p` TO VERSION AS OF <n> | TO TIMESTAMP AS OF 'ts'``

- ``INSERT INTO delta.`/p` <select>`` / ``INSERT OVERWRITE delta.`/p`
  <select>`` — append / full overwrite of the query result.
- ``CREATE TABLE delta.`/p` [PARTITIONED BY (a, b)] AS <select>``
- ``CREATE TABLE delta.`/t` SHALLOW|DEEP CLONE delta.`/s` [VERSION AS OF n]``
  — zero-copy reference clone vs fully independent data copy (server-side
  object copies on S3/GCS/Azure).
- ``MERGE INTO delta.`/p` [AS] t USING (<subquery> | delta.`/p2`) [AS] s
  ON <cond>`` followed by any of: ``WHEN MATCHED THEN UPDATE SET a = e, …``
  or ``WHEN MATCHED THEN DELETE``; ``WHEN NOT MATCHED THEN INSERT *``;
  ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` — the standard Delta MERGE
  grammar restricted to one clause per kind (the API accepts the same).

- ``ALTER TABLE delta.`/p` ADD COLUMNS (a INT, b STRING)`` — metadata-only
  schema evolution; ``SET TBLPROPERTIES ('k'='v', …)`` /
  ``UNSET TBLPROPERTIES ('k', …)``; ``ADD CONSTRAINT n CHECK (<expr>)`` /
  ``DROP CONSTRAINT n``; ``RENAME COLUMN a TO b`` / ``DROP COLUMN a``
  (metadata-only; requires column mapping — see protocol/column_mapping.py).
- ``SHOW TBLPROPERTIES delta.`/p```
- ``CONVERT TO DELTA parquet.`/dir``` — in-place conversion, zero data movement
- ``GENERATE symlink_format_manifest FOR TABLE delta.`/p``` — Presto/Trino/
  Athena manifest tree, Spark-free

Relational statements return a DataFrame; commands return a one-row
DataFrame of their metrics (like Spark's own command output).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_TABLE_REF = re.compile(
    r"delta\.`([^`]+)`"
    r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?",
    re.IGNORECASE,
)


class SqlError(Exception):
    pass


def _open(uri: str, version: str | None, ts: str | None):
    from .table import DeltaTable

    if version is not None:
        return DeltaTable.for_version(uri, int(version))
    if ts is not None:
        return DeltaTable.for_timestamp(uri, ts)
    return DeltaTable(uri)


def _one_row(spark: SparkSession, d: dict[str, Any]) -> DataFrame:
    import json

    return spark.createDataFrame(
        [tuple(json.dumps(v) if isinstance(v, (dict, list)) else str(v) for v in d.values())],
        list(d.keys()),
    )


def sql(spark: SparkSession, statement: str) -> DataFrame:
    s = statement.strip().rstrip(";")
    head = s.split(None, 1)[0].upper() if s else ""

    if head in ("SELECT", "WITH"):
        return _select(spark, s)
    if head == "DELETE":
        return _delete(spark, s)
    if head == "UPDATE":
        return _update(spark, s)
    if head == "DESCRIBE":
        return _describe(spark, s)
    if head == "VACUUM":
        return _vacuum(spark, s)
    if head == "OPTIMIZE":
        return _optimize(spark, s)
    if head == "RESTORE":
        return _restore(spark, s)
    if head == "MERGE":
        return _merge(spark, s)
    if head == "INSERT":
        return _insert(spark, s)
    if head == "CREATE":
        return _create(spark, s)
    if head == "ALTER":
        return _alter(spark, s)
    if head == "CONVERT":
        return _convert(spark, s)
    if head == "SHOW":
        return _show(spark, s)
    if head == "TRUNCATE":
        m = _require(r"TRUNCATE\s+TABLE\s+delta\.`([^`]+)`$", s, "TRUNCATE")
        return _one_row(spark, _open(m.group(1), None, None).delete(spark))
    if head == "COPY":
        return _copy_into(spark, s)
    if head == "REORG":
        return _reorg(spark, s)
    if head == "GENERATE":
        m = _require(
            r"GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+delta\.`([^`]+)`$",
            s,
            "GENERATE",
        )
        return _one_row(spark, _open(m.group(1), None, None).generate())
    raise SqlError(f"unsupported statement: {head or statement!r}")


def _reorg(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"REORG\s+TABLE\s+delta\.`([^`]+)`(?:\s+WHERE\s+(.+?))?"
        r"\s+APPLY\s*\(\s*PURGE\s*\)$",
        s,
        "REORG",
    )
    pfilters = None
    if m.group(2):
        pfilters = []
        for term in re.split(r"\s+AND\s+", m.group(2), flags=re.IGNORECASE):
            tm = re.fullmatch(r"\s*(\w+)\s*=\s*'?([^']*?)'?\s*", term)
            if not tm:
                raise SqlError(
                    f"REORG WHERE supports only `col = value` conjunctions, got {term!r}"
                )
            pfilters.append((tm.group(1), "=", tm.group(2)))
    res = _open(m.group(1), None, None).reorg_purge(
        spark, partition_filters=pfilters
    )
    return _one_row(spark, res)


def _copy_into(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"COPY\s+INTO\s+delta\.`([^`]+)`\s+FROM\s+'([^']+)'\s+"
        r"FILEFORMAT\s*=\s*(\w+)"
        r"(?:\s+PATTERN\s*=\s*'([^']+)')?"
        r"(?:\s+FORCE\s*=\s*(TRUE|FALSE))?$",
        s,
        "COPY INTO",
    )
    from .ingest import copy_into

    res = copy_into(
        spark,
        m.group(1),
        m.group(2),
        file_format=m.group(3),
        pattern=m.group(4),
        force=(m.group(5) or "").upper() == "TRUE",
    )
    return _one_row(spark, res)


_TABLE_CHANGES_RE = re.compile(
    r"table_changes_by_path\s*\(\s*'([^']+)'\s*,\s*"
    r"(\d+|'[^']+')\s*(?:,\s*(\d+|'[^']+')\s*)?\)",
    re.IGNORECASE,
)


def _select(spark: SparkSession, s: str) -> DataFrame:
    import hashlib

    def replace(m: re.Match) -> str:
        uri, version, ts = m.group(1), m.group(2), m.group(3)
        key = f"{uri}@{version}@{ts}"
        view = "delta_v_" + hashlib.md5(key.encode()).hexdigest()[:12]
        _open(uri, version, ts).to_df(spark).createOrReplaceTempView(view)
        return view

    def replace_changes(m: re.Match) -> str:
        # Delta's CDF table-valued function for path tables:
        # table_changes_by_path('/p', start [, end]) — table schema plus
        # _change_type / _commit_version. Bounds are versions (integers)
        # or timestamps (quoted strings), mixable like Delta's own TVF.
        uri, start, end = m.group(1), m.group(2), m.group(3)
        key = f"cdf:{uri}@{start}@{end}"
        view = "delta_cdf_" + hashlib.md5(key.encode()).hexdigest()[:12]
        kwargs: dict = {}
        if start.startswith("'"):
            kwargs["starting_timestamp"] = start[1:-1]
        else:
            kwargs["starting_version"] = int(start)
        if end is not None:
            if end.startswith("'"):
                kwargs["ending_timestamp"] = end[1:-1]
            else:
                kwargs["ending_version"] = int(end)
        _open(uri, None, None).load_cdf(spark, **kwargs).createOrReplaceTempView(
            view
        )
        return view

    rewritten = _TABLE_CHANGES_RE.sub(replace_changes, s)
    rewritten = _TABLE_REF.sub(replace, rewritten)
    return spark.sql(rewritten)


def _require(pattern: str, s: str, what: str) -> re.Match:
    m = re.match(pattern, s, re.IGNORECASE | re.DOTALL)
    if not m:
        raise SqlError(f"cannot parse {what}: {s!r}")
    return m


def _delete(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"DELETE\s+FROM\s+delta\.`([^`]+)`(?:\s+WHERE\s+(.+))?$", s, "DELETE"
    )
    pred = m.group(2).strip() if m.group(2) else None
    res = _open(m.group(1), None, None).delete(spark, pred)
    return _one_row(spark, res)


def _split_assignments(text: str) -> dict[str, str]:
    """Split ``a = expr, b = expr`` on top-level commas (quote/paren aware)."""
    parts: list[str] = []
    depth = 0
    quote = None
    cur = []
    for ch in text:
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    out: dict[str, str] = {}
    for p in parts:
        if "=" not in p:
            raise SqlError(f"bad SET clause: {p.strip()!r}")
        k, v = p.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def _update(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"UPDATE\s+delta\.`([^`]+)`\s+SET\s+(.+?)\s+WHERE\s+(.+)$", s, "UPDATE"
    )
    assignments = _split_assignments(m.group(2))
    res = _open(m.group(1), None, None).update_where(
        spark, m.group(3).strip(), assignments
    )
    return _one_row(spark, res)


def _convert(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"CONVERT\s+TO\s+DELTA\s+(parquet|iceberg)\.`([^`]+)`$", s, "CONVERT TO DELTA"
    )
    if m.group(1).lower() == "iceberg":
        from .uniform import convert_iceberg_to_delta

        t = convert_iceberg_to_delta(spark, m.group(2))
    else:
        from .writer import convert_to_delta

        t = convert_to_delta(spark, m.group(2))
    return _one_row(
        spark,
        {
            "table": m.group(2),
            "sourceFormat": m.group(1).lower(),
            "numConvertedFiles": len(t.add_actions()),
            "partitionColumns": t.metadata().partition_columns,
        },
    )


_PROPS_RE = re.compile(r"'([^']+)'\s*(?:=\s*'([^']*)')?")


def _alter(spark: SparkSession, s: str) -> DataFrame:
    m = _require(r"ALTER\s+TABLE\s+delta\.`([^`]+)`\s+(.+)$", s, "ALTER TABLE")
    table = _open(m.group(1), None, None)
    rest = m.group(2).strip()

    mm = re.match(r"ADD\s+COLUMNS?\s*\((.+)\)$", rest, re.IGNORECASE | re.DOTALL)
    if mm:
        cols = []
        for spec in _split_top_level(mm.group(1)):
            name, _, ctype = spec.strip().partition(" ")
            if not ctype:
                raise SqlError(f"cannot parse column spec: {spec!r}")
            cols.append((name.strip(), ctype.strip()))
        v = table.add_columns(cols)
        return _one_row(spark, {"version": v, "addedColumns": [c for c, _ in cols]})

    mm = re.match(r"SET\s+TBLPROPERTIES\s*\((.+)\)$", rest, re.IGNORECASE | re.DOTALL)
    if mm:
        props = {k: v if v is not None else "" for k, v in _PROPS_RE.findall(mm.group(1))}
        if not props:
            raise SqlError(f"cannot parse TBLPROPERTIES: {rest!r}")
        v = table.set_properties(props)
        return _one_row(spark, {"version": v, "properties": sorted(props)})

    mm = re.match(r"UNSET\s+TBLPROPERTIES\s*\((.+)\)$", rest, re.IGNORECASE | re.DOTALL)
    if mm:
        keys = [k for k, _ in _PROPS_RE.findall(mm.group(1))]
        v = table.unset_properties(keys)
        return _one_row(spark, {"version": v, "properties": keys})

    mm = re.match(
        r"ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)$", rest, re.IGNORECASE | re.DOTALL
    )
    if mm:
        v = table.add_constraint(spark, mm.group(1), mm.group(2).strip())
        return _one_row(spark, {"version": v, "constraint": mm.group(1)})

    mm = re.match(r"DROP\s+CONSTRAINT\s+(\w+)$", rest, re.IGNORECASE)
    if mm:
        v = table.drop_constraint(mm.group(1))
        return _one_row(spark, {"version": v, "constraint": mm.group(1)})

    mm = re.match(
        r"RENAME\s+COLUMN\s+([\w.]+)\s+TO\s+(\w+)$", rest, re.IGNORECASE
    )
    if mm:
        v = table.rename_column(mm.group(1), mm.group(2))
        return _one_row(
            spark, {"version": v, "oldName": mm.group(1), "newName": mm.group(2)}
        )

    mm = re.match(r"DROP\s+COLUMNS?\s*\(?\s*([\w.]+)\s*\)?$", rest, re.IGNORECASE)
    if mm:
        v = table.drop_column(mm.group(1))
        return _one_row(spark, {"version": v, "column": mm.group(1)})

    mm = re.match(
        r"ALTER\s+COLUMN\s+([\w.]+)\s+SET\s+DEFAULT\s+(.+)$",
        rest,
        re.IGNORECASE | re.DOTALL,
    )
    if mm:
        v = table.set_column_default(mm.group(1), mm.group(2).strip())
        return _one_row(spark, {"version": v, "column": mm.group(1)})

    mm = re.match(
        r"ALTER\s+COLUMN\s+([\w.]+)\s+TYPE\s+(.+)$", rest, re.IGNORECASE
    )
    if mm:
        v = table.widen_column_type(mm.group(1), mm.group(2).strip())
        return _one_row(
            spark,
            {"version": v, "column": mm.group(1), "toType": mm.group(2).strip()},
        )

    mm = re.match(
        r"ALTER\s+COLUMN\s+([\w.]+)\s+DROP\s+DEFAULT$", rest, re.IGNORECASE
    )
    if mm:
        v = table.drop_column_default(mm.group(1))
        return _one_row(spark, {"version": v, "column": mm.group(1)})

    mm = re.match(
        r"DROP\s+FEATURE\s+([A-Za-z0-9_.]+)(\s+TRUNCATE\s+HISTORY)?$",
        rest,
        re.IGNORECASE,
    )
    if mm:
        v = table.drop_feature(mm.group(1), truncate_history=bool(mm.group(2)))
        return _one_row(spark, {"version": v, "droppedFeature": mm.group(1)})

    mm = re.match(r"SYNC\s+IDENTITY$", rest, re.IGNORECASE)
    if mm:
        marks = table.sync_identity()
        return _one_row(
            spark,
            {"version": table.version, "syncedColumns": sorted(marks)},
        )

    raise SqlError(f"unsupported ALTER TABLE clause: {rest!r}")


def _split_top_level(text: str) -> list[str]:
    """Split on commas not nested inside (), <>, or quotes — column specs
    like ``m map<string,int>`` must not split at the type's comma."""
    parts, depth, start, quote = [], 0, 0, None
    for i, ch in enumerate(text):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p for p in (p.strip() for p in parts) if p]


def _show(spark: SparkSession, s: str) -> DataFrame:
    m = re.match(
        r"^SHOW\s+CREATE\s+TABLE\s+delta\.`([^`]+)`$", s, re.IGNORECASE
    )
    if m:
        return _one_row(spark, {"createtab_stmt": _create_table_stmt(m.group(1))})
    m = _require(r"SHOW\s+TBLPROPERTIES\s+delta\.`([^`]+)`$", s, "SHOW TBLPROPERTIES")
    cfg = _open(m.group(1), None, None).metadata().configuration or {}
    return spark.createDataFrame(
        sorted((k, v) for k, v in cfg.items()) or [], "key string, value string"
    )


def _create_table_stmt(uri: str) -> str:
    """Reconstruct a CREATE TABLE statement (the DDL the column-definition
    parser accepts) from the table's schema metadata: types, NOT NULL,
    DEFAULT, identity, and generated-column declarations round-trip."""
    from .protocol import defaults as dfl
    from .protocol import generated as gen
    from .protocol import identity as idc

    table = _open(uri, None, None)
    meta = table.metadata()
    schema = table.schema()
    ids = idc.specs(schema)
    defs = dfl.defaults(schema)
    gens = gen.expressions(schema)

    cols = []
    for f in schema.fields:
        parts = [f.name, f.dataType.simpleString().upper()]
        if f.name in ids:
            spec = ids[f.name]
            kind = "BY DEFAULT" if spec.allow_explicit_insert else "ALWAYS"
            parts.append(
                f"GENERATED {kind} AS IDENTITY (START WITH {spec.start} "
                f"INCREMENT BY {spec.step})"
            )
        if f.name in gens:
            parts.append(f"GENERATED ALWAYS AS ({gens[f.name]})")
        if not f.nullable:
            parts.append("NOT NULL")
        if f.name in defs:
            parts.append(f"DEFAULT {defs[f.name]}")
        cols.append(" ".join(parts))
    stmt = "CREATE TABLE delta.`" + uri + "` (\n  " + ",\n  ".join(cols) + "\n)"
    if meta.partition_columns:
        stmt += "\nPARTITIONED BY (" + ", ".join(meta.partition_columns) + ")"
    cfg = meta.configuration or {}
    if cfg:
        props = ", ".join(f"'{k}'='{v}'" for k, v in sorted(cfg.items()))
        stmt += "\nTBLPROPERTIES (" + props + ")"
    return stmt


def _describe(spark: SparkSession, s: str) -> DataFrame:
    m = _require(r"DESCRIBE\s+(HISTORY|DETAIL)\s+delta\.`([^`]+)`$", s, "DESCRIBE")
    table = _open(m.group(2), None, None)
    if m.group(1).upper() == "DETAIL":
        return _one_row(spark, table.detail())
    import json

    entries = table.history()
    return spark.createDataFrame(
        [(e.get("timestamp"), e.get("operation"), json.dumps(e)) for e in entries],
        "timestamp long, operation string, commit_info string",
    )


def _vacuum(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"VACUUM\s+delta\.`([^`]+)`(\s+LITE)?(?:\s+RETAIN\s+(\d+)\s+HOURS)?"
        r"(\s+DRY\s+RUN)?$",
        s,
        "VACUUM",
    )
    hours = int(m.group(3)) if m.group(3) else 168
    dry = bool(m.group(4))
    removed = _open(m.group(1), None, None).vacuum(
        retention_hours=hours, dry_run=dry, lite=bool(m.group(2))
    )
    return spark.createDataFrame([(p,) for p in removed] or [], "path string")


def _optimize(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"OPTIMIZE\s+delta\.`([^`]+)`(?:\s+WHERE\s+(.+?))?"
        r"(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?$",
        s,
        "OPTIMIZE",
    )
    zorder = [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
    pfilters = None
    if m.group(2):
        # partition-scoped compaction: conjunction of col = 'value' terms
        pfilters = []
        for term in re.split(r"\s+AND\s+", m.group(2), flags=re.IGNORECASE):
            tm = re.fullmatch(r"\s*(\w+)\s*=\s*'?([^']*?)'?\s*", term)
            if not tm:
                raise SqlError(
                    f"OPTIMIZE WHERE supports only `col = value` conjunctions, got {term!r}"
                )
            pfilters.append((tm.group(1), "=", tm.group(2)))
    res = _open(m.group(1), None, None).optimize(
        spark, zorder_by=zorder, partition_filters=pfilters
    )
    return _one_row(spark, res)


def _restore(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"RESTORE\s+delta\.`([^`]+)`\s+TO\s+"
        r"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')$",
        s,
        "RESTORE",
    )
    target = int(m.group(2)) if m.group(2) is not None else m.group(3)
    res = _open(m.group(1), None, None).restore(target)
    return _one_row(spark, res)


_MERGE_HEAD = re.compile(
    r"MERGE\s+(?:(WITH\s+SCHEMA\s+EVOLUTION)\s+)?INTO\s+delta\.`([^`]+)`(?:\s+AS)?\s+(\w+)\s+"
    r"USING\s+(\((?:[^()]|\([^()]*\))*\)|delta\.`[^`]+`)(?:\s+AS)?\s+(\w+)\s+"
    r"ON\s+(.+?)\s*(?=WHEN\s)",
    re.IGNORECASE | re.DOTALL,
)

_WHEN_CLAUSE = re.compile(
    r"WHEN\s+(MATCHED|NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED)\s+THEN\s+"
    r"(UPDATE\s+SET\s+.+?|DELETE|INSERT\s+\*)\s*(?=WHEN\s|$)",
    re.IGNORECASE | re.DOTALL,
)


def _merge(spark: SparkSession, s: str) -> DataFrame:
    m = _MERGE_HEAD.match(s)
    if not m:
        raise SqlError(f"cannot parse MERGE: {s!r}")
    evolution, target_uri, t_alias, source_text, s_alias, condition = m.groups()

    # source: subquery (any Spark SQL incl. delta.`...` refs) or a table ref
    if source_text.startswith("("):
        source = _select(spark, source_text[1:-1].strip())
    else:
        ref = _TABLE_REF.match(source_text)
        source = _open(ref.group(1), ref.group(2), ref.group(3)).to_df(spark)

    # normalize aliases to the API's t/s convention; two-phase through
    # placeholders so alias names 't'/'s' (or aliases equal to each other's
    # target) can't collide mid-rewrite
    def realias(expr: str) -> str:
        expr = re.sub(rf"\b{re.escape(t_alias)}\.", "\x00T\x00.", expr)
        expr = re.sub(rf"\b{re.escape(s_alias)}\.", "\x00S\x00.", expr)
        return expr.replace("\x00T\x00.", "t.").replace("\x00S\x00.", "s.")

    kw: dict[str, Any] = {"when_not_matched_insert": False}
    if evolution:
        kw["schema_evolution"] = True
    # every WHEN [NOT] MATCHED in the tail must parse — silently skipping
    # an unsupported clause form (conditional `WHEN MATCHED AND …`,
    # `INSERT (cols) VALUES (…)`) would execute a PARTIAL merge
    tail = s[m.end():]
    expected = len(
        re.findall(r"\bWHEN\s+(?:NOT\s+)?MATCHED\b", tail, re.IGNORECASE)
    )
    parsed_spans = list(_WHEN_CLAUSE.finditer(s, m.end()))
    if len(parsed_spans) != expected:
        raise SqlError(
            f"MERGE has {expected} WHEN clause(s) but only "
            f"{len(parsed_spans)} are in the supported forms (unconditional "
            "WHEN MATCHED THEN UPDATE SET …/DELETE, WHEN NOT MATCHED THEN "
            "INSERT *, WHEN NOT MATCHED BY SOURCE THEN DELETE); refusing "
            "to run a partial merge"
        )
    for wm in parsed_spans:
        kind = re.sub(r"\s+", " ", wm.group(1).upper())
        action = wm.group(2).strip()
        if kind == "MATCHED":
            if action.upper() == "DELETE":
                kw["when_matched_delete"] = True
            else:
                set_text = re.sub(r"(?i)^UPDATE\s+SET\s+", "", action)
                kw["when_matched_update"] = {
                    k.replace(f"{t_alias}.", ""): realias(v)
                    for k, v in _split_assignments(set_text).items()
                }
        elif kind == "NOT MATCHED":
            if action.upper() != "INSERT *":
                raise SqlError("only INSERT * is supported for WHEN NOT MATCHED")
            kw["when_not_matched_insert"] = True
        elif kind == "NOT MATCHED BY SOURCE":
            if action.upper() != "DELETE":
                raise SqlError("only DELETE is supported for WHEN NOT MATCHED BY SOURCE")
            kw["when_not_matched_by_source_delete"] = True

    table = _open(target_uri, None, None)
    res = table.merge(spark, source, realias(condition), **kw)
    return _one_row(spark, res)


def _insert(spark: SparkSession, s: str) -> DataFrame:
    m = _require(
        r"INSERT\s+(INTO|OVERWRITE)\s+delta\.`([^`]+)`\s+(.+)$", s, "INSERT"
    )
    from .writer import write_deltalake

    mode = "append" if m.group(1).upper() == "INTO" else "overwrite"
    df = _select(spark, m.group(3).strip())
    table = write_deltalake(spark, df, m.group(2), mode=mode)
    # row count comes from the commit's own metrics — the SELECT ran once
    metrics = (table.history(limit=1) or [{}])[0].get("operationMetrics", {})
    return _one_row(
        spark,
        {"numOutputRows": metrics.get("numOutputRows", ""), "version": table.version},
    )


def _create(spark: SparkSession, s: str) -> DataFrame:
    # CREATE [OR REPLACE] TABLE — the REPLACE form atomically overwrites an
    # existing table's data AND schema in one commit (time travel to the
    # pre-replace versions still works; the log is append-only)
    replace = bool(re.match(r"^CREATE\s+OR\s+REPLACE\b", s, re.IGNORECASE))
    if replace:
        s = re.sub(
            r"^CREATE\s+OR\s+REPLACE\s+TABLE\b",
            "CREATE TABLE",
            s,
            flags=re.IGNORECASE,
        )
    # clone form: CREATE TABLE delta.`t` SHALLOW|DEEP CLONE delta.`s`
    # [VERSION AS OF n] — metadata-only reference copy vs full data copy
    m = re.match(
        r"^CREATE\s+TABLE\s+delta\.`([^`]+)`\s+(SHALLOW|DEEP)\s+CLONE\s+"
        r"delta\.`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?$",
        s,
        re.IGNORECASE,
    )
    if m:
        if replace:
            raise SqlError("CREATE OR REPLACE ... CLONE is not supported")
        src = _open(m.group(3), None, None)
        version = int(m.group(4)) if m.group(4) else None
        if m.group(2).upper() == "SHALLOW":
            t = src.shallow_clone(m.group(1), version=version)
        else:
            t = src.deep_clone(m.group(1), version=version)
        return _one_row(spark, {"version": t.version, "location": m.group(1)})
    # column-DDL form: CREATE TABLE delta.`p` (col TYPE [modifiers], ...)
    # [PARTITIONED BY (...)] [TBLPROPERTIES (...)] — creates an EMPTY table
    # with IDENTITY / DEFAULT / NOT NULL / generated-column declarations
    m = re.match(
        r"^CREATE\s+TABLE\s+delta\.`([^`]+)`\s*\((.+?)\)"
        r"(?:\s+PARTITIONED\s+BY\s+\(([^)]+)\))?"
        r"(?:\s+TBLPROPERTIES\s*\((.+)\))?$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m and not re.search(r"\)\s+AS\s+", s, re.IGNORECASE):
        if replace:
            raise SqlError(
                "CREATE OR REPLACE with column DDL is not supported; use "
                "the AS SELECT form or drop and re-create"
            )
        return _create_from_ddl(spark, m)
    m = _require(
        r"CREATE\s+TABLE\s+delta\.`([^`]+)`"
        r"(?:\s+PARTITIONED\s+BY\s+\(([^)]+)\))?\s+AS\s+(.+)$",
        s,
        "CREATE TABLE",
    )
    from .protocol.log import DeltaLog
    from .writer import write_deltalake

    pcols = [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
    df = _select(spark, m.group(3).strip())
    uri = m.group(1)
    exists = DeltaLog(uri).latest_version() is not None
    if replace and exists:
        # PARTITIONED BY carries into the replace — omitting it here would
        # silently keep the OLD table's partitioning
        table = write_deltalake(
            spark,
            df,
            uri,
            mode="overwrite",
            schema_mode="overwrite",
            partition_by=pcols,
        )
    else:
        table = write_deltalake(spark, df, uri, mode="error", partition_by=pcols)
    return _one_row(spark, {"version": table.version, "location": uri})


_IDENTITY_COL_RE = re.compile(
    r"GENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
    r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+INCREMENT\s+BY\s+(-?\d+)\s*\))?",
    re.IGNORECASE,
)
_GENERATED_COL_RE = re.compile(
    r"GENERATED\s+ALWAYS\s+AS\s+\((.+)\)\s*$", re.IGNORECASE | re.DOTALL
)


def _create_from_ddl(spark: SparkSession, m: re.Match) -> DataFrame:
    from pyspark.sql import types as T

    from .writer import write_deltalake

    uri = m.group(1)
    pcols = [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
    props = (
        {k: v if v is not None else "" for k, v in _PROPS_RE.findall(m.group(4))}
        if m.group(4)
        else None
    )

    plain_fields: list[str] = []
    not_null: list[str] = []
    identity: dict[str, dict] = {}
    generated: dict[str, str] = {}
    defaults: dict[str, str] = {}
    for spec in _split_top_level(m.group(2)):
        spec = spec.strip()
        name, _, rest = spec.partition(" ")
        if not rest:
            raise SqlError(f"cannot parse column spec: {spec!r}")
        # the type is the leading token sequence up to the first modifier
        mm = _GENERATED_COL_RE.search(rest)
        if mm:
            generated[name] = mm.group(1).strip()
            rest = rest[: mm.start()].strip()
        mm = _IDENTITY_COL_RE.search(rest)
        if mm:
            identity[name] = {
                "allow_explicit_insert": mm.group(1).upper() != "ALWAYS",
                **(
                    {"start": int(mm.group(2)), "step": int(mm.group(3))}
                    if mm.group(2) is not None
                    else {}
                ),
            }
            rest = (rest[: mm.start()] + rest[mm.end():]).strip()
        # NOT NULL is stripped BEFORE the DEFAULT capture: "x STRING
        # DEFAULT 'a' NOT NULL" must not swallow NOT NULL into the expr
        if re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE):
            not_null.append(name)
            rest = re.sub(r"\bNOT\s+NULL\b", "", rest, flags=re.IGNORECASE).strip()
        mm = re.search(r"\bDEFAULT\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
        if mm:
            defaults[name] = mm.group(1).strip()
            rest = rest[: mm.start()].strip()
        ctype = rest.strip()
        if not ctype and name not in generated:
            raise SqlError(f"column {name!r} needs a type")
        if name not in identity and name not in generated:
            plain_fields.append(f"{name} {ctype}")
        elif name in generated and ctype:
            # generated column with an explicit type: cast rides the expr
            generated[name] = f"CAST(({generated[name]}) AS {ctype})"

    base = spark.createDataFrame([], ", ".join(plain_fields) if plain_fields else "")
    if not_null:
        schema = T.StructType(
            [
                T.StructField(f.name, f.dataType, f.name not in not_null, f.metadata)
                for f in base.schema.fields
            ]
        )
        base = spark.createDataFrame([], schema)

    table = write_deltalake(
        spark,
        base,
        uri,
        mode="error",
        partition_by=pcols,
        configuration=props,
        identity_columns=identity or None,
        generated_columns=generated or None,
        column_defaults=defaults or None,
    )
    return _one_row(spark, {"version": table.version, "location": uri})
