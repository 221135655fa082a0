"""Local stand-in for the driver's correctness gate: run a Spark query and its
DuckDB oracle over the same parquet tables, sort columns by name, sort rows,
and compare values exactly (with a tiny float tolerance fallback reported
separately so we know which queries rely on it)."""

from __future__ import annotations

import datetime as dt
import math
import os
from dataclasses import dataclass

import duckdb

from delta_rs_spark.sources.tables import TABLE_NAMES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    exact: bool = True


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and v.is_integer():
        return v
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def compare_query(name: str, spark_df, con, oracle: str) -> CompareResult:
    sdf = spark_df.toPandas()
    odf = con.execute(oracle).fetchdf()

    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        return CompareResult(name, False, f"columns differ: spark={s_cols} oracle={o_cols}")

    # Driver-parity dtype check: the driver's value-hash distinguishes 3 from
    # 3.0, so a DuckDB HUGEINT/other widening that lands as float64 while Spark
    # yields int64 (or vice versa) is a hash mismatch even when values agree.
    import pandas.api.types as ptypes

    for c in s_cols:
        s_int = ptypes.is_integer_dtype(sdf[c])
        o_int = ptypes.is_integer_dtype(odf[c])
        s_flt = ptypes.is_float_dtype(sdf[c])
        o_flt = ptypes.is_float_dtype(odf[c])
        if (s_int and o_flt) or (s_flt and o_int):
            return CompareResult(
                name,
                False,
                f"dtype mismatch on '{c}': spark={sdf[c].dtype} oracle={odf[c].dtype}"
                " (driver hash would differ — cast the oracle or the Spark column)",
            )
    if len(sdf) != len(odf):
        return CompareResult(name, False, f"row counts differ: spark={len(sdf)} oracle={len(odf)}")

    s_rows = sorted(
        [tuple(_norm(v) for v in row) for row in sdf[s_cols].itertuples(index=False)],
        key=repr,
    )
    o_rows = sorted(
        [tuple(_norm(v) for v in row) for row in odf[o_cols].itertuples(index=False)],
        key=repr,
    )
    exact = True
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        for x, y in zip(a, b):
            if x == y:
                continue
            if _is_nan(x) and _is_nan(y):
                continue
            if (
                isinstance(x, float)
                and isinstance(y, float)
                and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
            ):
                exact = False
                continue
            return CompareResult(
                name, False, f"row {i} differs:\n  spark : {a}\n  oracle: {b}", exact
            )
    return CompareResult(name, True, f"{len(s_rows)} rows match", exact)


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def run_all(sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    from delta_rs_spark.catalog import QUERIES
    from delta_rs_spark.session import get_spark

    spark = get_spark("oracle-compare")
    con = duckdb_con(sf_dir)
    results = []
    for name, qd in QUERIES.items():
        if only and name not in only:
            continue
        if qd.oracle is None:
            continue
        try:
            results.append(compare_query(name, qd.spark(spark, sf_dir), con, qd.oracle))
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, f"EXCEPTION: {e}"))
    return results


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for r in run_all(sf, only):
        flag = "OK " if r.ok else "FAIL"
        ex = "" if r.exact else " (float-tolerance)"
        print(f"{flag} {r.name}: {r.detail}{ex}")
