"""Physical-plan auditing: make plan quality testable.

"The filter is pushed down, the scan is pruned, the dimension is broadcast"
are claims about the *executed plan*, not the result — so the test suite
checks them mechanically. `summarize` parses `df.explain`'s formatted output
into a comparable structure; the `assert_*` helpers turn scale regressions
(a lost pushdown, a broadcast that became a shuffle, a scan reading every
column) into red tests instead of silent slowdowns at 100 TB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    scans: int = 0
    exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    windows: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[list[str]] = field(default_factory=list)
    codegen_spans: int = 0


def _plan_text(df: DataFrame) -> str:
    # formatted explain: node details are printed in full (plain toString
    # truncates long PushedFilters lists mid-entry)
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _build_summary(text, nodes, scan_re, pushed_re, codegen_re) -> PlanSummary:
    """One assembly for both plan-text dialects — a new PlanSummary field
    (or a schema-parser fix) lands in formatted AND executed summaries, so
    the bench sidecar's vs_prev diffs can't skew from a one-sided edit."""
    return PlanSummary(
        scans=len(re.findall(scan_re, text)),
        exchanges=nodes("Exchange"),
        broadcast_hash_joins=nodes("BroadcastHashJoin"),
        sort_merge_joins=nodes("SortMergeJoin"),
        shuffled_hash_joins=nodes("ShuffledHashJoin"),
        nested_loop_joins=nodes("BroadcastNestedLoopJoin") + nodes("CartesianProduct"),
        windows=nodes("Window"),
        pushed_filters=re.findall(pushed_re, text),
        read_schemas=[
            [c.split(":")[0] for c in m.split(",") if ":" in c]
            for m in re.findall(r"ReadSchema: struct<([^>]*)>", text)
        ],
        codegen_spans=len(set(re.findall(codegen_re, text))),
    )


def summarize(df: DataFrame) -> PlanSummary:
    text = _plan_text(df)

    def nodes(name: str) -> int:
        # formatted explain shows each node in the tree AND as a numbered
        # "(N) Name" detail block — count the numbered headers only
        return len(re.findall(rf"^\(\d+\) {name}", text, re.MULTILINE))

    return _build_summary(
        text,
        nodes,
        scan_re=r"(?m)^\(\d+\) Scan parquet",
        pushed_re=r"PushedFilters: \[([^\]]*)\]",
        # pre-execution AQE plans carry no codegen markers: this is 0
        # until the plan runs — assert codegen via summarize_executed
        codegen_re=r"WholeStageCodegen \((\d+)\)",
    )


def summarize_executed(df: DataFrame) -> PlanSummary:
    """Summarize the plan that actually RAN — call after materializing
    ``df`` (collect/count/write), not before.

    Under AQE the pre-execution formatted plan is a proposal: join
    strategies can demote (a misestimated broadcast becomes a sort-merge),
    shuffles coalesce, and whole-stage codegen annotations don't exist yet
    (which is why :func:`summarize` reports ``codegen_spans=0`` on an
    un-executed AQE plan — assert codegen on THIS summary). Reads the
    final ``executedPlan`` tree, slicing off the "Initial Plan" section
    AdaptiveSparkPlan appends, so every count reflects executed reality."""
    text = df._jdf.queryExecution().executedPlan().toString()
    cut = text.find("== Initial Plan ==")
    if cut != -1:
        text = text[:cut]

    def nodes(name: str) -> int:
        # executed toString prints nodes inline (with `*(N)` codegen
        # prefixes and tree art); word boundaries keep Exchange from
        # matching inside BroadcastExchange
        return len(re.findall(rf"\b{name}\b", text))

    s = _build_summary(
        text,
        nodes,
        scan_re=r"\b(?:File)?Scan parquet\b",
        # executed toString TRUNCATES long bracket lists mid-entry (no
        # closing ]) — capture to ] or end of line; content may end in
        # "..." but presence/absence per scan stays reliable
        pushed_re=r"PushedFilters: \[([^\]\n]*)",
        codegen_re=r"\*\((\d+)\)",
    )
    # executed toString also truncates long ReadSchema struct<> lists (no
    # closing '>'), which silently blinds exactly the column-pruning check
    # this summary feeds; the read schema is fixed at planning time and AQE
    # never rewrites scans, so take it from the formatted explain's full
    # detail blocks instead
    s.read_schemas = summarize(df).read_schemas
    return s


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """Fail unless some parquet scan carries a pushed filter on `column`."""
    s = summarize(df)
    if not any(column in p for p in s.pushed_filters):
        raise AssertionError(
            f"no pushed filter on {column!r}; PushedFilters={s.pushed_filters}"
        )


def assert_columns_pruned(df: DataFrame, table_width: int) -> None:
    """Fail if any scan reads as many columns as the full table (no pruning)."""
    s = summarize(df)
    fat = [cols for cols in s.read_schemas if len(cols) >= table_width]
    if fat:
        raise AssertionError(f"unpruned scan(s) reading full width: {fat}")


def assert_no_nested_loop_join(df: DataFrame) -> None:
    """Fail on Cartesian/nested-loop joins — the operator that dies at scale."""
    s = summarize(df)
    if s.nested_loop_joins:
        raise AssertionError(f"{s.nested_loop_joins} nested-loop join(s) in plan")
