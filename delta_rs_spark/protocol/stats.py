"""Per-file statistics: data skipping and metadata-only aggregates.

The reference parses per-file stats (numRecords/minValues/maxValues/nullCount,
``rust/src/action.rs:279-353``) and folds them into table-level statistics for
the planner (``rust/src/delta_datafusion.rs:117-209``). Here the same stats
power two things Spark cannot do by itself (it never sees our log):

1. **File skipping**: evaluate simple ``(col, op, literal)`` predicates against
   each file's min/max/nullCount and drop files that provably contain no
   matching row — before ``spark.read`` is even called. At 100 TB this is the
   difference between scanning a partition and scanning the lake.
2. **Metadata-only fast path**: answer ``count(*)``/``min``/``max`` from the
   log alone, no scan.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable, Optional, Sequence

from .actions import AddAction

SkipTuple = tuple[str, str, Any]

_SKIP_OPS = {"=", "!=", "<", "<=", ">", ">="}


def _coerce(stat_value: Any, literal: Any) -> tuple[Any, Any] | None:
    """Best-effort comparable pair; None when types aren't comparable."""
    if stat_value is None or literal is None:
        return None
    # JSON stats carry dates/timestamps as ISO strings; normalize both sides
    if isinstance(literal, (_dt.date, _dt.datetime)):
        literal = literal.isoformat()
    # bool FIRST: it subclasses int, and bool('false') is True — letting it
    # fall into the numeric coercion would invert the comparison and prune
    # files whose rows DO match
    if isinstance(stat_value, bool) or isinstance(literal, bool):

        def _as_bool(x):
            if isinstance(x, bool):
                return x
            if isinstance(x, str) and x.lower() in ("true", "false"):
                return x.lower() == "true"
            return None

        a, b = _as_bool(stat_value), _as_bool(literal)
        if a is None or b is None:
            return None
        return a, b
    if isinstance(stat_value, (int, float)) and isinstance(literal, str):
        try:
            literal = type(stat_value)(literal)
        except ValueError:
            return None
    if isinstance(stat_value, str) and isinstance(literal, (int, float)):
        try:
            stat_value = type(literal)(stat_value)
        except ValueError:
            return None
    if isinstance(stat_value, bool) != isinstance(literal, bool):
        return None
    try:
        stat_value < literal  # comparability probe
    except TypeError:
        return None
    return stat_value, literal


def file_may_match(add: AddAction, predicates: Sequence[SkipTuple]) -> bool:
    """Conservative: True unless stats *prove* no row in the file matches.

    Missing stats / missing column / non-comparable literal → keep the file.
    String min/max on timestamps compare lexicographically == chronologically
    for ISO-8601, so date/timestamp predicates skip correctly.
    """
    stats = add.get_stats()
    if not stats:
        return True
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    null_counts = stats.get("nullCount") or {}
    num_records = stats.get("numRecords")

    for col, op, lit in predicates:
        if op not in _SKIP_OPS:
            continue  # unknown op: cannot skip on it
        lo_raw, hi_raw = mins.get(col), maxs.get(col)
        nulls = null_counts.get(col)
        all_null = (
            num_records is not None and isinstance(nulls, int) and nulls >= num_records > 0
        )
        if all_null:
            return False  # every value NULL → no comparison predicate can match
        pair_lo = _coerce(lo_raw, lit)
        pair_hi = _coerce(hi_raw, lit)
        if pair_lo is None or pair_hi is None:
            continue
        lo, v = pair_lo
        hi, _ = pair_hi
        if op == "=" and (v < lo or v > hi):
            return False
        if op == "<" and lo >= v:
            return False
        if op == "<=" and lo > v:
            return False
        if op == ">" and hi <= v:
            return False
        if op == ">=" and hi < v:
            return False
        if op == "!=" and lo == hi == v and not _has_nulls(null_counts, col):
            return False
    return True


def _has_nulls(null_counts: dict[str, Any], col: str) -> bool:
    n = null_counts.get(col)
    return not isinstance(n, int) or n > 0


def prune_files(
    files: Iterable[AddAction], predicates: Sequence[SkipTuple] | None
) -> list[AddAction]:
    if not predicates:
        return list(files)
    return [a for a in files if file_may_match(a, predicates)]


# ---- metadata-only aggregates (reference delta_datafusion.rs:117-209) -----

def table_num_records(files: Iterable[AddAction]) -> Optional[int]:
    """Σ live rows (numRecords minus deletion-vector cardinality)."""
    total = 0
    for a in files:
        n = a.logical_records
        if n is None:
            return None
        total += n
    return total


def table_min_max(files: Iterable[AddAction], column: str) -> tuple[Any, Any] | None:
    """Global (min, max) of a column from per-file stats; None if any file
    lacks the stat (then the caller falls back to a Spark scan)."""
    gmin: Any = None
    gmax: Any = None
    for a in files:
        if a.deletion_vector is not None:
            # the deleted rows may have held the extremum; stats are only a
            # conservative superset under a DV — metadata answer unsafe
            return None
        stats = a.get_stats()
        if not stats:
            return None
        lo = (stats.get("minValues") or {}).get(column)
        hi = (stats.get("maxValues") or {}).get(column)
        nulls = (stats.get("nullCount") or {}).get(column)
        n = stats.get("numRecords")
        if lo is None or hi is None:
            # all-NULL file contributes nothing; anything else → unknown
            if isinstance(nulls, int) and n is not None and nulls >= n:
                continue
            return None
        gmin = lo if gmin is None or lo < gmin else gmin
        gmax = hi if gmax is None or hi > gmax else gmax
    return (gmin, gmax)
