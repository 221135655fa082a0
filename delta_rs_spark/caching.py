"""Session-lifetime cache hygiene for the certified-query catalog.

Several catalog queries persist a reused intermediate (a vocab-sized
aggregate feeding two consumers) with ``MEMORY_AND_DISK``. The persist is
the right plan choice, but the query function returns a *lazy* DataFrame —
the cache is populated only when the caller materializes it, so the query
cannot unpersist before returning. Without a release point, a long-lived
session running the 118-query catalog (the driver's certification loop,
``bench.py``) accumulates every query's pinned lineage for the session
lifetime: unbounded executor-memory pressure and "already cached" warnings.

The contract here: every persist inside a catalog query goes through
:func:`persist_tracked`, and the ``@query`` wrapper calls
:func:`release_tracked` when the NEXT catalog query starts (depth-guarded,
so a query composed of other catalog queries does not release its own
intermediates mid-build). Residue is therefore bounded to one query's
caches, released on the next call — or immediately via an explicit
``release_all_tracked()`` from a harness that wants a clean session tail
(``release_tracked()`` frees only the calling thread's entries).
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Tracked persists are per-THREAD: two catalog queries built concurrently on
# different threads (the conflict-matrix lifecycle queries already run racing
# transactions on threads) must not release each other's in-flight
# intermediates — a shared list would let one thread's depth-0 entry
# unpersist another query's caches mid-build. The per-thread lists live in
# one lock-guarded registry (not threading.local alone) so a harness cleanup
# can still release EVERYTHING — including frames persisted on a worker
# thread that has since exited, which a pure thread-local would strand in
# Spark's cache registry for the session lifetime. Registry keys are
# never-reused tokens handed out per thread (NOT threading.get_ident():
# CPython recycles idents, and a new thread inheriting a dead worker's key
# would release frames whose lazy consumers are still materializing).
import itertools as _itertools

_LOCK = threading.Lock()
_BY_KEY: dict[int, list[DataFrame]] = {}
_KEY = threading.local()
_NEXT_KEY = _itertools.count()


def _register(df: DataFrame) -> None:
    key = getattr(_KEY, "value", None)
    if key is None:
        key = _KEY.value = next(_NEXT_KEY)
    with _LOCK:
        # append under the lock: an unlocked append could land in a list
        # release_all_tracked() already popped, stranding the persist
        _BY_KEY.setdefault(key, []).append(df)


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist a reused intermediate and register it for release when the
    next catalog query begins (or on an explicit :func:`release_tracked`)."""
    df = df.persist(level)
    _register(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for release with the tracked set
    (for operators that manage persist/unpersist internally during an
    iteration but whose final persisted result outlives the function)."""
    _register(df)
    return df


def release_tracked() -> None:
    """Unpersist every intermediate tracked by THIS thread (non-blocking,
    error-tolerant: a stopped SparkSession or already-released frame is not
    an error). A caller that builds several query DataFrames before
    collecting any should materialize them one at a time — release happens
    when the next catalog query starts on the same thread."""
    key = getattr(_KEY, "value", None)
    if key is None:
        return
    with _LOCK:
        lst = _BY_KEY.pop(key, [])
    _drain(lst)


def release_all_tracked() -> None:
    """Unpersist every tracked intermediate from EVERY thread — the
    whole-session cleanup for a harness that wants a clean tail, and the
    only way to free frames persisted on a worker thread that has exited."""
    with _LOCK:
        lists = list(_BY_KEY.values())
        _BY_KEY.clear()
    for lst in lists:
        _drain(lst)


def _drain(lst: list[DataFrame]) -> None:
    while lst:
        df = lst.pop()
        try:
            df.unpersist()
        except Exception:
            pass
