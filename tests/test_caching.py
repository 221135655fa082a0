"""Tracked-persist hygiene: per-thread isolation of the release contract."""

import threading

from pyspark.sql import functions as F

from delta_rs_spark.caching import persist_tracked, release_tracked


def test_release_tracked_is_thread_local(spark):
    """A release on one thread must not unpersist another thread's
    in-flight intermediates (the conflict-matrix lifecycle queries build
    racing transactions on threads)."""
    mine = persist_tracked(spark.range(10).withColumn("x", F.col("id") * 2))
    mine.count()  # populate the cache
    assert mine.storageLevel.useMemory

    done = threading.Event()

    def other():
        theirs = persist_tracked(spark.range(5))
        theirs.count()
        release_tracked()  # releases ONLY this thread's entries
        assert not theirs.storageLevel.useMemory
        done.set()

    t = threading.Thread(target=other)
    t.start()
    t.join(60)
    assert done.is_set()
    # the main thread's persist survived the other thread's release
    assert mine.storageLevel.useMemory
    release_tracked()
    assert not mine.storageLevel.useMemory


def test_release_all_tracked_reaches_dead_threads(spark):
    """Frames persisted on a worker thread that has exited must still be
    releasable — release_all_tracked() is the whole-session cleanup."""
    from delta_rs_spark.caching import release_all_tracked

    holder = {}

    def worker():
        df = persist_tracked(spark.range(7))
        df.count()
        holder["df"] = df

    t = threading.Thread(target=worker)
    t.start()
    t.join(60)
    assert holder["df"].storageLevel.useMemory
    release_tracked()  # wrong thread: must NOT free the worker's frame
    assert holder["df"].storageLevel.useMemory
    release_all_tracked()
    assert not holder["df"].storageLevel.useMemory
