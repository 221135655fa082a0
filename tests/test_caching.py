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
    release_all_tracked()
    assert not holder["df"].storageLevel.useMemory


def test_release_tracked_adopts_dead_thread_residue(spark):
    """The depth-0 sweep at the start of each catalog query must also
    drain entries whose owning thread has EXITED — a dead worker can never
    reach its own next release point, and without adoption its frames stay
    pinned in Spark's cache registry for the whole session. A LIVE foreign
    thread's in-flight intermediates remain off-limits."""
    from delta_rs_spark.caching import release_all_tracked

    holder = {}
    live_ready = threading.Event()
    live_done = threading.Event()

    def dead_worker():
        df = persist_tracked(spark.range(11))
        df.count()
        holder["dead"] = df

    def live_worker():
        df = persist_tracked(spark.range(13))
        df.count()
        holder["live"] = df
        live_ready.set()
        live_done.wait(60)  # stay alive through the main thread's sweep
        release_tracked()

    t = threading.Thread(target=dead_worker)
    t.start()
    t.join(60)
    lt = threading.Thread(target=live_worker)
    lt.start()
    assert live_ready.wait(60)

    release_tracked()  # main-thread depth-0 sweep
    assert not holder["dead"].storageLevel.useMemory, "dead residue not adopted"
    assert holder["live"].storageLevel.useMemory, "live thread's frame freed"

    live_done.set()
    lt.join(60)
    assert not holder["live"].storageLevel.useMemory
    release_all_tracked()
