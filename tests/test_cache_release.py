"""release_build_memos — the bench-tail fix (VERDICT r11 item 1).

The bench main loop runs 50 memoized slots in one JVM; each slot's
persist_pinned working set must retire WITH its memo between slots or
the accumulated caches GC-throttle the tail (driver-measured q64
2.7→14.4 s, q65 2.2→32.1 s at 32 cores in round 11). These tests pin
the release contract: pinned frames are registered and unpersisted,
registered memo dicts are cleared, tracked frames stay on their own
(release_sketch_caches) lifecycle, and a released memoized slot
rebuilds correctly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from example_kafkastreams_spark.operators import cache as C


def test_release_build_memos_unpersists_pinned_and_clears_memos(spark):
    df = C.persist_pinned(spark.range(100).withColumn("x", F.col("id") * 2))
    df.count()
    assert df.storageLevel.useMemory  # materialized and pinned
    memo = C.register_build_memo({})
    memo[("app", "dir")] = df
    n = C.release_build_memos()
    assert n >= 1
    assert memo == {}  # memo invalidated with its frames
    assert not df.storageLevel.useMemory  # unpersisted
    # released state is inert: a second release is a no-op
    assert C.release_build_memos() == 0


def test_release_build_memos_leaves_tracked_caches_alone(spark):
    tracked = C.persist_tracked(spark.range(50))
    tracked.count()
    C.release_build_memos()
    assert tracked.storageLevel.useMemory  # still cached
    C.release_sketch_caches()
    assert not tracked.storageLevel.useMemory


def test_released_memoized_slot_rebuilds_identically(spark):
    """The memo registry end-to-end on a real memoized slot: release,
    re-invoke, same rows — releasing is semantics-free (memos key on
    applicationId and carry no cross-run state)."""
    from example_kafkastreams_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    q = QUERIES["q64_decontaminate"]
    before = sorted(map(tuple, q(spark, sf).collect()))
    C.release_build_memos()
    after_df = q(spark, sf)
    after = sorted(map(tuple, after_df.collect()))
    assert before == after
    C.release_build_memos()
