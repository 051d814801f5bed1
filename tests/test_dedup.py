"""Dedup operator tests: golden sequences from FIXTURES.md §2 plus
oracle parity at sf0.01."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from example_kafkastreams_spark.operators import (
    dedup_emission_anchored,
    dedup_exact,
    dedup_tumbling_window,
)
from tests.conftest import ORACLE
from tests.oracle_utils import assert_matches_oracle

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def _dedup_fixture(spark):
    # golden sequence per key (DeduplicationExample.scala:74-93): offsets
    # 0/1/3/7/17 s; reference window 15 s anchored at last emission
    rows = [
        Row(k="001", v=f"v_{i:02d}", ts=_ts(off))
        for i, off in enumerate([0, 1, 3, 7])
    ] + [Row(k="001", v="v_99", ts=_ts(17))]
    return spark.createDataFrame(rows)


def test_emission_anchored_golden(spark):
    """FIXTURES.md §2.2: emit at t=0 and t=17 only."""
    out = dedup_emission_anchored(
        _dedup_fixture(spark), keys=["k"], ts_col="ts", window_seconds=15.0
    )
    got = sorted((r.v, r.ts) for r in out.collect())
    assert got == [("v_00", _ts(0)), ("v_99", _ts(17))]


def test_tumbling_dedup_golden(spark):
    """A1 on the same sequence with 15 s bucket-aligned windows:
    buckets [0,15) and [15,30) ⇒ v_00 and v_99 survive."""
    out = dedup_tumbling_window(
        _dedup_fixture(spark), keys=["k"], ts_col="ts",
        window_duration="15 seconds", order_cols=["v"],
    )
    got = sorted((r.v, r.window_start) for r in out.collect())
    assert got == [("v_00", _ts(0)), ("v_99", _ts(15))]


def test_tumbling_dedup_keeps_first_not_arbitrary(spark):
    rows = [
        Row(k="a", v="late", ts=_ts(4)),
        Row(k="a", v="first", ts=_ts(1)),
        Row(k="b", v="only", ts=_ts(2)),
    ]
    out = dedup_tumbling_window(
        spark.createDataFrame(rows), keys=["k"], window_duration="15 seconds",
        order_cols=["v"],
    )
    assert {(r.k, r.v) for r in out.collect()} == {("a", "first"), ("b", "only")}


def test_dedup_exact_deterministic(spark):
    rows = [
        Row(k="a", event_id=5, v="x"),
        Row(k="a", event_id=2, v="y"),
    ]
    out = dedup_exact(spark.createDataFrame(rows), keys=["k"], order_cols=["event_id"])
    assert [(r.k, r.event_id) for r in out.collect()] == [("a", 2)]


def test_q01_oracle_sf001(spark):
    from example_kafkastreams_spark.queries import ORACLE_SQL, QUERIES

    assert_matches_oracle(
        QUERIES["q01_dedup_window"](spark, ORACLE),
        ORACLE_SQL["q01_dedup_window"],
        ORACLE,
    )
