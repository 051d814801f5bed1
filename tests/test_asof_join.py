"""As-of look-back join tests: the reference's golden clickstream
sequence (FIXTURES.md §1.4, ClickstreamJoinExample.scala:123-160) plus
flagship-query oracle parity at sf0.01."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from example_kafkastreams_spark.operators import (
    asof_lookback_left_join,
    dedup_tumbling_window,
)
from example_kafkastreams_spark.schemas import CLICK_EVENT, PAGE_VIEW
from tests.conftest import ORACLE
from tests.oracle_utils import assert_matches_oracle

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def _golden(spark):
    pvs = [
        Row(client_id="bob", pv_id="pv1", pv_value="/", ts=_ts(0.0)),
        Row(client_id="bob", pv_id="pv2", pv_value="/offer?id=1234", ts=_ts(10.2)),
    ]
    evs = [
        Row(client_id="bob", pv_id="pv1", ev_id="ev0", ev_value="show header", ts=_ts(0.1)),
        Row(client_id="bob", pv_id="pv1", ev_id="ev1", ev_value="show ads", ts=_ts(0.1)),
        Row(client_id="bob", pv_id="pv1", ev_id="ev2", ev_value="show recommendation", ts=_ts(0.1)),
        # exact duplicate (ClickstreamJoinExample.scala:135-136) → deduplicated
        Row(client_id="bob", pv_id="pv1", ev_id="ev1", ev_value="show ads", ts=_ts(0.1)),
        # 10 s later, still inside 15 s window (:138-140)
        Row(client_id="bob", pv_id="pv1", ev_id="ev3", ev_value="click recommendation", ts=_ts(10.1)),
        # out-of-order: ev for pv2 arrives before pv2 (:144-146) → unmatched
        Row(client_id="bob", pv_id="pv2", ev_id="ev0", ev_value="show header", ts=_ts(10.1)),
        Row(client_id="bob", pv_id="pv2", ev_id="ev1", ev_value="show ads", ts=_ts(10.3)),
        # purchase 20+ s after pv1 (:155-157) → outside window, unmatched
        Row(client_id="bob", pv_id="pv1", ev_id="ev2", ev_value="add to cart", ts=_ts(30.3)),
    ]
    pv = spark.createDataFrame(pvs, schema=PAGE_VIEW)
    ev = spark.createDataFrame(evs, schema=CLICK_EVENT)
    return pv, ev


def test_golden_clickstream_join_dedup(spark):
    pv, ev = _golden(spark)
    pv = pv.withColumnRenamed("ts", "pv_ts")
    joined = asof_lookback_left_join(
        ev,
        pv,
        on=["client_id", "pv_id"],
        left_id="ev_id",
        right_payload=["pv_value", "pv_ts"],
        left_ts="ts",
        right_ts="pv_ts",
        lookback_seconds=15.0,
        right_order=["pv_ts"],
    )
    deduped = dedup_tumbling_window(
        joined,
        keys=["client_id", "pv_id", "ev_id"],
        ts_col="ts",
        window_duration="5 seconds",
    )
    got = {
        (r.ev_id, r.pv_id, r.ev_value, r.pv_value)
        for r in deduped.collect()
    }
    assert got == {
        ("ev0", "pv1", "show header", "/"),
        ("ev1", "pv1", "show ads", "/"),  # duplicate collapsed
        ("ev2", "pv1", "show recommendation", "/"),
        ("ev3", "pv1", "click recommendation", "/"),
        ("ev0", "pv2", "show header", None),  # out-of-order ⇒ unmatched
        ("ev1", "pv2", "show ads", "/offer?id=1234"),
        ("ev2", "pv1", "add to cart", None),  # beyond 15 s ⇒ unmatched
    }


def test_asof_picks_latest_match(spark):
    pv, ev = _golden(spark)
    extra = spark.createDataFrame(
        [Row(client_id="bob", pv_id="pv1", pv_value="/reload", ts=_ts(0.05))],
        schema=pv.schema,
    )
    pv2 = pv.union(extra).withColumnRenamed("ts", "pv_ts")
    one_ev = ev.filter("ev_id = 'ev0' AND pv_id = 'pv1'")
    out = asof_lookback_left_join(
        one_ev, pv2, on=["client_id", "pv_id"], left_id="ev_id",
        right_payload=["pv_value", "pv_ts"], left_ts="ts", right_ts="pv_ts",
        lookback_seconds=15.0, right_order=["pv_ts"],
    ).collect()
    assert len(out) == 1 and out[0].pv_value == "/reload"


def test_asof_earliest_pick_with_matchless_bucket(spark):
    """pick="earliest" regression: a left row whose look-back window
    spans a matchless time bucket must still return its real match —
    the bucketized left join emits an all-NULL right row for the empty
    bucket, and an unguarded min_by would rank that NULL-field struct
    below the real match."""
    pv = spark.createDataFrame(
        [Row(client_id="bob", pv_id="pv1", pv_value="/", ts=_ts(18.0))],
        schema=PAGE_VIEW,
    ).withColumnRenamed("ts", "pv_ts")
    ev = spark.createDataFrame(
        [Row(client_id="bob", pv_id="pv1", ev_id="ev0", ev_value="click", ts=_ts(20.0))],
        schema=CLICK_EVENT,
    )
    for pick, want in [("earliest", "/"), ("latest", "/")]:
        out = asof_lookback_left_join(
            ev, pv, on=["client_id", "pv_id"], left_id="ev_id",
            right_payload=["pv_value", "pv_ts"], left_ts="ts", right_ts="pv_ts",
            lookback_seconds=15.0, right_order=["pv_ts"], pick=pick,
        ).collect()
        assert len(out) == 1 and out[0].pv_value == want, (pick, out)
    # and a genuinely matchless left row still yields NULL payload
    lonely = spark.createDataFrame(
        [Row(client_id="zoe", pv_id="pvX", ev_id="evX", ev_value="click", ts=_ts(50.0))],
        schema=CLICK_EVENT,
    )
    out = asof_lookback_left_join(
        lonely, pv, on=["client_id", "pv_id"], left_id="ev_id",
        right_payload=["pv_value", "pv_ts"], left_ts="ts", right_ts="pv_ts",
        lookback_seconds=15.0, right_order=["pv_ts"], pick="earliest",
    ).collect()
    assert len(out) == 1 and out[0].pv_value is None


def test_q02_oracle(spark):
    from example_kafkastreams_spark.queries import ORACLE_SQL, QUERIES

    assert_matches_oracle(
        QUERIES["q02_clickstream_enrich"](spark, ORACLE),
        ORACLE_SQL["q02_clickstream_enrich"],
        ORACLE,
    )


def test_q03_emission_anchored_runs(spark):
    from example_kafkastreams_spark.queries import QUERIES

    out = QUERIES["q03_dedup_emission_anchored"](spark, ORACLE)
    n_in = 10000
    n_out = out.count()
    assert 0 < n_out < n_in


# --- symmetric nearest-event pick --------------------------------------------

def _near_frames(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, 100, dt(2024, 1, 1, 0, 0, 10))],
        "ev_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (50, 100, dt(2024, 1, 1, 0, 0, 4)),   # 6s before
            (51, 100, dt(2024, 1, 1, 0, 0, 13)),  # 3s after  <- nearest
            (52, 100, dt(2024, 1, 1, 0, 0, 30)),  # outside ±15
            (53, 999, dt(2024, 1, 1, 0, 0, 10)),  # other key
        ],
        "r_id long, user_id long, ts timestamp",
    )
    return left, right


def test_nearest_join_prefers_smallest_absdt(spark):
    from example_kafkastreams_spark.operators.asof_join import (
        asof_nearest_join,
    )

    left, right = _near_frames(spark)
    out = asof_nearest_join(
        left, right, on=["user_id"], right_payload=["r_id"],
        window_seconds=15.0, right_order=["r_id"],
    ).collect()
    assert len(out) == 1 and out[0].r_id == 51


def test_nearest_join_tie_breaks_to_earlier_then_id(spark):
    from datetime import datetime as dt

    from example_kafkastreams_spark.operators.asof_join import (
        asof_nearest_join,
    )

    left = spark.createDataFrame(
        [(1, 7, dt(2024, 1, 1, 0, 0, 10))],
        "ev_id long, user_id long, ts timestamp",
    )
    # equidistant before/after -> earlier wins; duplicate-ts earlier
    # rows -> lowest id wins
    right = spark.createDataFrame(
        [
            (90, 7, dt(2024, 1, 1, 0, 0, 13)),
            (80, 7, dt(2024, 1, 1, 0, 0, 7)),
            (81, 7, dt(2024, 1, 1, 0, 0, 7)),
        ],
        "r_id long, user_id long, ts timestamp",
    )
    out = asof_nearest_join(
        left, right, on=["user_id"], right_payload=["r_id"],
        window_seconds=15.0, right_order=["r_id"],
    ).collect()
    assert out[0].r_id == 80


def test_nearest_join_unmatched_keeps_null(spark):
    from example_kafkastreams_spark.operators.asof_join import (
        asof_nearest_join,
    )

    left, right = _near_frames(spark)
    out = asof_nearest_join(
        left, right.filter("user_id = 999"), on=["user_id"],
        right_payload=["r_id"], window_seconds=15.0,
        right_order=["r_id"],
    ).collect()
    assert len(out) == 1 and out[0].r_id is None


def test_nearest_join_partition_independent(spark):
    from datetime import datetime as dt

    from example_kafkastreams_spark.operators.asof_join import (
        asof_nearest_join,
    )

    left = spark.createDataFrame(
        [
            (i, i % 5, dt(2024, 1, 1, 0, i % 50, i % 60))
            for i in range(60)
        ],
        "ev_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1000 + i, i % 5, dt(2024, 1, 1, 0, (i * 3) % 50, (i * 7) % 60))
            for i in range(60)
        ],
        "r_id long, user_id long, ts timestamp",
    )
    a = asof_nearest_join(
        left.repartition(1), right, on=["user_id"],
        right_payload=["r_id"], window_seconds=30.0,
        right_order=["r_id"],
    )
    b = asof_nearest_join(
        left.repartition(16), right.repartition(16), on=["user_id"],
        right_payload=["r_id"], window_seconds=30.0,
        right_order=["r_id"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
