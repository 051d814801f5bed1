"""Relational physical-plan shape assertions (pushdown, broadcast,
top-k). Oracle parity for every query lives in test_driver_sim.py —
one typed sweep, driver-faithful."""

from __future__ import annotations

from example_kafkastreams_spark.plans import count_exchanges, explain_str, pushed_filters
from example_kafkastreams_spark.queries import QUERIES
from tests.conftest import SMOKE


def test_q10_pushdown_reaches_scan(spark):
    # q10 was retired from the registry in round 4 (slot freed for
    # q63); the builder stays and this plan assertion is its check.
    from example_kafkastreams_spark.queries_relational import q10_filter_project

    df = q10_filter_project(spark, SMOKE)
    pushed = pushed_filters(df)
    assert any("l_discount" in p or "l_quantity" in p for p in pushed), pushed
    plan = explain_str(df, "formatted")
    # pruned read schema: only the 5 referenced columns, not all 11
    assert "l_returnflag" not in plan


def test_timestamp_pushdown_reaches_scan(spark):
    """Regression guard for the round-3 testdata shape (timestamp[us],
    isAdjustedToUTC=false): load_table must surface TimestampType AT THE
    SCAN (inferTimestampNTZ disabled), not via a post-scan NTZ cast — a
    cast above the scan forfeits parquet predicate pushdown, and at
    100 TB an unpushed time-range predicate reads every row group."""
    from pyspark.sql import functions as F, types as T

    from example_kafkastreams_spark.catalog import load_table

    events = load_table(spark, SMOKE, "events")
    assert isinstance(events.schema["ts"].dataType, T.TimestampType)
    df = events.filter(F.col("ts") >= F.lit("2024-01-02").cast("timestamp"))
    pushed = pushed_filters(df)
    assert any("ts" in p and "GreaterThanOrEqual" in p for p in pushed), pushed


def test_load_table_reads_nanos_shape(spark, tmp_path):
    """The rounds-1-2 testdata shape — TIMESTAMP(NANOS), which vanilla
    Spark rejects outright — must keep loading as TimestampType with
    DuckDB's floor-to-micros truncation. The current testdata is
    micros/NTZ, so without this synthetic file the nanos branch has no
    live coverage, and the generator has ALREADY flipped physical
    shapes between rounds once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from example_kafkastreams_spark.catalog import load_table

    ns = [1_700_000_000_123_456_789, 1_700_000_001_000_000_999]
    t = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(ns, type=pa.timestamp("ns")),
            "user_id": pa.array([10, 20], type=pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    from pyspark.sql import functions as F, types as T

    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = {
        r.event_id: r.us
        for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    # integer DIV 1000: floor-to-micros, exactly DuckDB's truncation
    assert got == {1: ns[0] // 1000, 2: ns[1] // 1000}


def test_load_table_restores_caller_confs(spark):
    """load_table needs two parquet confs only while resolving the
    footer schema; it must NOT leave them set — mutating the caller's
    session would silently change the semantics of all its OTHER
    parquet reads (ADVICE r3). The loaded frame still executes after
    restore (schema is baked at read time)."""
    from example_kafkastreams_spark.catalog import load_table

    confs = (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    )
    for k in confs:
        spark.conf.unset(k)  # back to Spark defaults ("false"/"true")
    before = {k: spark.conf.get(k) for k in confs}
    df = load_table(spark, SMOKE, "events")
    assert {k: spark.conf.get(k) for k in confs} == before
    assert df.count() > 0  # executes fine with confs restored
    # and an explicit caller-set value survives the round trip
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load_table(spark, SMOKE, "orders")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_ntz_fallback_cast_is_timezone_consistent(spark):
    """The load_table NTZ fallback (convert_timezone UTC->session, then
    cast) must read a wall-clock as a UTC instant — the same value the
    primary infer-off scan path produces — on ANY session timezone
    (ADVICE r3: a bare NTZ->LTZ cast would shift by the session zone)."""
    from pyspark.sql import functions as F

    expr = (
        "CAST(convert_timezone('UTC', current_timezone(),"
        " CAST('2024-03-05 12:00:00' AS TIMESTAMP_NTZ)) AS TIMESTAMP)"
    )
    tz_key = "spark.sql.session.timeZone"
    prior = spark.conf.get(tz_key)
    try:
        rows = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set(tz_key, tz)
            rows[tz] = (
                spark.sql(f"SELECT {expr} AS ts")
                .select(F.unix_micros("ts").alias("us"))
                .first()["us"]
            )
        assert len(set(rows.values())) == 1, rows
        # and the instant IS wall-clock-as-UTC
        assert rows["UTC"] == 1709640000 * 1_000_000
    finally:
        spark.conf.set(tz_key, prior)


def test_no_ntz_leaks_into_any_declared_plan(spark):
    """Every declared query must see TimestampType, never TIMESTAMP_NTZ —
    NTZ silently changes function semantics where it is accepted and
    fails analysis where it is not (unix_micros). The sweep builds all
    50 DataFrames and reads only their schemas; that is analysis-only
    for most queries, but iterative ones (q57/q63 connected components,
    q61 mixing) run real Spark jobs at DataFrame-BUILD time by design
    (checkpoints, convergence aggregates, literal-rate counts), so this
    sweep does execute work for those."""
    for name, fn in QUERIES.items():
        schema = fn(spark, SMOKE).schema.simpleString()
        assert "timestamp_ntz" not in schema, (name, schema)


def test_q16_broadcasts_dim(spark):
    plan = explain_str(QUERIES["q16_join_broadcast_parts"](spark, SMOKE), "simple")
    assert "BroadcastHashJoin" in plan


def test_q17_is_take_ordered(spark):
    plan = explain_str(QUERIES["q17_topk_orders"](spark, SMOKE), "simple")
    assert "TakeOrderedAndProject" in plan


def test_q12_single_agg_exchange(spark):
    # q12 now unions the multiway chain with the q13 left-count branch
    # (round-4 merge); each branch keeps its own plan budget: broadcast
    # dims => the multiway side shuffles only for orders⋈customer +
    # agg (<=3), the left-count side for its join + agg (<=3).
    df = QUERIES["q12_join_multiway"](spark, SMOKE)
    assert count_exchanges(df) <= 6


def test_q26_joins_on_bucket_equikey(spark):
    """q26 must run through the bucketized interval join: the time
    bucket rides as an equi-key (hash join on user_id + __bucket), not
    a raw key-only join with a time post-filter that goes quadratic on
    hot keys."""
    df = QUERIES["q26_interval_join_symmetric"](spark, SMOKE)
    plan = explain_str(df, "simple")
    assert "__bucket" in plan, plan
    # the bucket key must be part of the hash-join keys, not only a filter
    join_lines = [
        ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert any("__bucket" in ln for ln in join_lines), join_lines


def test_flagship_beats_naive_rekeyed_plan(spark):
    """The translated 10x claim (BASELINE.md): the co-partitioned
    declarative flagship must plan strictly fewer exchanges than the
    reference-DSL-style version with a repartition per selectKey."""
    from example_kafkastreams_spark.catalog import load_table
    from example_kafkastreams_spark.operators.enrich import (
        enrich_clickstream,
        enrich_clickstream_naive,
    )

    events = load_table(spark, SMOKE, "events")
    opt = count_exchanges(enrich_clickstream(events))
    naive = count_exchanges(enrich_clickstream_naive(events))
    assert opt < naive, (opt, naive)


def test_q20_funnel_strict_ordering_and_trans_probs(spark, tmp_path):
    """The funnel counts a step only when it happens STRICTLY after
    the previous step; transition probabilities per source type sum
    to 1 over that type's observed transitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    from example_kafkastreams_spark.queries import QUERIES

    def ts(m):
        return datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc)

    rows = [
        # user 1: full ordered funnel inside one session
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(1), 1, "click", 1.0, "{}"),
        (3, ts(2), 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE click — must stop at click
        (4, ts(0), 2, "view", 1.0, "{}"),
        (5, ts(1), 2, "purchase", 1.0, "{}"),
        (6, ts(2), 2, "click", 1.0, "{}"),
        # user 3: never views — not even step 1
        (7, ts(0), 3, "click", 1.0, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet")
    out = QUERIES["q20_sessionize"](spark, str(sf))
    funnel = {
        r["session_id"]: (r["n_events"], r["event_type"], r["prob"])
        for r in out.filter("mode = 'funnel'").collect()
    }
    assert funnel[1] == (2, "view", 1.0)          # users 1, 2
    assert funnel[2] == (2, "click", 1.0)         # user 2's click is
    assert funnel[3] == (1, "purchase", 0.5)      # after view; only
    # user 1 purchases after clicking
    trans = out.filter("mode = 'trans'").collect()
    by_src = {}
    for r in trans:
        by_src.setdefault(r["event_type"], []).append(r["prob"])
    for probs in by_src.values():
        assert abs(sum(probs) - 1.0) < 1e-12


def test_q30_cohort_retention_matrix(spark, tmp_path):
    """Two day-cohorts with known retention: users 1-2 start day 0
    (user 2 returns day 1), user 3 starts day 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    from example_kafkastreams_spark.queries import QUERIES

    def ts(d, h=1):
        return datetime(2024, 1, 1 + d, h, tzinfo=timezone.utc)

    rows = [
        (1, ts(0), 1, "view"),
        (2, ts(0), 2, "view"),
        (3, ts(1), 2, "click"),
        (4, ts(1), 3, "view"),
        (5, ts(1, 5), 2, "view"),  # same user+day dedups
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "events.parquet")
    out = QUERIES["q30_pivot_event_types"](spark, str(sf))
    # cohort rows shoehorn positionally: the first three n_{type}
    # columns in _EVENT_TYPES order carry day_offset / n_active / size
    got = {
        (r["user_id"], r["n_click"]): (r["n_error"], r["n_purchase"],
                                       r["retention"])
        for r in out.filter("mode = 'cohort'").collect()
    }
    d0 = int(rows[0][1].timestamp() * 1_000_000) // 86_400_000_000
    # cohort day-0: size 2, both active at offset 0, one at offset 1
    assert got[(d0, 0)] == (2, 2, 1.0)
    assert got[(d0, 1)] == (1, 2, 0.5)
    # cohort day-1: size 1, active at offset 0 only
    assert got[(d0 + 1, 0)] == (1, 1, 1.0)
    assert len(got) == 3
